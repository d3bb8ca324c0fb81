"""Corpus statistics: token frequencies, vocab size, HyperLogLog."""

import numpy as np
import pandas as pd
import pytest

from ocr_model_ray.functions.corpus_stats import (
    HLL_M, approx_vocab_size, hll_estimate, hll_fold, top_tokens, vocab_size,
)


def _corpus(n_docs=300, vocab_n=5000, seed=0):
    rng = np.random.RandomState(seed)
    vocab = np.array([f"tok{i}" for i in range(vocab_n)])
    return pd.DataFrame({
        "doc_id": np.arange(n_docs),
        "text": [" ".join(rng.choice(vocab, 60)) for _ in range(n_docs)]})


@pytest.mark.usefixtures("ray_session")
def test_top_tokens_local_equals_distributed_equals_duckdb():
    import duckdb
    import ray.data as rd
    df = _corpus(n_docs=120, vocab_n=80)
    # tabs/newlines + empty-yielding edges exercise the split class
    df.loc[0, "text"] = "alpha\talpha\nalpha  beta "
    ds = rd.from_pandas(df).repartition(4)
    dist = top_tokens(ds, k=10, mode="distributed")
    loc = top_tokens(ds, k=10, mode="local")
    pd.testing.assert_frame_equal(dist, loc)

    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute("""
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(regexp_split_to_array(text,
                     '[ \\t\\n\\r\\f\\v]+')) AS token FROM documents)
        WHERE token <> '' GROUP BY token
        ORDER BY n DESC, token ASC LIMIT 10""").df()
    pd.testing.assert_frame_equal(dist, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_vocab_size_modes_agree_with_pandas():
    import ray.data as rd
    df = _corpus(n_docs=100, vocab_n=900)
    exact = len(set(" ".join(df["text"]).split()))
    ds = rd.from_pandas(df).repartition(4)
    assert vocab_size(ds, mode="distributed")["n_distinct_tokens"][0] == exact
    assert vocab_size(ds, mode="local")["n_distinct_tokens"][0] == exact


def test_hll_accuracy_and_exact_merge():
    """Estimate within ~3 sigma (1.04/sqrt(m)) of truth at several
    cardinalities; partial-fold merge is EXACTLY the full fold
    (elementwise max is associative/commutative)."""
    rng = np.random.RandomState(1)
    for n in (500, 20_000, 300_000):
        # full 64-bit range: the top p bits index the registers, so a
        # 63-bit draw would leave half the registers unreachable
        h = np.unique(rng.randint(0, 2**64, size=n, dtype=np.uint64))
        regs = hll_fold(h)
        est = hll_estimate(regs)
        rel = abs(est - len(h)) / len(h)
        assert rel < 3 * 1.04 / np.sqrt(HLL_M), (n, rel)
        thirds = [hll_fold(h[i::3]) for i in range(3)]
        merged = np.maximum.reduce(thirds)
        assert np.array_equal(merged, regs)
    # empty + zero-register estimate is 0-ish via linear counting
    assert hll_estimate(np.zeros(HLL_M, np.uint8)) == 0.0


@pytest.mark.usefixtures("ray_session")
def test_approx_vocab_size_near_exact_on_dataset():
    import ray.data as rd
    df = _corpus(n_docs=400, vocab_n=15_000, seed=3)
    ds = rd.from_pandas(df).repartition(8)
    exact = int(vocab_size(ds, mode="local")["n_distinct_tokens"][0])
    est = approx_vocab_size(ds)
    assert abs(est - exact) / exact < 0.05


@pytest.mark.usefixtures("ray_session")
def test_numeric_histogram_modes_clamp_and_zero_bins():
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import numeric_histogram
    import pyarrow as pa
    rng = np.random.RandomState(2)
    # values beyond both edges must clamp into the edge bins; bin 3 of
    # [0,100)x10 is deliberately empty. NaN clamps into the top bin
    # (DuckDB least/greatest orders NaN greatest); NULL lands in bin 0
    # (least/greatest IGNORE null args). Build from arrow directly —
    # pandas->arrow would silently turn the NaN into a null and
    # collapse the two cases.
    vals = np.concatenate([rng.uniform(0, 30, 200),
                           rng.uniform(40, 100, 300),
                           [-5.0, -0.001, 100.0, 250.0, np.nan]])
    arr = pa.concat_arrays([pa.array(vals, pa.float64(), from_pandas=False),
                            pa.array([None], pa.float64())])
    ds = rd.from_arrow(pa.table({"x": arr})).repartition(4)
    dist = numeric_histogram(ds, "x", lo=0.0, hi=100.0, nbins=10,
                             mode="distributed")
    loc = numeric_histogram(ds, "x", lo=0.0, hi=100.0, nbins=10,
                            mode="local")
    pd.testing.assert_frame_equal(dist, loc)
    assert dist["n"].sum() == len(vals) + 1      # every row counted once
    assert len(dist) == 10                       # zero bins present
    b = np.clip(np.floor(vals / 10.0), 0, 9)
    b = np.where(np.isnan(b), 9, b).astype(int)  # NaN -> top bin
    want = np.bincount(b, minlength=10)
    want[0] += 1                                 # the NULL -> bin 0
    assert dist["n"].tolist() == want.tolist()
    assert dist["bin_lo"].tolist()[:3] == [0.0, 10.0, 20.0]


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_vs_bruteforce_and_guarantee():
    """Misra-Gries candidates + exact rescreen must equal the
    brute-force phi-heavy set with exact counts — including when the
    per-batch counter budget is badly undersized relative to the
    batch vocabulary (the sketch may only LOSE false positives, never
    true heavy hitters)."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import heavy_hitters

    rng = np.random.RandomState(13)
    # heavy tokens with planted frequencies + a long rare tail
    words = []
    for i, reps in enumerate([400, 300, 200, 120, 80]):
        words += [f"hot{i}"] * reps
    words += [f"rare{i}" for i in range(3000)]
    rng.shuffle(words)
    docs = [" ".join(words[i::40]) for i in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40), "text": docs})
    ds = rd.from_pandas(df).repartition(8)

    phi = 0.02   # total ~4100 -> threshold ~82
    got = heavy_hitters(ds, phi=phi, mode="distributed")
    # brute force
    from collections import Counter
    c = Counter(w for d in docs for w in d.split())
    total = sum(c.values())
    import math
    thr = max(1, math.ceil(phi * total))
    want = sorted(((t, n) for t, n in c.items() if n >= thr),
                  key=lambda x: (-x[1], x[0]))
    assert list(zip(got["token"], got["n"])) == want
    assert len(want) >= 3   # fixture actually has heavy hitters


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_local_equals_distributed():
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import heavy_hitters
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    a = heavy_hitters(ds, phi=0.004, mode="local")
    b = heavy_hitters(ds, phi=0.004, mode="distributed")
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_cms_upper_bound_and_error():
    """CMS estimates are ALWAYS >= the true count, and within the
    total/width bound for a corpus far below saturation."""
    from ocr_model_ray.functions.corpus_stats import (
        CMS_WIDTH, cms_estimate, cms_fold, token_hashes)
    rng = np.random.RandomState(3)
    toks = (["hot"] * 500 + ["warm"] * 120
            + [f"t{i}" for i in rng.randint(0, 4000, 6000)])
    h = token_hashes(toks)
    rows = cms_fold(h)
    q = token_hashes(["hot", "warm", "absent-token"])
    est = cms_estimate(rows, q)
    true = np.array([500, 120, 0])
    assert (est >= true).all()
    assert (est - true <= len(toks) / CMS_WIDTH * 4 + 1).all()


def test_cms_merge_associative():
    """Summed partial sketches equal the single-pass sketch exactly —
    Ray's tree combine order can never change the counters."""
    from ocr_model_ray.functions.corpus_stats import cms_fold, token_hashes
    rng = np.random.RandomState(4)
    toks = [f"w{i}" for i in rng.randint(0, 300, 2000)]
    h = token_hashes(toks)
    whole = cms_fold(h)
    parts = cms_fold(h[:700]) + cms_fold(h[700:1500]) + cms_fold(h[1500:])
    assert (whole == parts).all()


@pytest.mark.usefixtures("ray_session")
def test_cms_distributed_equals_local():
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import (
        _token_hashes_block, cms_fold, cms_token_counts)
    import pyarrow as pa
    df = pd.DataFrame({"text": [f"a b c w{i % 7}" for i in range(400)]})
    rows = cms_token_counts(rd.from_pandas(df).repartition(8))
    local = cms_fold(_token_hashes_block(
        pa.Table.from_pandas(df), "text"))
    assert (rows == local).all()


@pytest.mark.usefixtures("ray_session")
def test_unigram_freq_score_local_equals_distributed():
    """The broadcast-merge local plan and the token-bucket join plan
    must agree bit-for-bit (int sums + one division)."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import unigram_freq_score

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = unigram_freq_score(ds, mode="local")
    b = unigram_freq_score(ds, mode="distributed")  # broadcast sub-plan
    c = unigram_freq_score(ds, mode="distributed",
                           vocab_broadcast_rows=0)  # token-bucket join
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
    # sanity: scores are valid probabilities-ish (0 < avg_freq <= 1)
    assert (a["avg_freq"] > 0).all() and (a["avg_freq"] <= 1).all()


@pytest.mark.usefixtures("ray_session")
def test_bigram_lift_local_equals_distributed_and_boundaries():
    """Lift collocations: local == distributed, and bigrams never
    cross document boundaries."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import bigram_lift

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = bigram_lift(ds, k=20, min_count=2, mode="local")
    b = bigram_lift(ds, k=20, min_count=2, mode="distributed")
    pd.testing.assert_frame_equal(a, b)

    # boundary check: two docs that would form a spurious bigram if
    # concatenated ("alpha beta" + "beta alpha" -> no "beta beta")
    docs = rd.from_items([
        {"doc_id": 0, "text": "alpha beta"},
        {"doc_id": 1, "text": "beta alpha"},
    ] * 3)
    out = bigram_lift(docs, k=10, min_count=1, mode="local")
    pairs = set(zip(out["w1"], out["w2"]))
    assert ("beta", "beta") not in pairs
    assert ("alpha", "beta") in pairs and ("beta", "alpha") in pairs


@pytest.mark.usefixtures("ray_session")
def test_group_tfidf_local_equals_distributed():
    """The single-frame plan and the token-bucketed exchange plan must
    agree bit-for-bit; shared terms (df = n_groups) score exactly tf."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import group_tfidf

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["text", "lang"])
    a = group_tfidf(ds, k=5, mode="local")
    b = group_tfidf(ds, k=5, mode="distributed")
    pd.testing.assert_frame_equal(a, b)
    assert (a["score"] > 0).all()
    # a term present in every group has score == tf exactly
    # (df == n_groups cancels), so scores never drop below tf/n_groups
    assert (a["score"] >= a["n"] / a["lang"].nunique() - 1e-12).all()


@pytest.mark.usefixtures("ray_session")
def test_corpus_ops_empty_corpus_typed_results():
    """Token-free and zero-row corpora (a fully-filtered partition at
    scale) must yield TYPED empty results from every distributed plan,
    never crash on Ray's schema-less all-empty collect."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import (
        bigram_lift, group_tfidf, heavy_hitters, unigram_freq_score,
    )
    from ocr_model_ray.functions.corpus_stats import top_tokens as tt

    empty_texts = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["", "", ""],
         "lang": ["en", "en", "fr"]})).repartition(2)
    zero_rows = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object"),
         "lang": pd.Series([], dtype="object")}))

    for ds in (empty_texts, zero_rows):
        assert list(tt(ds, k=5, mode="distributed").columns) == \
            ["token", "n"]
        assert list(heavy_hitters(ds, phi=0.1, mode="distributed")
                    .columns) == ["token", "n"]
        for kw in ({}, {"vocab_broadcast_rows": 0}):
            out = unigram_freq_score(ds, mode="distributed", **kw)
            assert list(out.columns) == ["doc_id", "sum_freq", "n_tok",
                                         "avg_freq"] and out.empty
        assert list(bigram_lift(ds, mode="distributed").columns) == \
            ["w1", "w2", "n_pair", "lift"]
        assert list(group_tfidf(ds, mode="distributed").columns) == \
            ["lang", "token", "n", "score"]


@pytest.mark.usefixtures("ray_session")
def test_source_vocab_exact():
    import ray.data as rd

    from ocr_model_ray.functions.corpus_stats import source_vocab
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["a", "a", "b"],
        "text": ["x y x", "y z", "x q"],
    })
    out = (source_vocab(rd.from_pandas(df).repartition(2))
           .sort_values("source").reset_index(drop=True))
    assert out["source"].tolist() == ["a", "b"]
    assert out["n_distinct_tokens"].tolist() == [3, 2]  # a:{x,y,z} b:{x,q}


@pytest.mark.usefixtures("ray_session")
def test_doc_top_tfidf_hand_computed():
    import ray.data as rd

    from ocr_model_ray.functions.corpus_stats import doc_top_tfidf
    # N=2 docs. doc0: rare rare common -> tf(rare)=2 df=1 score=4;
    # tf(common)=1 df=2 score=1. doc1: common only -> score 1.
    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["rare rare common", "common common"],
    })
    out = (doc_top_tfidf(rd.from_pandas(df), k=1).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["token"].tolist() == ["rare", "common"]
    assert out["score"].tolist() == [4.0, 2.0]


@pytest.mark.usefixtures("ray_session")
def test_doc_top_tfidf_partitioning_independence():
    import ray.data as rd

    from ocr_model_ray.functions.corpus_stats import doc_top_tfidf
    rows = [{"doc_id": i,
             "text": f"tok{i % 5} tok{i % 5} tok{i % 11} shared word"}
            for i in range(60)]
    a = (doc_top_tfidf(rd.from_pandas(pd.DataFrame(rows)).repartition(1),
                       k=2).to_pandas()
         .sort_values(["doc_id", "token"]).reset_index(drop=True))
    b = (doc_top_tfidf(rd.from_pandas(pd.DataFrame(rows)).repartition(8),
                       k=2).to_pandas()
         .sort_values(["doc_id", "token"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_top_ngrams_local_equals_distributed_equals_duckdb():
    import duckdb
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import top_ngrams
    df = _corpus(n_docs=100, vocab_n=12, seed=4)
    # boundary shapes: split empties at edges, short docs, a planted
    # repeated boilerplate phrase
    df.loc[0, "text"] = "  accept all cookies \t accept all cookies "
    df.loc[1, "text"] = "one two"          # shorter than n=3
    df.loc[2, "text"] = ""
    # plant a genuine boilerplate phrase into a third of the docs
    for i in range(10, 40):
        df.loc[i, "text"] = df.loc[i, "text"] + " accept all cookies"
    ds = rd.from_pandas(df).repartition(5)
    dist = top_ngrams(ds, n=3, k=15, mode="distributed")
    loc = top_ngrams(ds, n=3, k=15, mode="local")
    pd.testing.assert_frame_equal(dist, loc)
    assert "accept all cookies" in set(dist["gram"])

    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute("""
        WITH words AS (
            SELECT list_filter(string_split_regex(
                       text, '[ \t\n\r\f\v]+'), x -> x <> '') AS l
            FROM documents),
        g AS (SELECT array_to_string(l[i:i+2], ' ') AS gram
              FROM words, LATERAL unnest(generate_series(
                      1, greatest(len(l) - 2, 0))) AS t(i))
        SELECT gram, CAST(count(*) AS BIGINT) AS n
        FROM g GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 15
        """).df()
    pd.testing.assert_frame_equal(dist, want, check_dtype=False)
    # n=1 degenerates to token counts; n=2 pairs; empty corpus typed
    uni = top_ngrams(ds, n=1, k=5, mode="distributed")
    from ocr_model_ray.functions.corpus_stats import top_tokens
    tok = top_tokens(ds, k=5, mode="distributed")
    assert list(uni["gram"]) == list(tok["token"])
    assert list(uni["n"]) == list(tok["n"])
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object")}))
    out = top_ngrams(empty, n=3, k=5, mode="distributed")
    assert list(out.columns) == ["gram", "n"] and out.empty


@pytest.mark.usefixtures("ray_session")
def test_bigram_fluency_planted_and_plans_agree():
    """Hand-computed planted corpus: the common transition "the cat"
    dominates doc 0 while doc 9 is one-off word salad; all three
    physical plans (local, broadcast, gram/w1-bucket join) agree
    bit-for-bit."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import bigram_fluency

    # 8 fluent docs repeating "the cat sat" + 1 salad doc + 1 one-token
    rows = [{"doc_id": i, "text": "the cat sat"} for i in range(8)]
    rows.append({"doc_id": 8, "text": "zq xv bn"})
    rows.append({"doc_id": 9, "text": "lonely"})
    ds = rd.from_items(rows).repartition(3)

    a = bigram_fluency(ds, mode="local")
    b = bigram_fluency(ds, mode="distributed")
    c = bigram_fluency(ds, mode="distributed", vocab_broadcast_rows=0)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)

    # doc 9 has no bigram -> absent
    assert set(a["doc_id"]) == set(range(9))
    # corpus: c("the cat")=8, c("cat sat")=8, c("zq xv")=1, c("xv bn")=1
    # TB = 18; unigram c("the")=c("cat")=8, c("zq")=c("xv")=1
    d0 = a[a["doc_id"] == 0].iloc[0]
    assert d0["n_bigrams"] == 2 and d0["sum_bi"] == 16
    # "the cat": 8*64 < 8*1 false; "cat sat": 8*64 < 8 false -> 0 rare
    assert d0["n_rare"] == 0 and d0["rare_ratio"] == 0.0
    assert d0["avg_bi_freq"] == 16 / (2 * 1.0 * 18)
    d8 = a[a["doc_id"] == 8].iloc[0]
    # "zq xv": 1*64 < 1? no (cu("zq")=1). planted counts too small to
    # trip the 1/64 MLE cut -- verify the raw aggregates instead
    assert d8["n_bigrams"] == 2 and d8["sum_bi"] == 2
    assert d8["avg_bi_freq"] == 2 / (2 * 1.0 * 18)


@pytest.mark.usefixtures("ray_session")
def test_bigram_fluency_rare_cut_and_boundaries():
    """A transition seen once against a 100x-frequent context word is
    rare under the 1/64 MLE cut; bigrams never cross document
    boundaries; empty/whitespace docs are absent."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import bigram_fluency

    rows = [{"doc_id": i, "text": "the end"} for i in range(100)]
    rows.append({"doc_id": 100, "text": "the zebra"})
    rows.append({"doc_id": 101, "text": "   \t\n "})
    ds = rd.from_items(rows).repartition(4)
    out = bigram_fluency(ds, mode="local")
    assert 101 not in set(out["doc_id"])
    z = out[out["doc_id"] == 100].iloc[0]
    # c("the zebra")=1, c("the")=101: 1*64 < 101 -> rare
    assert z["n_rare"] == 1 and z["rare_ratio"] == 1.0
    f = out[out["doc_id"] == 0].iloc[0]
    # c("the end")=100: 100*64 < 101 false -> fluent
    assert f["n_rare"] == 0

    # boundary: "a b" + "b a" rows never create cross-row bigrams —
    # each doc_id holds 3 identical rows, so n_bigrams = 3 and the
    # corpus gram count is 3 (sum_bi = 3*3); any boundary leak would
    # inflate n_bigrams past 3 per id
    docs = rd.from_items([{"doc_id": 0, "text": "a b"},
                          {"doc_id": 1, "text": "b a"}] * 3)
    o2 = bigram_fluency(docs, mode="local")
    assert (o2["sum_bi"] == 9).all() and (o2["n_bigrams"] == 3).all()


@pytest.mark.usefixtures("ray_session")
def test_bigram_fluency_empty_corpus():
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import bigram_fluency
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object")}))
    out = bigram_fluency(empty, mode="local")
    assert list(out.columns) == ["doc_id", "n_bigrams", "sum_bi",
                                 "n_rare", "rare_ratio", "avg_bi_freq"]
    assert out.empty
    # all-short corpus (no bigram anywhere)
    short = rd.from_items([{"doc_id": 0, "text": "one"},
                           {"doc_id": 1, "text": ""}])
    assert bigram_fluency(short, mode="local").empty
