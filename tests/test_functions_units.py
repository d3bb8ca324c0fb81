"""Unit tests for functions/: text stats, dedup algorithms, similarity,
joins, top-k — including behavior on real-language samples and planted
near-duplicates (the testdata documents are word salad, so semantic
checks live here)."""

import numpy as np
import pandas as pd
import pytest

from ocr_model_ray.functions.dedup_algos import (
    minhash_signature, ngram_jaccard, shingles,
)
from ocr_model_ray.functions.text_stats import (
    LangIdWorker, quality_batch, simhash64, token_count_batch,
    winnow_fingerprints,
)


def test_token_count_semantics():
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["a b  c", "  ", "", "one\ttwo\nthree"]})
    out = token_count_batch(df)
    assert out["n_tokens"].tolist() == [3, 0, 0, 3]


def test_quality_ratios_are_exact_divisions():
    df = pd.DataFrame({"doc_id": [1], "text": ["ab, cd! 12"]})
    out = quality_batch(df)
    assert out["n_chars"].iloc[0] == 10
    assert out["n_words"].iloc[0] == 3
    assert out["punct_ratio"].iloc[0] == 2 / 10
    assert out["digit_ratio"].iloc[0] == 2 / 10
    assert out["avg_word_len"].iloc[0] == 8 / 3


def test_lang_id_on_real_language():
    w = LangIdWorker()
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat sat on the mat and it is a fine day for the team",
                 "der Hund und die Katze sind nicht mit der Maus ich bin",
                 "le chien et les chats sont dans la maison pour le dîner"],
    })
    out = w(df)
    assert out["pred_lang"].tolist() == ["en", "de", "fr"]


def test_simhash_similar_texts_close():
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy dog again and again!"
    c = "completely different content about databases and query engines"
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    def ham(x, y):
        return bin(x ^ y).count("1")
    assert ham(ha, hb) < ham(ha, hc)
    assert ham(ha, hb) <= 8
    assert simhash64("") == 0


def test_winnow_fingerprints_substring_overlap():
    base = "abcdefghijklmnopqrstuvwxyz" * 4
    other = "0123456789" * 10
    fa = set(winnow_fingerprints(base))
    fb = set(winnow_fingerprints(base[10:60]))   # substring -> shared prints
    fc = set(winnow_fingerprints(other))
    assert fa & fb
    assert not (fa & fc)
    assert winnow_fingerprints("") == []


def test_minhash_jaccard_estimate():
    a = "one two three four five six seven eight nine ten " * 5
    b = a.replace("five", "FIVE")       # small edit
    sa, sb = shingles(a), shingles(b)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    true_j = inter / (sa.size + sb.size - inter)
    siga, sigb = minhash_signature(sa), minhash_signature(sb)
    est = float((siga == sigb).mean())
    assert abs(est - true_j) < 0.2


def test_ngram_jaccard_pairs():
    texts = {1: "a b c d e f", 2: "a b c d e f", 3: "x y z w v u"}
    pairs = pd.DataFrame({"doc_a": [1, 1], "doc_b": [2, 3]})
    out = ngram_jaccard(texts, pairs)
    assert out["jaccard"].tolist() == [1.0, 0.0]


@pytest.mark.usefixtures("ray_session")
def test_near_dup_pipeline_finds_planted_dups():
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import near_dup_pairs
    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "the green fields towards the old farm house near the river") * 3
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": f"unique document number {i} " +
                     " ".join(f"w{i}x{j}" for j in range(60))})
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base + " extra tail words here"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = near_dup_pairs(ds, threshold=0.8)
    assert [(100, 101)] == list(zip(pairs["doc_a"], pairs["doc_b"]))

    from ocr_model_ray.functions.dedup_algos import near_dup_clusters
    clusters = near_dup_clusters(ds, threshold=0.8)
    assert clusters.to_dict("records") == [
        {"doc_id": 100, "cluster_id": 100},
        {"doc_id": 101, "cluster_id": 100}]


@pytest.mark.usefixtures("ray_session")
def test_near_dup_exact_group_skew_no_blowup():
    """5k identical docs must NOT explode into O(n^2) LSH pairs: the
    exact-dedup pre-pass collapses them to one representative, members
    attach as (rep, member, 1.0) edges — 4,999 pairs, one cluster —
    and the pipeline finishes in seconds (VERDICT round-1 #2)."""
    import time
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import (
        near_dup_clusters, near_dup_pairs)
    boiler = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
              "do eiusmod tempor incididunt ut labore et dolore magna") * 2
    rows = [{"doc_id": i, "text": boiler} for i in range(5000)]
    rows += [{"doc_id": 10_000 + i,
              "text": f"distinct filler document {i} " +
              " ".join(f"tok{i}q{j}" for j in range(50))} for i in range(50)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    t0 = time.monotonic()
    pairs = near_dup_pairs(ds, threshold=0.8)
    wall = time.monotonic() - t0
    # 4999 exact edges (rep=0), nothing else
    assert len(pairs) == 4999
    assert (pairs["doc_a"] == 0).all()
    assert (pairs["jaccard"] == 1.0).all()
    assert wall < 60, f"skew pipeline took {wall:.1f}s — pair blowup?"
    clusters = near_dup_clusters(ds, threshold=0.8)
    assert len(clusters) == 5000
    assert (clusters["cluster_id"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_near_dup_mixed_exact_and_near():
    """Exact members must connect THROUGH their representative to the
    rep's near-dups: X==Y (exact), Z ~ X -> pairs (X,Y,1.0) + (X,Z,j);
    clusters put all three together."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import (
        near_dup_clusters, near_dup_pairs)
    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "the green fields towards the old farm house near the river") * 3
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                        # exact dup of 1
        {"doc_id": 3, "text": base + " extra tail words"},  # near dup of 1
        {"doc_id": 9, "text": "totally unrelated content " +
         " ".join(f"z{j}" for j in range(80))},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = near_dup_pairs(ds, threshold=0.8)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert got == {(1, 2), (1, 3)}
    assert pairs.set_index(["doc_a", "doc_b"])["jaccard"][(1, 2)] == 1.0
    clusters = near_dup_clusters(ds, threshold=0.8)
    assert clusters.to_dict("records") == [
        {"doc_id": 1, "cluster_id": 1},
        {"doc_id": 2, "cluster_id": 1},
        {"doc_id": 3, "cluster_id": 1}]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("engine", ["pandas", "ray"])
def test_min_label_propagation_chain(engine):
    """Label propagation must traverse chains (a-b, b-c, c-d -> one
    component labeled min) and keep disjoint components apart — on BOTH
    the driver-vectorized and the distributed groupby engine."""
    from ocr_model_ray.functions.dedup_algos import min_label_propagation
    pairs = pd.DataFrame({"doc_a": [10, 20, 30, 50],
                          "doc_b": [20, 30, 40, 60]})
    out = min_label_propagation(pairs, engine=engine)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {10: 10, 20: 10, 30: 10, 40: 10, 50: 50, 60: 50}


@pytest.mark.usefixtures("ray_session")
def test_lsh_bucket_cap_bounds_pairs():
    """A band bucket over max_bucket is sampled, not exploded (the
    warning fires inside the worker task; the observable contract is
    the pair bound)."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import minhash_lsh_candidates
    # same text -> all docs share every band bucket (no exact pre-pass
    # here: minhash_lsh_candidates is the raw candidate stage)
    rows = [{"doc_id": i, "text": "same words everywhere again and again"}
            for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    cand = minhash_lsh_candidates(ds, max_bucket=8)
    assert len(cand) <= 8 * 7 // 2  # capped prefix pairs only


@pytest.mark.usefixtures("ray_session")
def test_hash_bucket_join_matches_pandas():
    import ray.data as rd
    from ocr_model_ray.functions.joins import hash_bucket_join
    rng = np.random.RandomState(3)
    left = pd.DataFrame({"k": rng.randint(0, 50, 500),
                         "v": rng.normal(size=500)})
    right = pd.DataFrame({"k": np.arange(0, 60, 2),
                          "w": np.arange(30) * 10})
    got = hash_bucket_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", num_buckets=8).to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    gs = got.sort_values(["k", "v"]).reset_index(drop=True)
    ws = want.sort_values(["k", "v"]).reset_index(drop=True)
    assert np.allclose(gs["w"].astype(float), ws["w"].astype(float))


@pytest.mark.usefixtures("ray_session")
def test_topk_matches_full_sort():
    import ray.data as rd
    from ocr_model_ray.functions.topk import topk
    rng = np.random.RandomState(5)
    df = pd.DataFrame({"id": np.arange(5000), "score": rng.normal(size=5000)})
    got = topk(rd.from_pandas(df).repartition(10), ["score", "id"], k=7,
               descending=[True, False])
    want = df.sort_values(["score", "id"], ascending=[False, True]).head(7)
    assert got["id"].tolist() == want["id"].tolist()


def test_signatures_block_equals_per_doc_signatures():
    """The vectorized reduceat signature path must equal the per-doc
    reference computation exactly — including empty docs."""
    from ocr_model_ray.functions.dedup_algos import (
        _signatures_block, minhash_signature, shingles)
    texts = ["the quick brown fox jumps over the lazy dog",
             "", "   ", "one two", "one two three four five six " * 10,
             "unrelated words entirely here present"]
    block = _signatures_block(texts, 3)
    for i, t in enumerate(texts):
        ref = minhash_signature(shingles(t, 3))
        assert np.array_equal(block[i], ref), f"doc {i} signature differs"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abcdefg hij", min_size=0, max_size=60),
                min_size=1, max_size=12))
def test_signatures_block_property(texts):
    from ocr_model_ray.functions.dedup_algos import (
        _signatures_block, minhash_signature, shingles)
    block = _signatures_block(texts, 3)
    for i, t in enumerate(texts):
        assert np.array_equal(block[i], minhash_signature(shingles(t, 3)))


@pytest.mark.usefixtures("ray_session")
def test_near_dup_recall_with_large_exact_group():
    """Round-2 code-review regression: a >max_bucket exact-dup group
    must not evict genuine near-dup candidates from the capped LSH
    buckets — identical texts collapse to their rep (via the ch column)
    BEFORE the cap."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import near_dup_pairs
    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "the green fields towards the old farm house near the river ") * 3
    rows = [{"doc_id": i, "text": base} for i in range(100)]
    rows.append({"doc_id": 1000, "text": base + " extra tail words here"})
    pairs = near_dup_pairs(rd.from_pandas(pd.DataFrame(rows)), threshold=0.8)
    exact = pairs[pairs["jaccard"] == 1.0]
    near = pairs[pairs["jaccard"] < 1.0]
    assert len(exact) == 99 and (exact["doc_a"] == 0).all()
    assert list(zip(near["doc_a"], near["doc_b"])) == [(0, 1000)]


def test_topk_candidates_keeps_boundary_ties():
    """Round-2 review-3 regression: tied sims at the k-boundary must ALL
    survive the per-batch partial top-k so the global (sim desc, id asc)
    tie-break can pick the smallest id."""
    from ocr_model_ray.functions.similarity import _topk_candidates
    col = np.array([0.9, 0.9, 0.9, 0.9, 0.1])
    keep = set(_topk_candidates(col, 2))
    assert keep == {0, 1, 2, 3}          # every tied candidate kept
    assert set(_topk_candidates(col, 5)) == {0, 1, 2, 3, 4}
    assert set(_topk_candidates(col, 9)) == {0, 1, 2, 3, 4}


@pytest.mark.usefixtures("ray_session")
def test_knn_tie_break_across_blocks():
    """Duplicate embeddings split across blocks: the smallest tied
    neighbor_id must win regardless of block partitioning."""
    import ray.data as rd
    from ocr_model_ray.functions.similarity import knn_bruteforce
    vec = [1.0, 0.0, 0.0]
    other = [0.0, 1.0, 0.0]
    rows = [{"vec_id": i, "embedding": vec} for i in (12, 3, 9, 40, 25)]
    rows.append({"vec_id": 100, "embedding": other})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    q = pd.DataFrame({"vec_id": [999], "embedding": [vec]})
    out = knn_bruteforce(ds, q, k=2, exclude_self=True)
    assert out["neighbor_id"].tolist() == [3, 9]   # smallest tied ids


@pytest.mark.usefixtures("ray_session")
def test_broadcast_join_rejects_outer():
    import ray.data as rd
    from ocr_model_ray.functions.joins import broadcast_join
    ds = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="hash_bucket_join"):
        broadcast_join(ds, pd.DataFrame({"k": [1], "w": [3]}),
                       on="k", how="outer")


@pytest.mark.usefixtures("ray_session")
def test_bucket_join_left_agg_schema_stable_on_right_only_buckets():
    """left_agg must run on empty left frames too, so right-only buckets
    emit the aggregated schema (not the raw left columns)."""
    import ray.data as rd
    from ocr_model_ray.functions.joins import hash_bucket_join
    left = pd.DataFrame({"k": [1, 1], "x": [2.0, 3.0], "junk": ["a", "b"]})
    right = pd.DataFrame({"k": list(range(64)), "w": list(range(64))})

    def agg(lf):
        return (lf.group_by("k").aggregate([("x", "sum")])
                .rename_columns(["k", "sum_x"]))

    out = hash_bucket_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", num_buckets=8, left_agg=agg).to_pandas()
    assert sorted(out.columns) == ["k", "sum_x", "w"]
    assert out["sum_x"].tolist() == [5.0]


def test_min_label_propagation_converges_on_long_chain():
    """Round-2 review-3 regression: fixpoint default must traverse
    chains longer than any fixed round cap."""
    from ocr_model_ray.functions.dedup_algos import min_label_propagation
    pairs = pd.DataFrame({"doc_a": list(range(0, 80)),
                          "doc_b": list(range(1, 81))})
    out = min_label_propagation(pairs, engine="pandas")
    assert (out["cluster_id"] == 0).all() and len(out) == 81


@pytest.mark.usefixtures("ray_session")
def test_min_label_propagation_ray_large_no_driver_collect(monkeypatch):
    """Round-2 verdict fix #1: the ray engine on >50k edges must (a)
    match the pandas engine exactly and (b) never collect the full
    label table to the driver during the rounds — labels stay a
    Dataset; the ONLY to_pandas is the final result conversion."""
    import ray.data as rd
    from ocr_model_ray.functions import dedup_algos

    rng = np.random.RandomState(11)
    n = 4000
    a = rng.randint(0, n, 60_000).astype("int64")
    b = rng.randint(0, n, 60_000).astype("int64")
    m = a != b
    pairs = pd.DataFrame({"doc_a": a[m], "doc_b": b[m]})
    assert len(pairs) * 2 >= 50_000  # auto would pick 'ray' here

    calls = {"n": 0}
    orig = rd.Dataset.to_pandas

    def counting_to_pandas(self, *args, **kw):
        calls["n"] += 1
        return orig(self, *args, **kw)

    monkeypatch.setattr(rd.Dataset, "to_pandas", counting_to_pandas)
    got = dedup_algos.min_label_propagation(pairs, engine="ray")
    assert calls["n"] == 1, (
        f"ray engine collected a Dataset to the driver {calls['n']} times "
        "during label propagation; only the final result conversion is "
        "allowed")
    monkeypatch.undo()
    want = dedup_algos.min_label_propagation(pairs, engine="pandas")
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_near_dup_local_plan_equals_distributed():
    """mode='local' (small-input single-task plan) and
    mode='distributed' (sort-shuffle plan) must produce identical pairs
    and clusters; 'auto' on a small parquet read resolves to local."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import (
        _resolve_mode, near_dup_clusters, near_dup_pairs)

    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "the green fields towards the old farm house near the river") * 3
    rows = [{"doc_id": i, "text": f"unique document number {i} " +
             " ".join(f"w{i}x{j}" for j in range(60))} for i in range(30)]
    rows += [{"doc_id": 100, "text": base},
             {"doc_id": 101, "text": base},                       # exact
             {"doc_id": 102, "text": base + " extra tail words"}]  # near
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "docs.parquet")
        pq.write_table(pa.Table.from_pylist(rows), path)
        ds = rd.read_parquet(path)
        assert _resolve_mode(ds, "auto") == "local"
        results = {}
        for mode in ("local", "distributed"):
            p = near_dup_pairs(ds, threshold=0.8, mode=mode)
            c = near_dup_clusters(ds, threshold=0.8, mode=mode)
            results[mode] = (p, c)
        pd.testing.assert_frame_equal(*(results[m][0] for m in results))
        pd.testing.assert_frame_equal(*(results[m][1] for m in results))
        got = set(zip(results["local"][0]["doc_a"],
                      results["local"][0]["doc_b"]))
        assert got == {(100, 101), (100, 102)}

    # from_pandas has no parquet metadata -> auto must stay distributed
    ds_mem = rd.from_pandas(pd.DataFrame(rows))
    assert _resolve_mode(ds_mem, "auto") == "distributed"


def test_pii_scrub_semantics_and_duckdb_parity():
    """Scrub order (email -> ip -> phone), placeholder text, counts per
    stage — and byte-identical parity with the DuckDB RE2 oracle on
    text that actually CONTAINS PII (the sf testdata is word salad, so
    the sf-level oracle check alone never exercises the patterns)."""
    import duckdb
    from ocr_model_ray.functions.text_stats import pii_scrub_batch

    df = pd.DataFrame({"doc_id": list(range(6)), "text": [
        "write to john.doe+spam@mail.example.org today",
        "server at 192.168.0.1 and 10.0.0.255, call +1 555-123-4567",
        "bare number 12345678901 and (020) 7946-0958 end",
        "email-with-ip user@10.0.0.1.example.com mixed",
        "no pii here at all",
        "v4-ish 999.999.999.999 still matches the shape",
    ]})
    out = pii_scrub_batch(df)
    assert out["scrubbed"][0] == "write to [EMAIL] today"
    assert out["scrubbed"][1] == "server at [IP] and [IP], call [PHONE]"
    # the phone pattern anchors on a digit, so a leading "(" survives
    assert out["scrubbed"][2] == "bare number [PHONE] and ([PHONE] end"
    assert out["scrubbed"][4] == "no pii here at all"
    assert out["n_emails"].tolist() == [1, 0, 0, 1, 0, 0]
    assert out["n_ips"].tolist() == [0, 2, 0, 0, 0, 1]
    assert out["n_phones"].tolist() == [0, 1, 2, 0, 0, 0]

    import __ray_entry__ as em
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(em.oracle_sql()["docs_pii_scrub"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_normalize_text_semantics_and_duckdb_parity():
    import duckdb
    from ocr_model_ray.functions.text_stats import normalize_text_batch

    df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [
        "café combining",          # NFC composes e + U+0301
        "  tabs\tand\nnewlines\r\n  ",
        "ctrl\x01chars\x1fstripped\x7f",
        " nbsp is NOT ascii ws ",  # explicit class keeps NBSP
    ]})
    out = normalize_text_batch(df)
    assert out["normalized"][0] == "café combining"
    assert out["normalized"][1] == "tabs and newlines"
    assert out["normalized"][2] == "ctrlcharsstripped"
    assert out["normalized"][3] == " nbsp is NOT ascii ws "
    assert out["n_chars_raw"][0] == len("café combining")
    assert out["n_chars_norm"][0] == len("café combining")

    import __ray_entry__ as em
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(em.oracle_sql()["docs_normalize"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_hash_bucket_join_local_mode_equals_distributed(how):
    """mode='local' (collect + one pa.Table.join) must equal the
    bucket-shuffle plan for every join type, including left_agg and
    post_merge hooks."""
    import pyarrow as pa
    import ray.data as rd
    from ocr_model_ray.functions.joins import hash_bucket_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame({"k": rng.randint(0, 40, 300),
                         "x": rng.randint(0, 1000, 300).astype("int64")})
    right = pd.DataFrame({"k": np.arange(0, 50, 2),
                          "w": np.arange(25) * 10})

    def agg(lf: pa.Table) -> pa.Table:
        return (lf.group_by("k").aggregate([("x", "sum")])
                .rename_columns(["k", "sum_x"]))

    def post(t: pa.Table) -> pa.Table:
        return t.append_column("z", pa.array([1] * t.num_rows, pa.int64()))

    results = {}
    for mode in ("local", "distributed"):
        out = hash_bucket_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k",
            num_buckets=8, how=how, left_agg=agg, post_merge=post,
            mode=mode).to_pandas()
        results[mode] = out.sort_values(["k"]).reset_index(drop=True)
    a, b = results["local"], results["distributed"]
    assert sorted(a.columns) == sorted(b.columns)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q3_q10_local_plan_equals_distributed(monkeypatch):
    """q3/q10 results must be identical whichever join plan the
    size cut picks (sf0.001 is far under the threshold, so flipping
    SMALL_JOIN_BYTES to 0 forces the distributed plan)."""
    from ocr_model_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    local_q3 = relational.q3_top_orders(sf)
    local_q10 = relational.q10_returned_revenue(sf)
    local_q5 = relational.q5_region_revenue(sf)
    monkeypatch.setattr(relational, "SMALL_JOIN_BYTES", 0)
    assert relational._join_mode(sf, "lineitem", "orders") == "distributed"
    dist_q3 = relational.q3_top_orders(sf)
    dist_q10 = relational.q10_returned_revenue(sf)
    dist_q5 = relational.q5_region_revenue(sf)
    pd.testing.assert_frame_equal(local_q3, dist_q3, check_dtype=False)
    pd.testing.assert_frame_equal(local_q10, dist_q10, check_dtype=False)
    pd.testing.assert_frame_equal(local_q5, dist_q5, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_grouped_topk_matches_pandas_window():
    """Per-group top-k across many blocks equals the single-frame
    window computation, with deterministic tie-break."""
    import ray.data as rd
    from ocr_model_ray.functions.topk import grouped_topk
    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 400),
        "v": rng.randint(0, 40, 400),
        "id": np.arange(400)})
    got = grouped_topk(rd.from_pandas(df).repartition(7),
                       ["g"], ["v", "id"], k=5)
    want = (df.sort_values(["v", "id"]).groupby("g", sort=False).head(5)
            .sort_values(["g", "v", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["g", "v", "id"]],
                                  want[["g", "v", "id"]])


def test_hash_split_dup_consistency_and_ratios():
    """Content-keyed split: exact duplicate texts always land in the
    same split (no train/eval leakage through dups), null text gets a
    null split, and the bucket arithmetic matches md5-prefix % 100."""
    import hashlib
    from ocr_model_ray.functions.text_stats import hash_split_batch
    texts = [f"document number {i} with some words" for i in range(200)]
    df = pd.DataFrame({
        "doc_id": np.arange(403),
        "text": texts + texts + ["shared dup", "shared dup", None]})
    out = hash_split_batch(df)
    by_text = df.assign(split=out["split"].to_numpy())
    groups = by_text.dropna(subset=["text"]).groupby("text")["split"].nunique()
    assert (groups == 1).all()
    assert out["split"].iloc[-1] is None
    b = int(hashlib.md5("shared dup".encode()).hexdigest()[:4], 16) % 100
    want = "train" if b < 80 else "val" if b < 90 else "test"
    assert out["split"].iloc[-2] == want
    assert set(out["split"].dropna()) <= {"train", "val", "test"}


@pytest.mark.usefixtures("ray_session")
def test_sequence_pack_prefix_sum_invariants():
    """Global token prefix sum is exact and partitioning-independent:
    cum_before[i] == sum of n_tokens over all smaller ids, regardless
    of block layout, and seq_id cuts every seq_len tokens."""
    import ray.data as rd
    from ocr_model_ray.functions.packing import sequence_pack
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "doc_id": rng.permutation(300),
        "text": [" ".join(["w"] * int(n)) for n in rng.randint(0, 40, 300)]})
    for parts in (1, 9):
        # to_pandas WITHOUT a sort: the returned Dataset's block order
        # (bucket ranges, each internally id-sorted) IS global id order
        out = sequence_pack(rd.from_pandas(df).repartition(parts),
                            seq_len=16, num_buckets=8).to_pandas()
        ordered = df.sort_values("doc_id").reset_index(drop=True)
        want_counts = ordered["text"].str.split().str.len().fillna(0)
        want_cum = want_counts.cumsum().shift(fill_value=0).astype("int64")
        assert out["doc_id"].tolist() == ordered["doc_id"].tolist()
        assert out["cum_before"].tolist() == want_cum.tolist()
        assert (out["seq_id"] == out["cum_before"] // 16).all()


@pytest.mark.usefixtures("ray_session")
def test_sequence_pack_streams_to_parquet(tmp_path, monkeypatch):
    """Round-2 verdict fix #2: the packed output is a Dataset that can
    be written straight to parquet with NO driver pandas collect."""
    import ray.data as rd
    from ocr_model_ray.functions.packing import sequence_pack

    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype="int64"),
        "text": ["alpha beta gamma"] * 200})

    calls = {"n": 0}
    orig = rd.Dataset.to_pandas

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(rd.Dataset, "to_pandas", counting)
    packed = sequence_pack(rd.from_pandas(df).repartition(4),
                           seq_len=32, num_buckets=8)
    assert isinstance(packed, rd.Dataset)
    packed.write_parquet(str(tmp_path / "packed"))
    # exactly ONE driver collect is allowed: the pass-1 bucket partials
    # (<= num_buckets rows per input block), never the per-doc output
    assert calls["n"] <= 1, "sequence_pack collected per-doc output"
    monkeypatch.undo()

    back = pd.read_parquet(tmp_path / "packed").sort_values(
        "doc_id").reset_index(drop=True)
    assert len(back) == 200
    # 3 tokens/doc, seq_len=32: doc i starts at offset 3i
    assert (back["cum_before"] == back["doc_id"] * 3).all()
    assert (back["seq_id"] == (back["doc_id"] * 3) // 32).all()


@pytest.mark.usefixtures("ray_session")
def test_decontamination_planted_overlap():
    """A doc sharing an 8-gram with the eval set is flagged with the
    exact distinct-collision count; clean docs are not flagged."""
    import ray.data as rd
    from ocr_model_ray.functions.decontam import contamination, ngram_set
    leak = "the quick brown fox jumps over the lazy dog tonight"
    evals = [f"benchmark question: {leak} answer choice A"]
    grams = ngram_set(evals, n=8)
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"web page copying {leak} verbatim here",
                 "a completely unrelated page about gardening tools and "
                 "soil preparation for spring vegetables in raised beds",
                 None]})
    out = (contamination(rd.from_pandas(corpus), grams, n=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["contaminated"].tolist() == [True, False, False]
    toks = leak.split()
    n_grams_in_leak = len(toks) - 8 + 1
    assert out["n_contaminated"].iloc[0] == n_grams_in_leak


def test_repetition_filters_flag_repetitive_text():
    """Gopher repetition metrics: a degenerate repeated-token page
    scores ~1, varied prose scores low, duplicate lines are counted,
    and empty/null texts yield null fractions."""
    from ocr_model_ray.functions.text_stats import repetition_batch
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["spam spam spam spam spam spam",
                 "each word here appears exactly once today",
                 "line one\nline two\nline one\nline one",
                 "",
                 None]})
    out = repetition_batch(df)
    assert out["n_words"].tolist() == [6, 7, 8, 0, 0]
    assert out["top_word_frac"].iloc[0] == 1.0
    assert out["top_bigram_frac"].iloc[0] == 1.0
    assert out["top_word_frac"].iloc[1] == 1 / 7
    # doc 3: 4 lines, 2 distinct -> dup_line_frac = 0.5; top word
    # "line" appears 4/8, top bigram "line one" 3/7
    assert out["dup_line_frac"].iloc[2] == 0.5
    assert out["top_word_frac"].iloc[2] == 4 / 8
    assert out["top_bigram_frac"].iloc[2] == 3 / 7
    assert np.isnan(out["top_word_frac"].iloc[3])
    assert np.isnan(out["top_word_frac"].iloc[4])
    assert np.isnan(out["dup_line_frac"].iloc[4])


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_error_bound_and_partition_independence():
    """Histogram-sketch quantiles are within one bin width of the exact
    quantile and identical across block layouts (int64 bin counts are
    order-independent, so the merge commutes)."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import approx_quantiles
    rng = np.random.RandomState(3)
    vals = rng.gamma(4.0, 250.0, 20000)
    df = pd.DataFrame({"v": vals})
    lo, hi, nbins = 0.0, 4000.0, 200
    w = (hi - lo) / nbins
    outs = [approx_quantiles(rd.from_pandas(df).repartition(p),
                             "v", lo, hi, nbins=nbins)
            for p in (1, 13)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for _, row in outs[0].iterrows():
        exact = np.quantile(vals, row["q"])
        assert abs(row["value_est"] - exact) <= w + 1e-9, \
            f"q={row['q']}: {row['value_est']} vs exact {exact}"


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantiles_match_per_group_single():
    """Per-group sketch equals running the single-column sketch on each
    group's rows alone — grouping only partitions the counters."""
    import ray.data as rd
    from ocr_model_ray.functions.corpus_stats import (
        approx_quantiles, grouped_approx_quantiles)
    rng = np.random.RandomState(5)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], 5000),
                       "v": rng.uniform(0, 1000, 5000)})
    got = grouped_approx_quantiles(rd.from_pandas(df).repartition(7),
                                   "g", "v", 0.0, 1000.0, nbins=100)
    for grp in ("a", "b"):
        sub = df[df["g"] == grp][["v"]]
        want = approx_quantiles(rd.from_pandas(sub), "v",
                                0.0, 1000.0, nbins=100,
                                qs=(0.25, 0.5, 0.9))
        g = got[got["g"] == grp].reset_index(drop=True)
        assert g["q"].tolist() == want["q"].tolist()
        assert g["value_est"].tolist() == want["value_est"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_cosine_near_dup_bucketed_equals_allpairs():
    """Round-2 verdict fix #3: the LSH-bucketed plan must match the
    exact all-pairs sweep on a clustered corpus (table count from
    _lsh_num_tables at the given threshold; deterministic seed)."""
    import ray.data as rd
    from ocr_model_ray.functions.similarity import cosine_near_dup
    rng = np.random.RandomState(3)
    base = rng.normal(size=(30, 16))
    ids, vecs = [], []
    vid = 0
    for c in range(30):
        for _ in range(10):
            ids.append(vid)
            vecs.append((base[c] + rng.normal(scale=0.02, size=16)).tolist())
            vid += 1
    for _ in range(200):
        ids.append(vid)
        vecs.append(rng.normal(size=16).tolist())
        vid += 1
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": vecs})) \
        .repartition(4)
    ap = cosine_near_dup(ds, threshold=0.8, mode="allpairs")
    bk = cosine_near_dup(ds, threshold=0.8, mode="bucketed")
    pd.testing.assert_frame_equal(ap, bk)
    assert len(ap) > 1000  # the fixture actually has near-dups


@pytest.mark.usefixtures("ray_session")
def test_cosine_near_dup_bucketed_caps_skewed_bucket():
    """10k near-identical vectors all land in the same LSH buckets: the
    bucketed plan samples to max_bucket (bounded pair count, completes)
    instead of the O(N^2) sweep."""
    import ray.data as rd
    from ocr_model_ray.functions.similarity import cosine_near_dup
    rng = np.random.RandomState(9)
    center = rng.normal(size=8)
    vecs = (center[None, :]
            + rng.normal(scale=1e-4, size=(10_000, 8))).tolist()
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(10_000, dtype="int64"),
         "embedding": vecs})).repartition(4)
    out = cosine_near_dup(ds, threshold=0.9, mode="bucketed",
                          max_bucket=64)
    # every surviving pair is real, and the cap bounded the blow-up:
    # <= C(64,2) pairs per (table, bucket), deduped across tables
    assert (out["sim"] >= 0.9 - 1e-6).all()
    assert 0 < len(out) <= 64 * 63 // 2


@pytest.mark.usefixtures("ray_session")
def test_q4_bloom_path_equals_broadcast():
    """Round-2 verdict fix #4: the bloom + exact-rescreen plan (the
    above-size-cut path) must produce identical priority counts to the
    broadcast semi-filter plan."""
    from ocr_model_ray.pipelines.relational import q4_priority_returned
    sf = "/root/testdata/sf0.001"
    bc = q4_priority_returned(sf, mode="broadcast")
    bl = q4_priority_returned(sf, mode="bloom")
    pd.testing.assert_frame_equal(bc, bl)
    assert bc["order_count"].sum() > 0


def test_q22_bloom_path_equals_broadcast():
    """Round-4 verdict fix #3: q22's bloom-prefiltered bucketed
    anti-join plan (the above-size-cut path — open-order custkeys
    never collect to the driver) must produce identical per-nation
    counts/balances to the broadcast anti plan."""
    from ocr_model_ray.pipelines.relational import q22_idle_rich_customers
    sf = "/root/testdata/sf0.001"
    bc = q22_idle_rich_customers(sf, mode="broadcast")
    bl = q22_idle_rich_customers(sf, mode="bloom")
    pd.testing.assert_frame_equal(bc, bl)
    assert bc["n_custs"].sum() > 0


def test_simhash64_matches_independent_scalar_implementation():
    """Round-2 verdict note #8: the committed simhash goldens are
    engine-generated, so cross-check simhash64 against a second,
    independently written SCALAR implementation of the same spec
    (rolling polynomial over utf-8 byte k-grams mod 2^64, xor-shift
    mix, majority bit vote). Catches vectorization bugs the golden pin
    cannot."""
    from ocr_model_ray.functions.text_stats import simhash64

    def scalar_simhash(text: str, k: int = 3) -> int:
        mask = (1 << 64) - 1
        data = text.encode("utf-8")
        if not data:
            return 0
        grams = ([data] if len(data) < k else
                 [data[i:i + k] for i in range(len(data) - k + 1)])
        votes = [0] * 64
        for g in grams:
            # polynomial sum_j byte[j] * base^(k-1-j), written directly
            h = 0
            for j, byte in enumerate(g):
                h = (h + byte * pow(1099511628211, len(g) - 1 - j, 1 << 64)) & mask
            h = ((h ^ (h >> 33)) * 0x9E3779B97F4A7C15) & mask
            h ^= h >> 29
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        out = 0
        for b in range(64):
            if votes[b] > 0:
                out |= 1 << b
        return out

    samples = [
        "", "a", "ab", "abc",
        "the quick brown fox jumps over the lazy dog",
        "pangrams are useful for hashing tests " * 3,
        "café naïve résumé — unicode bytes too",
        "aaaaaaaaaaaaaaaaaaaaaaaa",
    ]
    for s in samples:
        assert simhash64(s) == scalar_simhash(s), repr(s)


@pytest.mark.usefixtures("ray_session")
def test_grouped_sequence_pack_independent_streams():
    """Per-group packing: each group's prefix sum restarts at 0 and
    matches running sequence_pack on that group's rows alone,
    regardless of block layout."""
    import ray.data as rd
    from ocr_model_ray.functions.packing import (grouped_sequence_pack,
                                                 sequence_pack)
    rng = np.random.RandomState(21)
    df = pd.DataFrame({
        "doc_id": rng.permutation(400),
        "source": [f"s{i % 3}" for i in range(400)],
        "text": [" ".join(["w"] * int(n))
                 for n in rng.randint(0, 30, 400)]})
    out = grouped_sequence_pack(
        rd.from_pandas(df).repartition(7), group_col="source",
        seq_len=16, num_buckets=8).to_pandas()
    for src in ("s0", "s1", "s2"):
        sub = df[df["source"] == src][["doc_id", "text"]]
        want = sequence_pack(rd.from_pandas(sub), seq_len=16,
                             num_buckets=8).to_pandas()
        got = (out[out["source"] == src]
               .drop(columns="source").sort_values("doc_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_q18_local_plan_equals_distributed(monkeypatch):
    from ocr_model_ray.pipelines import relational as rel
    sf = "/root/testdata/sf0.001"
    local = rel.q18_large_orders(sf)
    monkeypatch.setattr(rel, "_join_mode", lambda *a: "distributed")
    dist = rel.q18_large_orders(sf)
    pd.testing.assert_frame_equal(local, dist)
    assert len(local) > 0


@pytest.mark.usefixtures("ray_session")
def test_window_operator_kernels():
    """functions.window: row_number / lag / cumsum kernels over the
    hash-partitioned shuffle must match pandas per-partition windows
    regardless of block layout."""
    import ray.data as rd
    from ocr_model_ray.functions.window import (
        cumsum_kernel, hash_partitioned_window, lag_kernel,
        row_number_kernel)
    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "k": rng.randint(0, 9, 300).astype("int64"),
        "o": rng.permutation(300).astype("int64"),
        "v": rng.randint(0, 100, 300).astype("int64")})
    ds = rd.from_pandas(df).repartition(5)
    srt = df.sort_values(["k", "o"])

    rn = hash_partitioned_window(
        ds, "k", ["o"], row_number_kernel(["k", "o"], name="rn")
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want_rn = srt.groupby("k").cumcount().to_numpy() + 1
    assert (rn["rn"].to_numpy() == want_rn).all()

    lg = hash_partitioned_window(
        ds, "k", ["o"], lag_kernel("v", ["k", "o"], name="prev_v")
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want_lag = srt.groupby("k")["v"].shift().to_numpy()
    got_lag = lg["prev_v"].astype(float).to_numpy()
    assert ((got_lag == want_lag) | (np.isnan(got_lag)
                                     & np.isnan(want_lag))).all()

    cs = hash_partitioned_window(
        ds, "k", ["o"], cumsum_kernel("v", ["k", "o"], name="run_v")
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want_cs = srt.groupby("k")["v"].cumsum().to_numpy()
    assert (cs["run_v"].to_numpy() == want_cs).all()


def test_jaccard_similarity_join_exact_and_modes():
    """Exact n-gram Jaccard join: planted near-dup found with the
    exactly-computable similarity, unrelated docs absent, and the
    local plan == the gram-bucketed distributed plan."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import (
        _strict_shingles, jaccard_similarity_join)

    base_words = [f"tok{i}" for i in range(50)]
    near = base_words[:48] + ["changed", "words"]
    rows = [{"doc_id": 0, "text": " ".join(base_words)},
            {"doc_id": 1, "text": " ".join(near)},
            {"doc_id": 2, "text": " ".join(f"other{i}" for i in range(50))},
            {"doc_id": 3, "text": "too short"}]   # <3 words at n=3? 2 words
    # exact expected jaccard for (0, 1): distinct 3-gram sets
    a = set(_strict_shingles(rows[0]["text"]).tolist())
    b = set(_strict_shingles(rows[1]["text"]).tolist())
    want_j = len(a & b) / len(a | b)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "docs.parquet")
        pq.write_table(pa.Table.from_pylist(rows), path)
        ds = rd.read_parquet(path)
        outs = {}
        for mode in ("local", "distributed"):
            out = jaccard_similarity_join(ds, threshold=0.5, mode=mode)
            outs[mode] = out.reset_index(drop=True)
        assert outs["local"].equals(outs["distributed"])
        out = outs["local"]
        assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]
        assert len(out) == 1 and (out["doc_a"][0], out["doc_b"][0]) == (0, 1)
        assert np.isclose(out["jaccard"][0], want_j, rtol=0, atol=0)
        # short doc yields no grams at all
        assert _strict_shingles("too short").size == 0


def test_interval_count_join_boundaries_and_replication():
    """Epoch-bucketed range join: [lo, lo+window) boundary semantics
    (lo inclusive, hi exclusive), zero-match left rows survive with 0,
    and a band spanning two epochs counts right rows from both."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from ocr_model_ray.functions.interval import interval_count_join

    H = 3_600_000_000  # 1h in us
    # epoch will be 1 day; craft a band that crosses midnight
    day = 86_400_000_000
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        # band 1: plain; band 2: crosses the epoch edge; band 3: empty
        "t0": pa.array([10 * H, day - H // 2, 5 * day], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "ts": pa.array([
            10 * H,            # == lo of band 1 -> counted (inclusive)
            11 * H,            # == hi of band 1 -> NOT counted
            10 * H + 1,        # inside band 1
            day - 1,           # band 2, before midnight
            day + H // 4,      # band 2, after midnight (second epoch)
            day + H,           # past band 2's hi
        ], pa.int64()),
    }))
    want = pd.DataFrame({"k": [1, 2, 3], "n": [2, 2, 0]})
    for mode in ("local", "distributed"):
        out = (interval_count_join(left, right, left_key="k",
                                   left_time="t0", right_time="ts",
                                   window_us=H, out_name="n", mode=mode)
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert out.astype("int64").equals(want.astype("int64")), (mode, out)


@pytest.mark.usefixtures("ray_session")
def test_q11_q13_q16_local_plan_equals_distributed(monkeypatch):
    """The round-3 local fast paths (q11/q13/q16) must match the
    distributed shuffle plans row-for-row (SMALL_JOIN_BYTES=0 forces
    the distributed branch on the same sf0.001 input)."""
    from ocr_model_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    local = {
        "q11": relational.q11_important_parts(sf),
        "q13": relational.q13_customer_distribution(sf),
        "q16": relational.q16_supplier_part_counts(sf),
    }
    monkeypatch.setattr(relational, "SMALL_JOIN_BYTES", 0)
    assert relational._join_mode(sf, "orders") == "distributed"
    dist = {
        "q11": relational.q11_important_parts(sf),
        "q13": relational.q13_customer_distribution(sf),
        "q16": relational.q16_supplier_part_counts(sf),
    }
    for k in local:
        pd.testing.assert_frame_equal(local[k], dist[k],
                                      check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_local_plan_equals_bucketed_distributed():
    """exact_dedup's single-frame local plan and the bucketed
    groupby(__b).map_groups distributed plan must agree row-for-row
    (including duplicate groups spanning input blocks)."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import exact_dedup

    rows = [{"doc_id": i, "text": f"unique text {i}"} for i in range(200)]
    rows += [{"doc_id": 1000 + i, "text": "a repeated document"}
             for i in range(7)]
    rows += [{"doc_id": 2000 + i, "text": "another dup"} for i in range(3)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(8)

    def canon(d):
        return (d.to_pandas().sort_values("h", kind="mergesort")
                .reset_index(drop=True)[["h", "keep_id", "n_dupes"]]
                .astype({"keep_id": "int64", "n_dupes": "int64"}))

    local = canon(exact_dedup(ds, mode="local"))
    dist = canon(exact_dedup(ds, mode="distributed"))
    pd.testing.assert_frame_equal(local, dist)
    assert int(local.loc[local["keep_id"] == 1000, "n_dupes"].iloc[0]) == 7
    assert int(local.loc[local["keep_id"] == 2000, "n_dupes"].iloc[0]) == 3


@pytest.mark.usefixtures("ray_session")
def test_bucketed_agg_matches_pandas_groupby():
    """bucketed_agg == plain pandas groupby for int keys, string keys,
    multi-column keys, and a non-distributive agg (nunique — exact
    because the exchange is by key hash, every row of a key lands in
    one bucket)."""
    import numpy as np
    import ray.data as rd
    from ocr_model_ray.functions.bucketed import (bucketed_agg,
                                                  bucketed_distinct)

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": rng.randint(0, 500, 5000).astype("int64"),
        "s": [f"tok{v}" for v in rng.randint(0, 300, 5000)],
        "v": rng.randint(0, 100, 5000).astype("int64"),
    })
    ds = rd.from_pandas(df).repartition(16)

    def canon(x, keys):
        return (x.sort_values(keys, kind="mergesort")
                .reset_index(drop=True))

    # int key, distributive
    got = canon(bucketed_agg(ds, "k", {"total": ("v", "sum"),
                                       "lo": ("v", "min"),
                                       "n": ("v", "size")},
                             num_buckets=7).to_pandas(), ["k"])
    want = canon(df.groupby("k", as_index=False).agg(
        total=("v", "sum"), lo=("v", "min"), n=("v", "size")), ["k"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # string key + non-distributive nunique
    got = canon(bucketed_agg(ds, "s", {"nk": ("k", "nunique")},
                             num_buckets=7).to_pandas(), ["s"])
    want = canon(df.groupby("s", as_index=False).agg(
        nk=("k", "nunique")), ["s"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # multi-column key
    got = canon(bucketed_agg(ds, ["k", "s"], {"total": ("v", "sum")},
                             num_buckets=7).to_pandas(), ["k", "s"])
    want = canon(df.groupby(["k", "s"], as_index=False).agg(
        total=("v", "sum")), ["k", "s"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # distinct
    got = canon(bucketed_distinct(ds, ["k", "s"],
                                  num_buckets=7).to_pandas(), ["k", "s"])
    want = canon(df[["k", "s"]].drop_duplicates(), ["k", "s"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_bucketed_agg_empty_input_no_crash():
    """A fully-filtered corpus must flow through bucketed_agg without
    raising; the result is an empty frame (schema-less — Ray's
    map_groups emits no blocks for zero groups, documented contract)."""
    import ray.data as rd
    from ocr_model_ray.functions.bucketed import (bucketed_agg,
                                                  bucketed_distinct)
    df = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                       "v": pd.Series([], dtype="int64")})
    out = bucketed_agg(rd.from_pandas(df), "k",
                       {"s": ("v", "sum")}).to_pandas()
    assert out.empty
    out = bucketed_distinct(rd.from_pandas(df), "k").to_pandas()
    assert out.empty


def test_weighted_sample_semantics():
    """Length-proportional sampling: long docs always kept (w >= 1),
    empty/null never kept, duplicates decide identically, and the
    empirical keep rate of mid-length docs tracks n_tokens/target."""
    from ocr_model_ray.functions.text_stats import weighted_sample_batch

    long_doc = " ".join(f"w{i}" for i in range(100))       # w = 100/64 > 1
    df = pd.DataFrame({
        "doc_id": range(4),
        "text": [long_doc, "", None, long_doc],
    })
    out = weighted_sample_batch(df, target_tokens=64)
    assert sorted(out["doc_id"]) == [0, 3]                 # dups agree

    # mid-length: ~16/64 = 25% expected keep rate over distinct docs
    mid = pd.DataFrame({
        "doc_id": range(2000),
        "text": [" ".join(f"t{i}x{j}" for j in range(16))
                 for i in range(2000)],
    })
    rate = len(weighted_sample_batch(mid, target_tokens=64)) / 2000
    assert 0.18 < rate < 0.32, rate


@pytest.mark.usefixtures("ray_session")
def test_cosine_near_dup_empty_result_typed():
    """A threshold above every pairwise similarity must return the
    TYPED empty frame, not crash on Ray's schema-less all-empty
    collect (regression: KeyError 'sim')."""
    import numpy as np
    import ray.data as rd
    from ocr_model_ray.functions.similarity import cosine_near_dup

    rng = np.random.RandomState(0)
    df = pd.DataFrame({
        "vec_id": range(50),
        "embedding": [rng.normal(size=16).astype("float32").tolist()
                      for _ in range(50)],
    })
    out = cosine_near_dup(rd.from_pandas(df).repartition(4),
                          threshold=0.9999)
    assert list(out.columns) == ["vec_a", "vec_b", "sim"]
    assert out.empty
    # both plans
    out = cosine_near_dup(rd.from_pandas(df).repartition(4),
                          threshold=0.9999, mode="bucketed")
    assert list(out.columns) == ["vec_a", "vec_b", "sim"] and out.empty


@pytest.mark.usefixtures("ray_session")
def test_similarity_and_salted_ops_empty_corpus_typed():
    """Zero-row corpora must yield typed empty results from the kNN
    family, label_stats and salted_group_count (same schema-less
    all-empty-collect class as the corpus-stats sweep)."""
    import numpy as np
    import ray.data as rd
    from ocr_model_ray.functions.joins import salted_group_count
    from ocr_model_ray.functions.similarity import (ivf_knn,
                                                    knn_bruteforce,
                                                    label_stats, lsh_knn)

    zero_vecs = rd.from_pandas(pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"),
         "embedding": pd.Series([], dtype="object"),
         "label": pd.Series([], dtype="int32")}))
    q = pd.DataFrame({"vec_id": [0],
                      "embedding": [np.ones(8, np.float32).tolist()]})
    for fn in (knn_bruteforce, lsh_knn, ivf_knn):
        out = fn(zero_vecs, q, k=3)
        assert list(out.columns) == ["query_id", "neighbor_id", "sim"]
        assert out.empty
    out = label_stats(zero_vecs)
    assert list(out.columns) == ["label", "n_vectors", "avg_norm"]

    zero_events = rd.from_pandas(pd.DataFrame(
        {"event_type": pd.Series([], dtype="object")}))
    out = salted_group_count(zero_events, "event_type")
    assert list(out.columns) == ["event_type", "count"] and out.empty


@pytest.mark.usefixtures("ray_session")
def test_bucketed_argmax_semantics():
    """Latest-per-key reduce: whole-row winner, deterministic ties via
    tiebreak, largest=False for min, null order values lose."""
    import ray.data as rd
    from ocr_model_ray.functions.bucketed import bucketed_argmax
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "ord": [1.0, 3.0, 3.0, 2.0, None, 5.0],
        "id": [10, 11, 12, 20, 21, 30],
        "payload": list("uvwxyz"),
    })
    out = (bucketed_argmax(rd.from_pandas(df), "k", "ord",
                           tiebreak=["id"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    # a: ord ties at 3.0 -> larger id (12) wins; b: null loses to 2.0
    assert out["id"].tolist() == [12, 20, 30]
    assert out["payload"].tolist() == ["w", "x", "z"]
    lo = (bucketed_argmax(rd.from_pandas(df), "k", "ord",
                          tiebreak=["id"], largest=False)
          .to_pandas().sort_values("k").reset_index(drop=True))
    # largest=False: min ord wins; ties -> MIN id (direction shared)
    assert lo["id"].tolist() == [10, 20, 30]


@pytest.mark.usefixtures("ray_session")
def test_bucketed_argmax_partitioning_independent():
    """The combiner prune must not change the winner across block
    layouts: 1 block == 8 blocks on a key-scattered frame."""
    import numpy as np
    import ray.data as rd
    from ocr_model_ray.functions.bucketed import bucketed_argmax
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 50, 500),
        "ord": rng.randint(0, 1000, 500),
        "id": np.arange(500),
    })
    a = (bucketed_argmax(rd.from_pandas(df), "k", "ord",
                         tiebreak=["id"])
         .to_pandas().sort_values("k").reset_index(drop=True))
    b = (bucketed_argmax(rd.from_pandas(df).repartition(8), "k", "ord",
                         tiebreak=["id"])
         .to_pandas().sort_values("k").reset_index(drop=True))
    assert (a[["k", "ord", "id"]].values
            == b[["k", "ord", "id"]].values).all()


def test_gopher_flags_rules():
    import pandas as pd

    from ocr_model_ray.functions.text_stats import gopher_flags_batch
    good = " ".join(["the and of to word123"] * 12)  # 60 words, stopwords
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [good,
                 "short doc",                      # fails r_count
                 " ".join(["####"] * 60),           # fails alpha+symbol+stop
                 None],                             # '' -> fails r_count
    })
    out = gopher_flags_batch(df)
    assert out["keep"].tolist() == [True, False, False, False]
    assert out.loc[1, "r_count"] == False  # noqa: E712
    assert out.loc[2, "r_alpha"] == False  # noqa: E712
    assert out.loc[2, "r_symbol"] == False  # noqa: E712
    assert out.loc[2, "r_stop"] == False  # noqa: E712
    assert out.loc[3, "n_words"] == 0
    # mean word len of good doc: (3+3+2+2+7)/5 = 3.4 -> passes
    assert abs(out.loc[0, "mean_word_len"] - 3.4) < 1e-12


def test_script_ratio_batch_planted_scripts():
    import duckdb
    import pyarrow as pa

    from ocr_model_ray.functions.text_stats import script_ratio_batch
    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3, 4], dtype="int64"),
        "text": ["Hello 123 world",
                 "Привет мир",          # Cyrillic + one space
                 "你好世界",              # 4 Han chars, no space
                 None,                   # null text -> 0 chars
                 ""]})                   # empty -> 0 chars
    out = script_ratio_batch(pa.Table.from_pandas(docs)).to_pandas()
    r = out.set_index("doc_id")
    assert r.loc[1, "n_cyrillic"] == 9 and r.loc[1, "n_space"] == 1
    assert r.loc[2, "n_han"] == 4 and r.loc[2, "n_latin"] == 0
    assert r.loc[2, "han_ratio"] == 1.0
    assert r.loc[3, "n_chars"] == 0 and pd.isna(r.loc[3, "latin_ratio"])
    assert r.loc[4, "n_chars"] == 0
    # bit-equality vs DuckDB's RE2 on the same frame
    con = duckdb.connect()
    con.register("documents", docs)
    import __ray_entry__ as em
    want = con.execute(em.oracle_sql()["docs_script_ratios"]).df()
    want = want.sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    for c in want.columns:
        g, w = got[c], want[c]
        both_na = g.isna() & w.isna()
        assert bool(((g == w) | both_na).all()), c


def test_split_leakage_planted(ray_session):
    """Planted cross-split leaks: exact dup of a heldout doc, a
    near-dup (one word changed in 12), a short exact dup with no
    3-grams (md5 path only), plus non-leaking controls."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ocr_model_ray.functions.decontam import split_leakage

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near = base.replace("zeta", "xi")        # 1 of 12 words differs
    df = pd.DataFrame({
        "doc_id": [10, 3, 20, 7, 30, 11, 40, 9],
        # held = doc_id % 10 == 0 (ids 10, 20, 30, 40). Plants:
        #   train 3  = exact dup of held 10 (jaccard 1.0 too)
        #   train 7  = `near`; vs held 40 (`near` with word 0 changed)
        #              only the first 3-gram differs: j = 9/11 ~ 0.818
        #              (vs held 10 it is only 7/13, below threshold)
        #   train 11 = short exact dup of held 30, no 3-grams at all
        #   train 9  = unrelated control, must not appear
        "text": [base, base,
                 "one two three four five", near,
                 "hi yo", "hi yo",
                 near.replace("alpha", "omega"), "totally unrelated words"],
    })
    out = split_leakage(rd.from_pandas(df), holdout_mod=10,
                        threshold=0.8, ngram=3)
    got = {int(r.doc_id): (bool(r.exact_leak),
                           None if pd.isna(r.max_jaccard)
                           else round(float(r.max_jaccard), 4))
           for r in out.itertuples()}
    assert 3 in got and got[3][0] is True and got[3][1] == 1.0
    assert 11 in got and got[11] == (True, None)     # no 3-grams
    assert 7 in got and got[7][0] is False and got[7][1] is not None \
        and 0.8 <= got[7][1] < 1.0
    assert 9 not in got                              # control clean
    # heldout docs are never emitted
    assert all(d % 10 != 0 for d in got)


def test_mojibake_planted_damage():
    """Planted double-encoded UTF-8: detector counts match DuckDB's
    RE2 on the same frame; repair round-trips the damage and leaves
    clean/irreparable text untouched."""
    import duckdb
    import pyarrow as pa

    from ocr_model_ray.functions.text_stats import (mojibake_batch,
                                                    repair_mojibake)
    cafe = "caf\u00c3\u00a9 cr\u00c3\u00a8me"      # 'cafe creme' damaged
    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
        "text": [cafe,
                 "perfectly clean ascii",
                 None,
                 "\u00c3 lone lead, no continuation"]})
    out = mojibake_batch(pa.Table.from_pandas(docs)).to_pandas()
    r = out.set_index("doc_id")
    assert r.loc[0, "n_mojibake"] == 2 and bool(r.loc[0, "mojibake"])
    assert r.loc[1, "n_mojibake"] == 0 and not bool(r.loc[1, "mojibake"])
    assert r.loc[2, "n_mojibake"] == 0
    assert r.loc[3, "n_mojibake"] == 0   # lead glyph alone is not damage

    con = duckdb.connect()
    con.register("documents", docs)
    import __ray_entry__ as em
    want = con.execute(em.oracle_sql()["docs_mojibake"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    for c in want.columns:
        g, w = got[c], want[c]
        assert bool(((g == w) | (g.isna() & w.isna())).all()), c

    fixed = repair_mojibake(docs["text"])
    assert fixed[0] == "caf\u00e9 cr\u00e8me"
    assert fixed[1] == docs["text"][1]
    assert fixed[3] == docs["text"][3]   # no signature -> untouched
