"""Distributed BPE tokenizer training (functions/bpe.py)."""

import numpy as np
import pandas as pd
import pytest

from ocr_model_ray.functions.bpe import bpe_pair_counts, bpe_train


def _corpus(n_docs=150, seed=3):
    rng = np.random.RandomState(seed)
    vocab = ["banana", "bandana", "analog", "the", "then", "there",
             "cat", "catalog", "aaaa", "réservé", "ξένος", "a"]
    return pd.DataFrame({
        "doc_id": np.arange(n_docs),
        "text": [" ".join(rng.choice(vocab, 25)) for _ in range(n_docs)]})


def _ref_bpe(word_counts: dict, k: int):
    """Independent pure-python greedy BPE over a word-count dict."""
    segs = {w: tuple(w) for w in word_counts}
    merges = []
    for r in range(k):
        pc = {}
        for w, c in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r, a, b, n))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return merges


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_local_equals_distributed_equals_reference():
    import ray.data as rd
    df = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    loc = bpe_train(ds, num_merges=10, mode="local")
    dist = bpe_train(ds, num_merges=10, mode="distributed")
    pd.testing.assert_frame_equal(loc, dist)

    counts: dict = {}
    for t in df["text"]:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    ref = _ref_bpe(counts, 10)
    assert list(loc.itertuples(index=False, name=None)) == ref


@pytest.mark.usefixtures("ray_session")
def test_bpe_greedy_run_semantics():
    """'aaaa' must merge left-to-right greedily: (a,a) -> (aa, aa),
    never (aa, a, a) — the double-separator replace guarantee."""
    import ray.data as rd
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["aaaa", "aaaa", "aaaa"]}))
    for mode in ("local", "distributed"):
        m = bpe_train(ds, num_merges=3, mode=mode)
        got = list(m.itertuples(index=False, name=None))
        # 3 x aaaa: pairs (a,a) x3 per word = 9; after merge -> aa aa,
        # pair (aa,aa) = 3; after that one symbol per word: stop.
        assert got == [(0, "a", "a", 9), (1, "aa", "aa", 3)], (mode, got)


@pytest.mark.usefixtures("ray_session")
def test_bpe_pair_counts_matches_duckdb_distributed():
    import duckdb
    import ray.data as rd
    df = _corpus(n_docs=80, seed=9)
    df.loc[0, "text"] = "tab\tsep  double réservé\nnewline "
    ds = rd.from_pandas(df).repartition(3)
    got = bpe_pair_counts(ds, k=25, mode="distributed")
    loc = bpe_pair_counts(ds, k=25, mode="local")
    pd.testing.assert_frame_equal(got, loc)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute("""
        WITH words AS (
            SELECT w, CAST(count(*) AS BIGINT) AS wn
            FROM (SELECT unnest(regexp_split_to_array(text,
                         '[ \\t\\n\\r\\f\\v]+')) AS w FROM documents)
            WHERE w <> '' GROUP BY w),
        sym0 AS (
            SELECT string_split(rtrim(regexp_replace(
                       w, '(.)', '\\1  ', 'g'), ' '), '  ') AS l, wn
            FROM words)
        SELECT l[i] AS a, l[i+1] AS b, CAST(sum(wn) AS BIGINT) AS n
        FROM sym0, LATERAL unnest(generate_series(
                       1, greatest(len(l) - 1, 0))) AS t(i)
        GROUP BY a, b ORDER BY n DESC, a ASC, b ASC LIMIT 25""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_bpe_empty_and_degenerate():
    import ray.data as rd
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object")}))
    for mode in ("local", "distributed"):
        m = bpe_train(empty, num_merges=3, mode=mode)
        assert list(m.columns) == ["rank", "lhs", "rhs", "n"]
        assert m.empty
        p = bpe_pair_counts(empty, k=5, mode=mode)
        assert list(p.columns) == ["a", "b", "n"] and p.empty
    # single-char words only: zero pairs, zero merges
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c", "a a"]}))
    for mode in ("local", "distributed"):
        assert bpe_train(ds, num_merges=2, mode=mode).empty
        assert bpe_pair_counts(ds, k=5, mode=mode).empty


@pytest.mark.usefixtures("ray_session")
def test_bpe_partitioning_independence():
    import ray.data as rd
    df = _corpus(n_docs=90, seed=5)
    a = bpe_train(rd.from_pandas(df).repartition(1), num_merges=6,
                  mode="distributed")
    b = bpe_train(rd.from_pandas(df).repartition(7), num_merges=6,
                  mode="distributed")
    pd.testing.assert_frame_equal(a, b)
