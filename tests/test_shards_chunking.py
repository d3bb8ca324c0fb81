"""Units for the training-output layout pair: global pseudo-shuffle
shard assignment (functions/shards.py) and sliding-window token
chunking (functions/chunking.py)."""

import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs(n: int, seed: int = 3) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    texts = [" ".join(f"w{rng.randint(40)}"
                      for _ in range(int(rng.randint(0, 150))))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64) * 7 + 1,
                         "text": texts})


# ---------------------------------------------------------------- shards

def _expected_assign(ids: np.ndarray, shard_size: int) -> pd.DataFrame:
    h = [hashlib.md5(str(int(v)).encode()).hexdigest() for v in ids]
    order = np.lexsort((ids, np.asarray(h, dtype=object)))
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = np.arange(len(ids), dtype=np.int64)
    return pd.DataFrame({"doc_id": ids, "rank": rank,
                         "shard": rank // shard_size,
                         "pos": rank % shard_size})


def test_shard_assign_plans_agree_and_match_reference(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.shards import global_shuffle_shards
    docs = _docs(311)
    want = _expected_assign(docs["doc_id"].to_numpy(), 16) \
        .sort_values("doc_id").reset_index(drop=True)
    for mode, bh in (("local", 3), ("distributed", 3),
                     ("distributed", 1)):
        got = (global_shuffle_shards(rd.from_pandas(docs), 16,
                                     bin_hex=bh, mode=mode)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True)[list(want.columns)])
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))


def test_shard_assign_partitioning_independent(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.shards import global_shuffle_shards
    docs = _docs(200, seed=9)
    outs = []
    for nb in (1, 7):
        ds = rd.from_pandas(docs).repartition(nb)
        outs.append(global_shuffle_shards(ds, 32, mode="distributed")
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_shard_assign_ranks_are_a_permutation(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.shards import global_shuffle_shards
    docs = _docs(97)
    out = global_shuffle_shards(rd.from_pandas(docs), 10,
                                mode="distributed").to_pandas()
    r = np.sort(out["rank"].to_numpy())
    assert np.array_equal(r, np.arange(97))
    # every shard but the last is exactly full
    sizes = out.groupby("shard").size()
    assert (sizes.iloc[:-1] == 10).all() and sizes.iloc[-1] == 7


def test_shard_assign_empty_and_validation(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.shards import global_shuffle_shards
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object")}))
    for mode in ("local", "distributed"):
        out = global_shuffle_shards(empty, 8, mode=mode).to_pandas()
        # Ray's empty-Dataset round trip may drop the schema (the
        # repo-wide convention: entry wrappers re-type empties)
        assert out.empty
        if len(out.columns):
            assert list(out.columns) == ["doc_id", "rank",
                                         "shard", "pos"]
    with pytest.raises(ValueError):
        global_shuffle_shards(empty, 0)
    with pytest.raises(ValueError):
        global_shuffle_shards(empty, 8, bin_hex=0)


# -------------------------------------------------------------- chunking

def test_chunk_windows_hand_computed(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import chunk_windows
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["a b c d e f g", "x", ""]})
    out = (chunk_windows(rd.from_pandas(docs), chunk_size=4, stride=2)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    # doc 1: 7 tokens -> chunks [0:4) [2:6) [4:7)
    assert out["chunk_text"].tolist() == \
        ["a b c d", "c d e f", "e f g", "x"]
    assert out["n_tokens"].tolist() == [4, 4, 3, 1]
    assert out["chunk_id"].tolist() == [0, 1, 2, 0]


def test_chunk_windows_exact_tiling_and_coverage(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import chunk_windows
    docs = _docs(120, seed=5)
    out = chunk_windows(rd.from_pandas(docs), chunk_size=16,
                        stride=16).to_pandas()
    # stride == chunk_size tiles: rebuilding each doc from its chunks
    # in order reproduces the normalized token stream exactly
    rebuilt = (out.sort_values(["doc_id", "chunk_id"])
               .groupby("doc_id")["chunk_text"]
               .agg(" ".join))
    want = {int(r.doc_id): " ".join(r.text.split())
            for r in docs.itertuples() if r.text.split()}
    assert dict(rebuilt) == want


def test_chunk_windows_boundary_counts(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import chunk_windows
    # n == chunk_size -> exactly one chunk; n == chunk_size + 1 -> two
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": [" ".join(["t"] * 8), " ".join(["t"] * 9)]})
    out = chunk_windows(rd.from_pandas(docs), chunk_size=8,
                        stride=3).to_pandas()
    counts = out.groupby("doc_id").size()
    assert counts[1] == 1 and counts[2] == 2


def test_chunk_windows_empty(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import chunk_windows
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object")}))
    out = chunk_windows(empty, 4, 2).to_pandas()
    assert out.empty
    with pytest.raises(ValueError):
        chunk_windows(empty, 0, 1)


# ------------------------------------------------- stratified split

def test_stratified_quota_split_exact_quota(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.text_stats import stratified_quota_split
    rng = np.random.RandomState(2)
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], 300),
        "source": rng.choice(["a", "b"], 300)})
    out = stratified_quota_split(rd.from_pandas(docs),
                                 strata=["lang", "source"],
                                 quota=4).to_pandas()
    assert len(out) == 300
    g = out[out["split"] == "eval"].groupby(["lang", "source"]).size()
    # every stratum holds >> 4 docs, so each gets exactly 4 eval rows
    assert (g == 4).all() and len(g) == 6
    # deterministic across partitionings
    out2 = stratified_quota_split(
        rd.from_pandas(docs).repartition(7),
        strata=["lang", "source"], quota=4).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stratified_quota_split_small_stratum(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.text_stats import stratified_quota_split
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "lang": ["en", "en", "en", "zz", "zz"],
        "source": ["a"] * 5})
    out = stratified_quota_split(rd.from_pandas(docs),
                                 strata=["lang", "source"],
                                 quota=10).to_pandas()
    # quota exceeds stratum size: everything is eval
    assert (out["split"] == "eval").all()


# ------------------------------------------------- winnow clusters

def test_winnow_dedup_clusters_groups_quote_chain(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.winnow import winnow_dedup_clusters
    core = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": [core + " alpha", core + " beta", "zeta " + core,
                 "completely different content with no overlap xyzw"]})
    out = winnow_dedup_clusters(rd.from_pandas(docs), min_shared=2)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got.get(1) == 1 and got.get(2) == 1 and got.get(3) == 1
    assert 4 not in got  # no qualifying pair -> absent


def test_chunk_windows_char_spans_slice_back(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import chunk_windows
    docs = _docs(60, seed=11)
    out = chunk_windows(rd.from_pandas(docs), chunk_size=7,
                        stride=4).to_pandas()
    norm = {int(r.doc_id): " ".join(r.text.split())
            for r in docs.itertuples()}
    for r in out.itertuples():
        assert norm[int(r.doc_id)][int(r.char_start):int(r.char_end)] \
            == r.chunk_text


# ---------------------------------------------------------------- CDC

def test_cdc_chunks_cover_and_reconstruct(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import cdc_chunks
    docs = _docs(80, seed=13)
    out = cdc_chunks(rd.from_pandas(docs)).to_pandas()
    rebuilt = (out.sort_values(["doc_id", "chunk_id"])
               .groupby("doc_id")["chunk_text"].agg("".join))
    want = {int(r.doc_id): r.text for r in docs.itertuples()
            if r.text}
    assert dict(rebuilt) == want
    # offsets are exact substr coordinates
    texts = {int(r.doc_id): r.text for r in docs.itertuples()}
    for r in out.itertuples():
        t = texts[int(r.doc_id)]
        assert t[int(r.char_start) - 1:
                 int(r.char_start) - 1 + int(r.n_chars)] \
            == r.chunk_text


def test_cdc_chunks_insertion_resilient(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import cdc_chunks
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen green bottles hang quietly on the wall "
            "and rain falls softly over the ancient harbour town "
            "where every sailor knows the old stories by heart")
    edited = base[:10] + "Z" + base[10:]   # one char inserted early
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": [base, edited]})
    out = cdc_chunks(rd.from_pandas(docs)).to_pandas()
    a = out[out["doc_id"] == 1]["chunk_text"].tolist()
    b = out[out["doc_id"] == 2]["chunk_text"].tolist()
    assert len(a) >= 3  # the corpus is long enough to actually chunk
    # content-defined property: all chunks after the edit region are
    # IDENTICAL text (only the edited chunk and at most its immediate
    # neighbour differ)
    from collections import Counter
    diff = Counter(a) - Counter(b)
    assert sum(diff.values()) <= 2
    # a fixed-window chunker would shift EVERY chunk after the edit


def test_cdc_chunks_short_doc_single_chunk(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import cdc_chunks
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["abc", ""]})
    out = cdc_chunks(rd.from_pandas(docs)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["doc_id"] == 1 and r["chunk_text"] == "abc" \
        and r["char_start"] == 1 and r["n_chars"] == 3


def test_cdc_dup_share_planted(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import cdc_dup_share
    shared = ("copy this exact long paragraph of shared text that is "
              "repeated across documents so its chunks collide "
              "perfectly in the hash space every single time")
    uniq = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten"]
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [shared, shared, uniq[0] + " " + uniq[1]]})
    out = cdc_dup_share(rd.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # identical docs: every chunk duplicated -> share 1.0
    assert out.loc[0, "dup_share"] == 1.0
    assert out.loc[1, "dup_share"] == 1.0
    # unique doc shares nothing
    assert out.loc[2, "dup_share"] == 0.0
    assert out.loc[2, "dup_chunks"] == 0


def test_cdc_snapshot_delta_properties(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.chunking import cdc_snapshot_delta
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen green bottles hang quietly on the wall "
            "and rain falls softly over the ancient harbour town")
    pages = pd.DataFrame({
        "url": ["u1", "u1", "u2", "u2", "u3", "u4", "u4", "u5"],
        "snap": np.array([1, 2, 1, 2, 1, 1, 2, 2], dtype=np.int64),
        "text": [base, base,                       # unchanged
                 base, base[:10] + "Z" + base[10:],  # edited
                 base,                             # snap 2 missing
                 "", base,                         # snap 1 EMPTY text
                 base]})                           # snap 1 missing
    out = cdc_snapshot_delta(rd.from_pandas(pages)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    # u3 absent (no snap-2 chunks); u4/u5 report with kept=0 — the
    # SQL twin's s2 LEFT JOIN s1 semantics (round-4 advice: empty or
    # missing snap 1 are indistinguishable at the chunk-row level)
    assert out["url"].tolist() == ["u1", "u2", "u4", "u5"]
    u1 = out.iloc[0]
    assert u1["kept_share"] == 1.0 \
        and u1["kept_chunks"] == u1["n_chunks"]
    u2 = out.iloc[1]
    # local edit: most chunks survive, but not all
    assert 0.0 < u2["kept_share"] < 1.0
    assert u2["n_chunks"] - u2["kept_chunks"] <= 2
    for row in (out.iloc[2], out.iloc[3]):
        assert row["kept_chunks"] == 0 and row["kept_chars"] == 0
        assert row["kept_share"] == 0.0 and row["n_chunks"] > 0
