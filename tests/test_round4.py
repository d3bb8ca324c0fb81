"""Round-4 additions: distributed near-dup edge plumbing (verdict #1),
threshold-derived LSH banding (#10), the jaccard max_df skew guard
(#5), and the ADVICE.md robustness fixes (typed empties, shard-id
collisions, peer-group percent_rank)."""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# threshold-derived LSH banding
# ---------------------------------------------------------------------------
def test_lsh_params_derivation():
    from ocr_model_ray.functions.dedup_algos import NUM_PERM, _lsh_params

    # the frozen default layout survives at the default threshold
    assert _lsh_params(0.8) == 16
    # a low threshold gets MORE bands (shorter rows) instead of
    # silently missing pairs
    assert _lsh_params(0.4) == 64
    # recall at the requested threshold meets the target at the chosen
    # layout
    for t in (0.4, 0.6, 0.8):
        bands = _lsh_params(t)
        rows = NUM_PERM // bands
        recall = 1.0 - (1.0 - t ** rows) ** bands
        assert recall >= 0.9, (t, bands, recall)


@pytest.mark.usefixtures("ray_session")
def test_low_threshold_planted_pair_recall():
    """A planted pair at jaccard ~0.43 must be FOUND at threshold=0.4
    (64x2 banding collides with prob ~1-1.6e-6) and correctly absent
    at threshold=0.8 — in both plans."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import near_dup_pairs

    words_a = [f"w{i}" for i in range(40)]
    words_b = words_a[:25] + [f"v{i}" for i in range(25, 40)]
    rows = [{"doc_id": 1, "text": " ".join(words_a)},
            {"doc_id": 2, "text": " ".join(words_b)}]
    rows += [{"doc_id": 10 + i,
              "text": " ".join(f"u{i}x{j}" for j in range(40))}
             for i in range(20)]
    ds = rd.from_pandas(pd.DataFrame(rows))  # no metadata -> distributed

    for mode in ("local", "distributed"):
        low = near_dup_pairs(ds, threshold=0.4, mode=mode)
        got = set(zip(low["doc_a"], low["doc_b"]))
        assert (1, 2) in got, (mode, got)
        j = float(low.set_index(["doc_a", "doc_b"]).loc[(1, 2), "jaccard"])
        assert 0.4 <= j < 0.8
        high = near_dup_pairs(ds, threshold=0.8, mode=mode)
        assert (1, 2) not in set(zip(high["doc_a"], high["doc_b"]))


# ---------------------------------------------------------------------------
# distributed near-dup edge plumbing
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_near_dup_pairs_ds_is_dataset_end_to_end():
    """The distributed plan returns a Dataset whose collected content
    equals the local plan, and exact-dup members never appear as
    candidate endpoints (the ch-collapse invariant the plan relies on
    instead of a member anti-join)."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import (near_dup_pairs,
                                                     near_dup_pairs_ds)

    base = " ".join(f"common{i}" for i in range(60))
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base},           # exact dup of 1
            {"doc_id": 3, "text": base},           # exact dup of 1
            {"doc_id": 4, "text": base + " tail extra words here"}]
    rows += [{"doc_id": 50 + i,
              "text": " ".join(f"z{i}q{j}" for j in range(50))}
             for i in range(10)]
    ds = rd.from_pandas(pd.DataFrame(rows))

    out_ds = near_dup_pairs_ds(ds, threshold=0.8)
    assert isinstance(out_ds, rd.Dataset)
    got = (out_ds.to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    local = near_dup_pairs(ds, threshold=0.8, mode="local")
    pd.testing.assert_frame_equal(
        got.astype({"doc_a": "int64", "doc_b": "int64"}), local)

    # members 2 and 3 appear ONLY as exact (rep, member, 1.0) rows
    members = {2, 3}
    nonexact = got[got["jaccard"] < 1.0]
    assert not (set(nonexact["doc_a"]) | set(nonexact["doc_b"])) & members
    exact_rows = set(zip(got[got["jaccard"] == 1.0]["doc_a"],
                         got[got["jaccard"] == 1.0]["doc_b"]))
    assert {(1, 2), (1, 3)} <= exact_rows


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_ds_equals_pandas():
    """Dataset-native connected components == the pandas fixpoint on a
    multi-component graph with a long chain (diameter > 1 round)."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import (label_propagation_ds,
                                                     min_label_propagation)

    pairs = pd.DataFrame({
        "doc_a": [1, 2, 3, 4,   10, 11,   20],
        "doc_b": [2, 3, 4, 5,   11, 12,   21],
        "jaccard": 1.0})
    want = min_label_propagation(pairs)
    got = (label_propagation_ds(rd.from_pandas(pairs)).to_pandas()
           .sort_values("node").reset_index(drop=True)
           .astype({"node": "int64", "label": "int64"}))
    got = pd.DataFrame({"doc_id": got["node"], "cluster_id": got["label"]})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_ds_empty():
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import label_propagation_ds

    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    out = label_propagation_ds(rd.from_pandas(empty)).to_pandas()
    assert out.empty


# ---------------------------------------------------------------------------
# jaccard max_df skew guard
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_jaccard_max_df_caps_stop_gram_and_logs(caplog):
    """1k docs sharing one stop-gram: with max_df the posting-list
    expansion skips the hot gram (k^2 guard), logs the drop, and emits
    no false pairs; without the cap the same corpus would expand
    ~500k pair rows for that gram alone."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import jaccard_similarity_join

    rows = [{"doc_id": i,
             "text": "the common header " +
                     " ".join(f"d{i}w{j}" for j in range(12))}
            for i in range(1000)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    with caplog.at_level(logging.WARNING, logger="ocr_model_ray.dedup"):
        out = jaccard_similarity_join(ds, threshold=0.5, mode="local",
                                      max_df=10)
    assert out.empty
    assert any("df > 10" in r.message for r in caplog.records)


@pytest.mark.usefixtures("ray_session")
def test_jaccard_max_df_disabled_matches_exact():
    """Cap high enough to never engage == cap disabled (exact)."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import jaccard_similarity_join

    rows = [{"doc_id": 1, "text": "a b c d e f g h"},
            {"doc_id": 2, "text": "a b c d e f g x"},
            {"doc_id": 3, "text": "p q r s t u v w"}]
    ds = rd.from_pandas(pd.DataFrame(rows))
    exact = jaccard_similarity_join(ds, threshold=0.3, mode="local")
    capped = jaccard_similarity_join(ds, threshold=0.3, mode="local",
                                     max_df=100)
    pd.testing.assert_frame_equal(exact, capped)
    assert set(zip(exact["doc_a"], exact["doc_b"])) == {(1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_dedup_corpus_keeps_representatives():
    """dedup_corpus keeps exactly one min-id doc per cluster plus all
    unclustered docs, in both plans."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import dedup_corpus

    base = " ".join(f"common{i}" for i in range(60))
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base},
            {"doc_id": 3, "text": base + " tail extra words here"}]
    rows += [{"doc_id": 10 + i,
              "text": " ".join(f"z{i}q{j}" for j in range(50))}
             for i in range(5)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    for mode in ("local", "distributed"):
        kept = sorted(dedup_corpus(ds, threshold=0.8, mode=mode)
                      .to_pandas()["doc_id"])
        assert kept == [1] + [10 + i for i in range(5)], (mode, kept)


# ---------------------------------------------------------------------------
# bloom decontamination plan
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_decontamination_bloom_plan_equals_exact():
    """Forcing the bloom pre-screen (threshold=0) yields BIT-identical
    flags to the exact broadcast plan — false positives die in the
    driver-side exact rescreen — and the planted leak passes through
    the bloom path."""
    import ray.data as rd
    from ocr_model_ray.functions.decontam import contamination, ngram_set

    leak = "the quick brown fox jumps over the lazy dog tonight"
    evals = [f"benchmark question: {leak} answer choice A",
             "second benchmark item about celestial navigation with "
             "sextants and chronometers at sea during long voyages"]
    grams = ngram_set(evals, n=8)
    corpus = pd.DataFrame({
        "doc_id": list(range(1, 41)),
        "text": [f"web page copying {leak} verbatim here"] +
                [None] +
                [f"clean page {i} " +
                 " ".join(f"tok{i}x{j}" for j in range(30))
                 for i in range(38)]})
    ds = rd.from_pandas(corpus)
    exact = (contamination(ds, grams, n=8).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    bloom = (contamination(ds, grams, n=8, bloom_threshold=0).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(exact, bloom)
    assert bloom.loc[0, "contaminated"]
    assert bloom.loc[0, "n_contaminated"] == len(leak.split()) - 8 + 1
    assert not bloom["contaminated"].iloc[1:].any()


# ---------------------------------------------------------------------------
# packing plans
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_sequence_pack_local_equals_distributed():
    """The new small-input packing plan (single tokenize pass + driver
    cumsum) is bit-identical to the two-pass distributed prefix sum,
    for both the global and the per-group variant."""
    import ray.data as rd
    from ocr_model_ray.functions.packing import (grouped_sequence_pack,
                                                 sequence_pack)

    rng = np.random.RandomState(5)
    rows = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "source": [f"s{i % 3}" for i in range(500)],
        "text": [" ".join(f"w{j}" for j in range(rng.randint(1, 40)))
                 for _ in range(500)]})
    ds = rd.from_pandas(rows)

    outs = {}
    for mode in ("local", "distributed"):
        outs[mode] = (sequence_pack(ds, seq_len=64, mode=mode)
                      .to_pandas().sort_values("doc_id")
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["local"], outs["distributed"])

    gouts = {}
    for mode in ("local", "distributed"):
        gouts[mode] = (grouped_sequence_pack(ds, group_col="source",
                                             seq_len=64, mode=mode)
                       .to_pandas().sort_values(["source", "doc_id"])
                       .reset_index(drop=True))
    pd.testing.assert_frame_equal(gouts["local"], gouts["distributed"])


# ---------------------------------------------------------------------------
# typed-empty guards (ADVICE.md)
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_empty_corpus():
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import exact_dedup

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    # contract: no KeyError on the zero-row corpus, empty result.
    # (Ray's to_pandas drops the schema of ANY zero-row dataset, so
    # collect sites guard on .empty per the repo-wide convention.)
    out = exact_dedup(rd.from_pandas(empty), mode="local").to_pandas()
    assert out.empty
    if len(out.columns):
        assert list(out.columns) == ["h", "keep_id", "n_dupes"]


@pytest.mark.usefixtures("ray_session")
def test_interval_count_join_empty_left():
    import ray.data as rd
    from ocr_model_ray.functions.interval import interval_count_join

    left = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                         "ts_lo": pd.Series([], dtype="int64")})
    right = pd.DataFrame({"ts": pd.Series([1, 2, 3], dtype="int64")})
    for mode in ("local", "distributed"):
        out = interval_count_join(
            rd.from_pandas(left), rd.from_pandas(right),
            left_key="event_id", left_time="ts_lo", right_time="ts",
            window_us=60_000_000, mode=mode).to_pandas()
        assert out.empty
        if not out.empty or len(out.columns):
            assert list(out.columns) == ["event_id", "n_matches"]


@pytest.mark.usefixtures("ray_session")
def test_q16_no_matching_parts_typed_empty():
    from ocr_model_ray.pipelines.relational import q16_supplier_part_counts

    out = q16_supplier_part_counts(SF, sizes=(999,))
    assert out.empty
    assert list(out.columns) == ["p_brand", "p_type", "p_size",
                                 "supplier_cnt"]


@pytest.mark.usefixtures("ray_session")
def test_q13_q21_prior_clicks_zero_qualifying(tmp_path):
    """Synthetic tables where the filters exclude everything: q13 rolls
    every customer into the k=0 bucket, q21 and the interval query
    return typed empties instead of KeyError."""
    from ocr_model_ray.pipelines.relational import (
        events_prior_clicks, q13_customer_distribution,
        q21_waiting_supplier)

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT"] * 3)}),
        os.path.join(sf, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        os.path.join(sf, "customer.parquet"))
    out13 = q13_customer_distribution(sf)
    assert out13.to_dict("records") == [{"c_count": 0, "custdist": 4}]

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10], pa.int64()),
        "l_returnflag": pa.array(["N", "N", "N"])}),
        os.path.join(sf, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11], pa.int64()),
        "s_name": pa.array(["s10", "s11"])}),
        os.path.join(sf, "supplier.parquet"))
    out21 = q21_waiting_supplier(sf)
    assert out21.empty
    assert list(out21.columns) == ["s_name", "numwait"]

    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "ts": pa.array([1_000_000, 2_000_000],
                       pa.timestamp("us"))}),
        os.path.join(sf, "events.parquet"))
    outpc = events_prior_clicks(sf)
    assert outpc.empty
    assert list(outpc.columns) == ["event_id", "n_clicks"]


# ---------------------------------------------------------------------------
# cross-run dedup index
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_dedup_ingest_incremental_equals_oneshot(tmp_path):
    """Two sequential ingests produce exactly the keep-set a one-shot
    exact_dedup over the combined corpus would; the second ingest
    never sees first-ingest texts as fresh."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import exact_dedup
    from ocr_model_ray.state.dedup_index import dedup_ingest, index_stats

    def doc(i, text):
        return {"doc_id": i, "text": text}

    first = pd.DataFrame([doc(1, "alpha beta gamma"),
                          doc(2, "alpha beta gamma"),      # in-run dup
                          doc(3, "delta epsilon zeta")])
    second = pd.DataFrame([doc(10, "alpha beta gamma"),    # old text
                           doc(11, "eta theta iota"),      # fresh
                           doc(12, "eta theta iota"),      # in-run dup
                           doc(13, "delta epsilon zeta")])  # old text
    idx = str(tmp_path / "index")
    f1 = (dedup_ingest(rd.from_pandas(first), idx, run_id="r1")
          .to_pandas())
    assert sorted(f1["doc_id"]) == [1, 3]
    f2 = (dedup_ingest(rd.from_pandas(second), idx, run_id="r2")
          .to_pandas())
    assert sorted(f2["doc_id"]) == [11]

    # one-shot reference over the combined corpus
    both = pd.concat([first, second], ignore_index=True)
    ref = exact_dedup(rd.from_pandas(both), mode="local").to_pandas()
    assert sorted(pd.concat([f1, f2])["doc_id"]) == \
        sorted(ref["keep_id"])

    stats = index_stats(idx)
    assert stats["total_hashes"] == 3
    assert stats["runs"] == {"r1": 2, "r2": 1}


@pytest.mark.usefixtures("ray_session")
def test_dedup_ingest_rerun_same_run_id_idempotent(tmp_path):
    """Re-running a (failed) ingest with the SAME run_id returns the
    same fresh set and leaves the index unchanged — its own prior
    parts are excluded from the 'seen' read and overwritten."""
    import ray.data as rd
    from ocr_model_ray.state.dedup_index import dedup_ingest, index_stats

    docs = pd.DataFrame([{"doc_id": 1, "text": "aa bb cc"},
                         {"doc_id": 2, "text": "dd ee ff"}])
    idx = str(tmp_path / "index")
    a = dedup_ingest(rd.from_pandas(docs), idx, run_id="r1").to_pandas()
    b = dedup_ingest(rd.from_pandas(docs), idx, run_id="r1").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    assert index_stats(idx)["total_hashes"] == 2


@pytest.mark.usefixtures("ray_session")
def test_dedup_index_compaction_preserves_semantics(tmp_path):
    """Compacting the index merges parts per bucket without changing
    what a later ingest sees as already-ingested."""
    import ray.data as rd
    from ocr_model_ray.state.dedup_index import (compact_index,
                                                 dedup_ingest,
                                                 index_stats)

    idx = str(tmp_path / "index")
    d1 = pd.DataFrame([{"doc_id": 1, "text": "one two three"}])
    d2 = pd.DataFrame([{"doc_id": 2, "text": "four five six"}])
    dedup_ingest(rd.from_pandas(d1), idx, run_id="r1").materialize()
    dedup_ingest(rd.from_pandas(d2), idx, run_id="r2").materialize()
    before = index_stats(idx)["total_hashes"]
    rec = compact_index(idx)
    assert rec["parts_after"] <= rec["parts_before"]
    assert index_stats(idx)["total_hashes"] == before == 2

    d3 = pd.DataFrame([{"doc_id": 3, "text": "one two three"},   # old
                       {"doc_id": 4, "text": "seven eight"}])    # new
    f3 = (dedup_ingest(rd.from_pandas(d3), idx, run_id="r3")
          .to_pandas())
    assert sorted(f3["doc_id"]) == [4]


# ---------------------------------------------------------------------------
# shard identity (ADVICE.md medium)
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_sharded_same_basename_different_dirs(t1_pages_dir, tmp_path):
    """Two input shards with the SAME file name in different
    directories (common crawl layout) must be two distinct partitions
    — the round-3 basename-crc32 id silently skipped the second."""
    import shutil

    from ocr_model_ray.pipelines.checkpoint import run_sharded

    src = sorted(os.path.join(t1_pages_dir, f)
                 for f in os.listdir(t1_pages_dir)
                 if f.endswith(".parquet"))[:2]
    d1 = tmp_path / "2024-01"
    d2 = tmp_path / "2024-02"
    d1.mkdir()
    d2.mkdir()
    shutil.copy(src[0], d1 / "part-0.parquet")
    shutil.copy(src[1], d2 / "part-0.parquet")

    out = str(tmp_path / "out")
    rec = run_sharded([str(d1 / "part-0.parquet"),
                       str(d2 / "part-0.parquet")], out)
    assert len(rec["partitions_written"]) == 2
    assert len(set(rec["partitions_written"])) == 2
    assert sorted(rec["input_files_processed"]) == sorted(
        [str(d1 / "part-0.parquet"), str(d2 / "part-0.parquet")])


# ---------------------------------------------------------------------------
# peer-group percent_rank (ADVICE.md low)
# ---------------------------------------------------------------------------
@pytest.mark.usefixtures("ray_session")
def test_percent_rank_ties_match_sql():
    """With tied order keys, order_cols-aware percent_rank assigns
    peer-group ranks exactly like SQL PERCENT_RANK (DuckDB oracle)."""
    import duckdb
    import ray.data as rd
    from ocr_model_ray.functions.window import (hash_partitioned_window,
                                                percent_rank_kernel)

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, 2],
        "v": [10, 10, 20, 30, 5, 5, 5],
        "rid": [0, 1, 2, 3, 4, 5, 6]})
    got = hash_partitioned_window(
        rd.from_pandas(df), "k", ["v"],
        percent_rank_kernel(["rid"], order_cols=["v"]),
    ).to_pandas().sort_values("rid").reset_index(drop=True)

    want = duckdb.sql("""
        SELECT rid, PERCENT_RANK() OVER (PARTITION BY k ORDER BY v)
               AS percent_rank
        FROM df ORDER BY rid""").df()
    pd.testing.assert_frame_equal(
        got.astype({"rid": "int64"}),
        want.astype({"rid": "int64"}))


# ---------------------------------------------------------------------------
# HTML <title> extraction (frozen byte-regex spec + DuckDB escape)
# ---------------------------------------------------------------------------
def test_duckdb_escape_matches_duckdb_blob_cast():
    """Pin the frozen escape table against DuckDB itself over every
    single-byte blob plus multibyte/edge payloads."""
    import duckdb
    from ocr_model_ray.stages.derive import duckdb_escape
    con = duckdb.connect()
    payloads = [bytes([b]) for b in range(256)]
    payloads += [b"", "Hi für".encode("utf-8"), b'a"b\'c\\d',
                 b"\xff\xfe invalid \xc3", b"tab\there\nline"]
    for p in payloads:
        got = con.execute("SELECT TRY_CAST(? ::BLOB AS VARCHAR)",
                          [p]).fetchone()[0]
        assert duckdb_escape(p) == (got or ""), p


def test_html_title_batch_spec():
    import pyarrow as pa
    from ocr_model_ray.stages.derive import html_title_batch
    rows = {
        # strict '<' prefix; case-insensitive tag; title = bytes to
        # the next '<'; escape transports non-ASCII exactly
        b"<html><head><TiTLE>Caf\xc3\xa9 life</title>": "Caf\\xC3\\xA9 life",
        b"<html>no title here</html>": "",
        b"<x><title></title>": "",
        b" <html><title>lstripped is NOT html</title>": None,  # dropped
        b"plain text": None,
        b"": None,
        b"<title>first</title><title>second</title>": "first",
        # encoding-agnostic: latin-1 bytes still yield exact title bytes
        b"<p><title>caf\xe9</title>": "caf\\xE9",
        # truncated multibyte inside the title survives
        b"<title>f\xc3</title>x": "f\\xC3",
    }
    t = pa.table({"url": [f"u{i}" for i in range(len(rows))],
                  "html": list(rows.keys())})
    out = html_title_batch(t).to_pydict()
    want = {f"u{i}": v for i, v in enumerate(rows.values())
            if v is not None}
    assert dict(zip(out["url"], out["title"])) == want


def test_html_title_batch_null_and_chunked():
    import pyarrow as pa
    from ocr_model_ray.stages.derive import html_title_batch
    a = pa.table({"url": ["a", "b"],
                  "html": pa.array([None, b"<title>x</title>"],
                                   pa.binary())})
    out = html_title_batch(a).to_pydict()
    assert out == {"url": ["b"], "title": ["x"]}
    # chunked input
    c = pa.Table.from_batches([
        pa.record_batch({"url": pa.array(["a"]),
                         "html": pa.array([b"<title>one</title>"])}),
        pa.record_batch({"url": pa.array(["b"]),
                         "html": pa.array([b"nope"])})])
    out = html_title_batch(c).to_pydict()
    assert out == {"url": ["a"], "title": ["one"]}
