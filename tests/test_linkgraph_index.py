"""Persistent link-graph index: cross-run accumulation, idempotent
retries, torn-tmp tolerance, and the double-count-proof compaction
manifest protocol."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_model_ray.state.linkgraph_index import (
    _bucket_dir, compact_linkgraph, linkgraph_ingest, read_linkgraph)


def _edges(run: int) -> pd.DataFrame:
    # run 0 and run 1 share the (a,b) pair; each adds a private pair
    base = [("a", "b")] * 3 + [(f"r{run}", "x")] * 2
    return pd.DataFrame(base, columns=["src_host", "dst_host"])


def _read_sorted(index_dir: str) -> pd.DataFrame:
    return (read_linkgraph(index_dir).to_pandas()
            .sort_values(["src_host", "dst_host"])
            .reset_index(drop=True))


def test_ingest_accumulates_and_merges(ray_session, tmp_path):
    idx = str(tmp_path / "lg")
    s0 = linkgraph_ingest(rd.from_pandas(_edges(0)), idx, "run0")
    s1 = linkgraph_ingest(rd.from_pandas(_edges(1)), idx, "run1")
    assert s0["edge_rows"] == 5 and s1["edge_rows"] == 5
    out = _read_sorted(idx)
    want = pd.DataFrame({"src_host": ["a", "r0", "r1"],
                         "dst_host": ["b", "x", "x"],
                         "n": [6, 2, 2]})
    pd.testing.assert_frame_equal(out.astype({"n": "int64"}), want)


def test_ingest_retry_same_run_id_idempotent(ray_session, tmp_path):
    idx = str(tmp_path / "lg")
    linkgraph_ingest(rd.from_pandas(_edges(0)), idx, "run0")
    before = _read_sorted(idx)
    linkgraph_ingest(rd.from_pandas(_edges(0)), idx, "run0")  # retry
    pd.testing.assert_frame_equal(_read_sorted(idx), before)


def test_torn_tmp_ignored(ray_session, tmp_path):
    idx = str(tmp_path / "lg")
    linkgraph_ingest(rd.from_pandas(_edges(0)), idx, "run0")
    before = _read_sorted(idx)
    # a killed writer leaves .tmp litter in some bucket dir
    bdir = next(os.path.join(idx, d) for d in os.listdir(idx))
    with open(os.path.join(bdir, "ingest_dead.parquet.tmp"), "wb") as f:
        f.write(b"garbage")
    pd.testing.assert_frame_equal(_read_sorted(idx), before)


def test_compaction_preserves_sums(ray_session, tmp_path):
    idx = str(tmp_path / "lg")
    linkgraph_ingest(rd.from_pandas(_edges(0)), idx, "run0")
    linkgraph_ingest(rd.from_pandas(_edges(1)), idx, "run1")
    before = _read_sorted(idx)
    stats = compact_linkgraph(idx)
    assert stats["parts_before"] > stats["parts_after"]
    pd.testing.assert_frame_equal(_read_sorted(idx), before)
    # second compaction over already-compacted buckets is a no-op
    assert compact_linkgraph(idx)["buckets"] == 0
    # and a THIRD ingest after compaction still accumulates
    linkgraph_ingest(rd.from_pandas(_edges(2)), idx, "run2")
    after = _read_sorted(idx)
    assert int(after.loc[(after["src_host"] == "a"), "n"].iloc[0]) == 9
    stats2 = compact_linkgraph(idx)
    assert stats2["buckets"] >= 1
    pd.testing.assert_frame_equal(_read_sorted(idx), after)


def test_crash_between_compact_write_and_manifest(ray_session, tmp_path):
    """Kill window 1: the merged part exists but the manifest does NOT
    name it — readers must ignore it (no double count)."""
    idx = str(tmp_path / "lg")
    linkgraph_ingest(rd.from_pandas(_edges(0)), idx, "run0")
    before = _read_sorted(idx)
    for d in os.listdir(idx):
        bdir = os.path.join(idx, d)
        parts = [os.path.join(bdir, f) for f in os.listdir(bdir)
                 if f.endswith(".parquet")]
        if not parts:
            continue
        merged = pd.concat([pq.read_table(p).to_pandas()
                            for p in parts])
        merged = merged.groupby(["src_host", "dst_host"],
                                as_index=False).agg(n=("n", "sum"))
        import pyarrow as pa
        pq.write_table(pa.Table.from_pandas(merged,
                                            preserve_index=False),
                       os.path.join(bdir, "compact_0.parquet"))
        break   # simulate crash right after ONE bucket's step 1
    pd.testing.assert_frame_equal(_read_sorted(idx), before)


def test_crash_between_manifest_and_deletes(ray_session, tmp_path):
    """Kill window 2: the manifest names the merged part but consumed
    sources still exist — readers must ignore the sources."""
    idx = str(tmp_path / "lg")
    linkgraph_ingest(rd.from_pandas(_edges(0)), idx, "run0")
    linkgraph_ingest(rd.from_pandas(_edges(1)), idx, "run1")
    before = _read_sorted(idx)
    # run a real compaction, then RESURRECT the consumed sources as if
    # the deletes never happened
    backup = {}
    for d in os.listdir(idx):
        bdir = os.path.join(idx, d)
        for f in os.listdir(bdir):
            if f.startswith("ingest_"):
                backup[(bdir, f)] = open(os.path.join(bdir, f),
                                         "rb").read()
    compact_linkgraph(idx)
    for (bdir, f), blob in backup.items():
        with open(os.path.join(bdir, f), "wb") as fh:
            fh.write(blob)
    pd.testing.assert_frame_equal(_read_sorted(idx), before)
    # manifest sanity: the resurrected files are all listed consumed
    for d in os.listdir(idx):
        bdir = os.path.join(idx, d)
        mpath = os.path.join(bdir, "MANIFEST.json")
        if os.path.exists(mpath):
            m = json.load(open(mpath))
            for f in os.listdir(bdir):
                if f.startswith("ingest_") and f.endswith(".parquet"):
                    assert f in m["consumed"]


def test_empty_index_reads_typed_empty(ray_session, tmp_path):
    ds = read_linkgraph(str(tmp_path / "nope"))
    assert ds.count() == 0
    # the SCHEMA survives (arrow-typed empty — Ray's to_pandas drops
    # columns on zero-row datasets, so assert at the Dataset level)
    assert ds.schema().names == ["src_host", "dst_host", "n"]
