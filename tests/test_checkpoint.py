"""Resume-after-kill correctness (FIXTURES.md §3.e): no duplicate or
missing partitions; partial (unmanifested) data is cleaned and redone."""

import json
import os
import shutil

import pyarrow.dataset as pads
import pytest

from ocr_model_ray.pipelines.checkpoint import run_resumable
from ocr_model_ray.state import manifest as mf

from conftest import load_golden

P = 8


@pytest.mark.usefixtures("ray_session")
def test_full_run_then_resume_noop(t1_pages_dir, tmp_path):
    out = str(tmp_path / "out")
    rec1 = run_resumable(t1_pages_dir, out, num_partitions=P)
    assert sorted(rec1["partitions_written"]) == sorted(
        set(rec1["partitions_written"]))
    assert rec1["rows_written"] == 69
    # second run: everything already done -> nothing rewritten
    rec2 = run_resumable(t1_pages_dir, out, num_partitions=P)
    assert rec2["partitions_written"] == []
    assert rec2["rows_written"] == 0
    # data readable, one row per url, text matches golden
    data = pads.dataset(os.path.join(out, "data"), partitioning="hive").to_table(
        columns=["url", "extracted_text"])
    golden = load_golden("t1")
    got = dict(zip(data["url"].to_pylist(), data["extracted_text"].to_pylist()))
    want = dict(zip(golden["url"].to_pylist(), golden["extracted_text"].to_pylist()))
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_compaction_preserves_manifests(t1_pages_dir, tmp_path):
    from ocr_model_ray.state.compact import compact_run
    out = str(tmp_path / "out")
    run_resumable(t1_pages_dir, out, num_partitions=4)
    results = compact_run(out)
    assert all(r["status"] in ("compacted", "already-compact") for r in results)
    # every partition now holds exactly one file; lineage facts unchanged
    for pid in sorted(mf.done_partitions(out)):
        pdir = mf.data_path(out, pid)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1
        with open(mf.manifest_path(out, pid)) as f:
            m = json.load(f)
        facts = mf.summarize_partition(out, pid)
        assert facts["row_count"] == m["row_count"]
        assert facts["url_checksum"] == m["url_checksum"]
    data = pads.dataset(os.path.join(out, "data"), partitioning="hive").to_table(
        columns=["url"])
    assert len(set(data["url"].to_pylist())) == 69
    # resume after compaction: still a no-op
    rec = run_resumable(t1_pages_dir, out, num_partitions=4)
    assert rec["partitions_written"] == []


@pytest.mark.usefixtures("ray_session")
def test_compact_crash_mid_cleanup_loses_nothing(t1_pages_dir, tmp_path):
    """ADVICE round-1 (high): a crash after os.replace but before all
    fragments are deleted leaves compact file + stale fragments; the
    re-run must NOT merge the compact file with the leftovers (double
    count) and must NOT delete the only complete copy. Empirically a
    14-row partition shrank to 2 rows under the old protocol."""
    from ocr_model_ray.state.compact import compact_partition, compact_run
    out = str(tmp_path / "out")
    run_resumable(t1_pages_dir, out, num_partitions=4)
    pid = sorted(mf.done_partitions(out))[0]
    pdir = mf.data_path(out, pid)
    # keep a pre-compaction fragment aside to replay as a stale leftover
    frag = next(f for f in sorted(os.listdir(pdir)) if f.endswith(".parquet"))
    shutil.copy(os.path.join(pdir, frag), str(tmp_path / "stale.parquet"))
    compact_run(out)
    # simulate the crash: stale fragment reappears next to the compact file
    shutil.copy(str(tmp_path / "stale.parquet"), os.path.join(pdir, frag))

    res = compact_partition(out, pid)
    assert res["status"] == "resumed-cleanup"
    with open(mf.manifest_path(out, pid)) as f:
        m = json.load(f)
    facts = mf.summarize_partition(out, pid)
    assert facts["row_count"] == m["row_count"]          # nothing lost
    assert facts["url_checksum"] == m["url_checksum"]    # nothing duplicated
    files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    assert files == [f"part-{pid}-compact.parquet"]


@pytest.mark.usefixtures("ray_session")
def test_resume_filter_runs_on_raw_pages(t1_pages_dir):
    """ADVICE round-1 (medium): the done-partition filter must run on the
    RAW pages dataset — before derive/extract — so a resume skips the
    expensive work. The transform sees pre-derive columns and an
    all-dropping filter yields zero extracted rows (nothing reaches the
    extract stage)."""
    from ocr_model_ray.pipelines.extract_pipeline import extract_pipeline

    def xform(pages):
        def probe(b):
            # raises inside the task (failing the run) if placed
            # after derive: derive appends content_hash/mime
            assert "html" in b.schema.names
            assert "content_hash" not in b.schema.names
            assert "mime" not in b.schema.names
            return b.slice(0, 0)
        return pages.map_batches(probe, batch_format="pyarrow")

    ds = extract_pipeline(t1_pages_dir, pages_transform=xform)
    assert ds.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume(t1_pages_dir, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(t1_pages_dir, out, num_partitions=P)
    done = mf.done_partitions(out)
    assert len(done) > 2

    # simulate a kill: two partitions lose their manifest (one also keeps
    # partial data on disk), one loses its data entirely
    victims = sorted(done)[:3]
    os.remove(mf.manifest_path(out, victims[0]))          # partial: data, no manifest
    os.remove(mf.manifest_path(out, victims[1]))
    shutil.rmtree(mf.data_path(out, victims[1]))          # nothing at all
    os.remove(mf.manifest_path(out, victims[2]))

    rec = run_resumable(t1_pages_dir, out, num_partitions=P)
    assert sorted(rec["partitions_written"]) == victims
    assert set(rec["partitions_cleaned"]) <= set(victims)

    # all partitions done again; manifests consistent with data
    assert mf.done_partitions(out) == done
    for pid in sorted(done):
        with open(mf.manifest_path(out, pid)) as f:
            m = json.load(f)
        facts = mf.summarize_partition(out, pid)
        assert m["row_count"] == facts["row_count"]
        assert m["url_checksum"] == facts["url_checksum"]

    # no dupes / no missing rows
    data = pads.dataset(os.path.join(out, "data"), partitioning="hive").to_table(
        columns=["url"])
    urls = data["url"].to_pylist()
    assert len(urls) == 69 and len(set(urls)) == 69
    # metrics recorded per run
    runs = os.listdir(os.path.join(out, "metrics"))
    assert len(runs) == 2


@pytest.mark.usefixtures("ray_session")
def test_metrics_parquet_and_rollup(t1_pages_dir, tmp_path):
    """Milestone-9 tail: run records flatten to a queryable per-stage
    parquet table and a cross-run rollup."""
    import pyarrow.parquet as pq
    from ocr_model_ray.state.metrics import (
        metrics_rollup, metrics_table, write_metrics_parquet)
    out = str(tmp_path / "out")
    run_resumable(t1_pages_dir, out, num_partitions=4)
    run_resumable(t1_pages_dir, out, num_partitions=4)  # resume no-op run

    t = metrics_table(out)
    assert t.num_rows > 0
    assert set(t.column_names) == {"run", "stage", "wall_s", "rows_written",
                                   "error_rows", "docs_per_sec"}
    assert sorted(set(t["run"].to_pylist())) == [0, 1]

    path = write_metrics_parquet(out)
    assert pq.read_table(path).num_rows == t.num_rows

    roll = metrics_rollup(out)
    assert len(roll) > 0
    # sorted by total wall desc — the "where does time go" view
    assert (roll["total_wall_s"].to_numpy()[:-1]
            >= roll["total_wall_s"].to_numpy()[1:]).all()
    assert roll["n_runs"].max() <= 2


@pytest.mark.usefixtures("ray_session")
def test_dedup_resume_output_invariant(t1_pages_dir, tmp_path):
    """Round-2 code-review check: with cfg.dedup=True, a kill+resume may
    pick a DIFFERENT duplicate-content representative than the original
    run (the done-partition filter runs pre-dedup) — the written output
    must be identical to an uninterrupted run regardless."""
    from ocr_model_ray.pipelines.extract_pipeline import ExtractConfig

    def read_out(out):
        t = pads.dataset(os.path.join(out, "data"), partitioning="hive") \
            .to_table(columns=["url", "extracted_text", "content_hash"])
        return sorted(zip(t["url"].to_pylist(),
                          t["extracted_text"].to_pylist(),
                          t["content_hash"].to_pylist()))

    cfg = ExtractConfig(dedup=True, emit="summary")
    ref = str(tmp_path / "ref")
    run_resumable(t1_pages_dir, ref, cfg, num_partitions=P)
    want = read_out(ref)
    assert len(want) == 69

    out = str(tmp_path / "out")
    run_resumable(t1_pages_dir, out, cfg, num_partitions=P)
    # kill the partitions holding the first url of every dup-content
    # group (the fixture dup-content urls share hashes with articles)
    import collections
    by_hash = collections.defaultdict(list)
    for url, _, h in want:
        by_hash[h].append(url)
    import zlib as _z
    victim_parts = sorted({_z.crc32(us[0].encode()) % P
                           for us in by_hash.values() if len(us) > 1})
    assert victim_parts, "fixture corpus must contain dup content"
    for pid in victim_parts:
        os.remove(mf.manifest_path(out, pid))
        shutil.rmtree(mf.data_path(out, pid), ignore_errors=True)

    run_resumable(t1_pages_dir, out, cfg, num_partitions=P)
    assert read_out(out) == want


@pytest.mark.usefixtures("ray_session")
def test_waved_run_equals_single_run(t1_pages_dir, tmp_path):
    """waves=N processes the partition space in N committed sub-runs;
    the final manifests (row counts + order-independent url checksums)
    must equal a single-launch run's exactly, and a run killed between
    waves must resume with the committed waves skipped."""
    out1 = str(tmp_path / "single")
    out2 = str(tmp_path / "waved")
    run_resumable(t1_pages_dir, out1, num_partitions=P)
    rec = run_resumable(t1_pages_dir, out2, num_partitions=P, waves=4)
    assert rec["waves"] == 4
    assert mf.done_partitions(out1) == mf.done_partitions(out2)
    for pid in sorted(mf.done_partitions(out1)):
        with open(mf.manifest_path(out1, pid)) as f:
            m1 = json.load(f)
        with open(mf.manifest_path(out2, pid)) as f:
            m2 = json.load(f)
        assert m1["row_count"] == m2["row_count"]
        assert m1["url_checksum"] == m2["url_checksum"]

    # simulate a kill between waves: drop the manifests of one wave's
    # partitions (keep the data); resume must redo exactly those
    victims = sorted(p for p in mf.done_partitions(out2) if p % 4 == 2)
    for pid in victims:
        os.remove(mf.manifest_path(out2, pid))
    rec2 = run_resumable(t1_pages_dir, out2, num_partitions=P, waves=4)
    assert sorted(rec2["partitions_written"]) == victims
    assert set(rec2["partitions_done_before"]).isdisjoint(victims)
    assert mf.done_partitions(out2) == mf.done_partitions(out1)


@pytest.mark.usefixtures("ray_session")
def test_sharded_append_processes_only_new_shards(t1_pages_dir, tmp_path):
    """run_sharded: one output partition per input shard with full
    input->output lineage in the manifest; appending new shards to the
    corpus processes exactly the new ones, and the appended store
    equals a one-shot run over everything."""
    from ocr_model_ray.pipelines.checkpoint import run_sharded

    files = sorted(os.path.join(t1_pages_dir, f)
                   for f in os.listdir(t1_pages_dir)
                   if f.endswith(".parquet"))
    assert len(files) >= 2

    # initial crawl: first shard only
    inc = str(tmp_path / "inc")
    rec1 = run_sharded(files[:1], inc)
    assert rec1["input_files_processed"] == files[:1]
    assert len(rec1["partitions_written"]) == 1

    # a new crawl snapshot lands: rerun over the whole corpus
    rec2 = run_sharded(files, inc)
    assert rec2["input_files_processed"] == files[1:]   # only the new
    assert set(rec2["partitions_done_before"]) == set(
        rec1["partitions_written"])

    # one-shot reference: manifests must be identical shard-for-shard
    ref = str(tmp_path / "ref")
    run_sharded(files, ref)
    for d in ("inc", "ref"):
        pass
    inc_m = {f: json.load(open(os.path.join(inc, "manifest", f)))
             for f in sorted(os.listdir(os.path.join(inc, "manifest")))}
    ref_m = {f: json.load(open(os.path.join(ref, "manifest", f)))
             for f in sorted(os.listdir(os.path.join(ref, "manifest")))}
    assert inc_m.keys() == ref_m.keys()
    for k in inc_m:
        for fact in ("row_count", "url_checksum", "char_count",
                     "input_files"):
            assert inc_m[k][fact] == ref_m[k][fact], (k, fact)

    # lineage: every manifest names its exact input shard
    assert sorted(m["input_files"][0] for m in inc_m.values()) == files

    # a third run is a no-op
    rec3 = run_sharded(files, inc)
    assert rec3["partitions_written"] == []
    assert rec3["input_files_processed"] == []
