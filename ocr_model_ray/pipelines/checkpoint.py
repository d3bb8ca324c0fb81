"""Resumable extraction runs: read -> filter-done-partitions -> extract ->
partitioned write -> manifest commit (north rule: a killed run resumes
exactly where it stopped).

Flow per run:
  1. ``done_partitions(out_dir)`` reads committed manifests.
  2. ``clean_partial`` deletes data dirs that lack a manifest (partial
     writes from a killed run) — the write protocol is idempotent.
  3. The pages corpus gets a deterministic ``part_id = crc32(url) % P``
     column; done partitions are filtered OUT with a vectorized mask
     before any expensive work (the filter fuses with the read).
  4. Extraction output is written ``partition_cols=["part_id"]``.
  5. For each newly written partition, lineage facts (row count,
     order-independent url checksum, char total) are read back from the
     parquet footers/columns and the manifest committed atomically.

At cluster scale the manifest store would be the shared FS / object
store; the protocol only needs atomic rename.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..state import manifest as mf
from .extract_pipeline import ExtractConfig, extract_pipeline


def run_resumable(paths: str | Sequence[str], out_dir: str,
                  cfg: Optional[ExtractConfig] = None,
                  num_partitions: int = 16,
                  drop_nested: bool = True,
                  waves: int = 1) -> dict:
    """Run (or resume) the extraction pipeline into ``out_dir``.

    Returns a metrics record: partitions done before/after, rows written,
    wall seconds. ``drop_nested`` writes the summary projection (text +
    stats + flat provenance counts) — the nested layout columns are kept
    when False.

    ``waves`` sets the COMMIT GRANULARITY within one run: the partition
    space is processed in ``waves`` sub-runs (partition p belongs to
    wave ``p % waves``) and each wave's manifests commit before the next
    wave starts, so a SIGKILL mid-run loses at most one wave of work —
    not the whole run (with waves=1, manifests only commit after the
    full write, and a kill forfeits everything since the last completed
    run). Each wave pays the pipeline's fixed launch cost, so size waves
    to amortize: hours-long runs want tens of waves; the default 1 keeps
    small runs single-launch."""
    cfg = cfg or ExtractConfig()
    t0 = time.monotonic()
    done_before = mf.done_partitions(out_dir)
    cleaned = mf.clean_partial(out_dir)

    # drop done partitions from the RAW pages dataset, before derive /
    # dedup / extract: part_id = crc32(url) % P depends only on url, so
    # a resume skips the expensive work, not just the write (ADVICE
    # round 1, medium). The filter fuses with the read.
    #
    # Interaction with cfg.dedup: filtering pre-dedup can change which
    # url of a duplicate-content group acts as the extraction
    # representative on resume. That is OUTPUT-INVARIANT: extraction is
    # a pure function of the payload, every url in the group gets its
    # own (identical-content) output row, and each row's partition is
    # crc32(its url) — so a resumed run's data equals an uninterrupted
    # run's (pinned by test_dedup_resume_output_invariant). The only
    # cost is re-extracting shared content whose prior rep was in a
    # completed partition.
    import os

    waves = max(1, int(waves))
    all_written: list[int] = []
    rows = 0
    errors = 0
    stage_stats: list[dict] = []
    for w in range(waves):
        wave_pids = (set(range(num_partitions)) if waves == 1 else
                     {p for p in range(num_partitions) if p % waves == w})
        todo = sorted(wave_pids - done_before)
        if not todo:
            continue

        pages_transform = None
        if done_before or waves > 1:
            keep_arr = pa.array(todo, pa.int32())

            def _keep_todo(batch: pa.Table,
                           keep_arr: pa.Array = keep_arr) -> pa.Table:
                pids = mf.partition_ids(batch["url"], num_partitions)
                return batch.filter(pc.is_in(pids, value_set=keep_arr))

            def pages_transform(pages,  # noqa: F811 — conditional def
                                fn=_keep_todo):
                return pages.map_batches(fn, batch_format="pyarrow")

        ds = extract_pipeline(paths, cfg, pages_transform=pages_transform)
        ds = ds.map_batches(
            lambda b: mf.add_partition_column(b, num_partitions),
            batch_format="pyarrow")
        if drop_nested:
            from .extract_pipeline import SUMMARY_COLUMNS
            ds = ds.select_columns(SUMMARY_COLUMNS + ["part_id"])

        ds.write_parquet(_data_root(out_dir), partition_cols=["part_id"])

        # commit THIS wave's manifests before the next wave starts
        written = []
        ddir = _data_root(out_dir)
        todo_set = set(todo)
        if os.path.isdir(ddir):
            for name in os.listdir(ddir):
                if name.startswith("part_id="):
                    try:
                        pid = int(name.split("=", 1)[1])
                    except ValueError:  # stray/hive-default dir — skip
                        continue
                    if pid in todo_set:
                        written.append(pid)
        for pid in sorted(written):
            facts = mf.summarize_partition(out_dir, pid)
            rows += facts["row_count"]
            errors += facts["error_count"]
            mf.commit_manifest(out_dir, pid, input_files=None, **facts)
        all_written.extend(written)
        stage_stats = _stage_stats(ds)

    wall = round(time.monotonic() - t0, 3)
    if not stage_stats:
        # a resume that found everything done still records as a run —
        # "nothing left to do" is telemetry, not an absence of it
        stage_stats = [{"stage": "noop_resume", "wall_s": wall}]
    record = {
        "partitions_total": num_partitions,
        "waves": waves,
        "partitions_done_before": sorted(done_before),
        "partitions_cleaned": sorted(cleaned),
        "partitions_written": sorted(all_written),
        "rows_written": rows,
        "error_rows": errors,
        "docs_per_sec": round(rows / wall, 1) if wall else None,
        "wall_s": wall,
        "config": {"dedup": cfg.dedup, "max_pages": cfg.max_pages,
                   "batch_size": cfg.batch_size, "emit": cfg.emit},
        "stage_stats": stage_stats,
    }
    mf.write_metrics(out_dir, record)
    return record


def _stage_stats(ds) -> list[dict]:
    """Per-operator {stage, wall_s} parsed from Ray Data's stats; the raw
    text is the authoritative record (saved alongside by callers that
    want it via ds.stats())."""
    import re
    try:
        text = ds.stats()
    except Exception:  # noqa: BLE001 — stats are best-effort telemetry
        return []
    out = []
    for m in re.finditer(r"Operator \d+ (.+?): .*?in ([\d.]+)s", text):
        out.append({"stage": m.group(1)[:120], "wall_s": float(m.group(2))})
    return out


def _data_root(out_dir: str) -> str:
    import os
    path = os.path.join(out_dir, mf.DATA_DIR)
    os.makedirs(path, exist_ok=True)
    return path


def run_sharded(paths: str | Sequence[str], out_dir: str,
                cfg: Optional[ExtractConfig] = None,
                drop_nested: bool = True) -> dict:
    """Input-shard-aligned incremental runs: one OUTPUT partition per
    INPUT shard, manifests carrying the full lineage the north rule
    names (input shard -> output shard -> row count -> content
    checksums). Unlike ``run_resumable`` (url-hash partitions over a
    FIXED corpus), this mode supports APPEND: rerunning after new crawl
    shards land processes exactly the shards without manifests —
    nothing else is read. Shard identity is a 64-bit blake2b digest of
    the shard's full normalized path, so ids are stable under appends
    and reorderings AND distinct for same-named files in different
    directories (2024-01/part-0.parquet vs 2024-02/part-0.parquet in a
    crawl layout must be two shards, not one).

    Each shard runs as its own pipeline launch (a shard is a crawl
    dump, hundreds of MB — launch cost amortizes; tiny-file corpora
    should be compacted first). Extraction is pure per row, so
    shard-at-a-time output equals any other partitioning of the same
    rows. ``cfg.dedup`` is shard-local here by construction."""
    import glob as _glob
    import hashlib
    import os

    cfg = cfg or ExtractConfig()
    t0 = time.monotonic()

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith((".parquet", ".warc", ".warc.gz")))
        else:
            files = sorted(_glob.glob(paths))
    else:
        files = sorted(paths)

    def _shard_id(path):
        norm = os.path.normpath(os.path.abspath(path))
        return int.from_bytes(
            hashlib.blake2b(norm.encode(), digest_size=8).digest(), "big")

    shard_of = {f: _shard_id(f) for f in files}
    if len(set(shard_of.values())) != len(files):
        raise ValueError("shard id collision across input files: %r"
                         % sorted(files))

    done_before = mf.done_partitions(out_dir)
    cleaned = mf.clean_partial(out_dir)
    todo = [f for f in files if shard_of[f] not in done_before]

    rows = 0
    errors = 0
    written = []
    for f in todo:
        pid = shard_of[f]
        ds = extract_pipeline([f], cfg)
        if drop_nested:
            from .extract_pipeline import SUMMARY_COLUMNS
            ds = ds.select_columns(SUMMARY_COLUMNS)
        ds.write_parquet(mf.data_path(out_dir, pid))
        facts = mf.summarize_partition(out_dir, pid)
        rows += facts["row_count"]
        errors += facts["error_count"]
        mf.commit_manifest(out_dir, pid, input_files=[f], **facts)
        written.append(pid)

    wall = round(time.monotonic() - t0, 3)
    record = {
        "mode": "sharded",
        "shards_total": len(files),
        "partitions_done_before": sorted(done_before),
        "partitions_cleaned": sorted(cleaned),
        "partitions_written": sorted(written),
        "input_files_processed": sorted(todo),
        "rows_written": rows,
        "error_rows": errors,
        "wall_s": wall,
        "stage_stats": [{"stage": "sharded_run" if todo else "noop_resume",
                         "wall_s": wall}],
    }
    mf.write_metrics(out_dir, record)
    return record
