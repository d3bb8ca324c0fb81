"""Per-partition lineage manifests for resumable runs (SURVEY.md §4.2).

Output layout (north rule: "resumable from checkpoint with per-partition
lineage + metrics"):

    out_dir/
      data/part_id=<N>/*.parquet     # hash-partitioned extraction output
      manifest/part-<N>.json         # committed AFTER the partition's data
      metrics/run-<k>.json           # per-run stage metrics

A partition is DONE iff its manifest exists and parses; data without a
manifest is presumed partial (a killed run) and is deleted before
reprocessing. Manifest commit is write-temp-then-rename, so a crash
mid-commit never yields a corrupt "done" marker. Partition id =
crc32(url) % P — a pure function of the row, so reruns repartition
identically regardless of parallelism.

The reference's only "checkpoint" is a job-status row + content-hash FS
cache (worker/tasks.py:212-238, worker/document_processor.py:149-205);
this replaces it with data-level, idempotent lineage.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib
from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

MANIFEST_DIR = "manifest"
DATA_DIR = "data"
METRICS_DIR = "metrics"


def partition_ids(urls: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    """Deterministic partition id per url (crc32 % P), vectorized enough —
    crc32 is C-speed; urls are short."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    pids = [zlib.crc32(u.encode("utf-8")) % num_partitions for u in urls.to_pylist()]
    return pa.array(pids, pa.int32())


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    return batch.append_column("part_id", partition_ids(batch["url"], num_partitions))


def manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{part_id}.json")


def data_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, DATA_DIR, f"part_id={part_id}")


def done_partitions(out_dir: str) -> set[int]:
    """Partitions with a committed, parseable manifest."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            if m.get("status") == "done":
                done.add(int(m["partition"]))
        except (ValueError, OSError, KeyError):
            continue
    return done


def clean_partial(out_dir: str) -> list[int]:
    """Delete data dirs for partitions WITHOUT a committed manifest
    (partial output of a killed run). Returns the cleaned ids."""
    done = done_partitions(out_dir)
    cleaned = []
    ddir = os.path.join(out_dir, DATA_DIR)
    if not os.path.isdir(ddir):
        return cleaned
    for name in os.listdir(ddir):
        if not name.startswith("part_id="):
            continue
        try:
            pid = int(name.split("=", 1)[1])
        except ValueError:  # hive default / stray dir — not ours to manage
            continue
        if pid not in done:
            shutil.rmtree(os.path.join(ddir, name), ignore_errors=True)
            cleaned.append(pid)
    return cleaned


def commit_manifest(out_dir: str, part_id: int, *, row_count: int,
                    url_checksum: int, char_count: int,
                    error_count: int = 0,
                    input_files: Iterable[str] | None = None,
                    attempt: int = 0) -> None:
    """Atomically commit a partition manifest (write temp -> rename)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    payload = {
        "partition": part_id,
        "status": "done",
        "row_count": row_count,
        "url_checksum": url_checksum,   # order-independent sum of crc32(url) mod 2^32
        "char_count": char_count,       # total extracted chars (cheap value fingerprint)
        "error_count": error_count,     # dead-lettered rows in this partition
        "input_files": sorted(input_files) if input_files else None,
        "attempt": attempt,
    }
    tmp = os.path.join(mdir, f".part-{part_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, manifest_path(out_dir, part_id))


def summarize_partition(out_dir: str, part_id: int) -> dict:
    """Read back a written partition's lineage facts from its parquet files
    (column-pruned: url + char_count + error only)."""
    import pyarrow.parquet as pq
    pdir = data_path(out_dir, part_id)
    rows = 0
    checksum = 0
    chars = 0
    errors = 0
    for name in sorted(os.listdir(pdir)):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(pdir, name),
                          columns=["url", "char_count", "error"])
        rows += t.num_rows
        for u in t["url"].to_pylist():
            checksum = (checksum + zlib.crc32(u.encode("utf-8"))) % (2 ** 32)
        chars += pc.sum(t["char_count"]).as_py() or 0
        errors += t.num_rows - t["error"].null_count  # non-null error rows
    return {"row_count": rows, "url_checksum": checksum, "char_count": chars,
            "error_count": errors}


def write_metrics(out_dir: str, record: dict) -> str:
    """Append a per-run metrics record (stage timings, docs, failures)."""
    mdir = os.path.join(out_dir, METRICS_DIR)
    os.makedirs(mdir, exist_ok=True)
    k = len([n for n in os.listdir(mdir) if n.startswith("run-")])
    path = os.path.join(mdir, f"run-{k}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1)
    os.replace(tmp, path)
    return path
