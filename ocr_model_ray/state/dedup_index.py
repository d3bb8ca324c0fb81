"""Cross-run exact-dedup index: dedup NEW crawl shards against every
document ever ingested, without rescanning the old corpus.

Engine extension (no reference counterpart — the reference's result
cache dedups within one job, `worker/cache.py`): at 100 TB the corpus
arrives as monthly crawl dumps, and "is this text new?" must be
answered against ALL prior dumps. Rescanning them per ingest is
O(corpus); this module keeps a persistent INDEX of content hashes —
16 B/doc instead of the documents — and each ingest touches only the
index and the new shard.

Index layout (shared storage at multi-node scale):

    index_dir/bucket=<B>/ingest_<run_id>.parquet   # columns: h, keep_id

* hash-bucketed by digest prefix, so an ingest's per-bucket task reads
  ONLY its bucket's partitions (column-pruned parquet);
* append-only immutable parts per (bucket, run): written tmp + atomic
  rename (the manifest doctrine — a killed ingest leaves only torn
  ``.tmp`` files the next run ignores);
* idempotent per run_id: a task excludes its OWN run's parts from the
  "already seen" read and overwrites them, so re-running a failed
  ingest with the SAME run_id converges to the same index and the
  same fresh-set (retries and resumes are safe); a rerun with a NEW
  run_id would see its own prior half-written hashes as "old" — reuse
  run_ids exactly like `checkpoint.run_sharded` reuses shard ids.

Scale shape: ONE bucketed exchange of (h, doc_id) int/str rows per
ingest (the same shuffle exact_dedup uses); per bucket the dedup
against the index is a vectorized ``isin`` over the bucket's index
partitions. No driver-side hash set at any point.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.text_stats import md5_hex

#: columns of every index part file
_INDEX_SCHEMA = pa.schema([("h", pa.string()), ("keep_id", pa.int64())])


def _bucket_dir(index_dir: str, b: int) -> str:
    return os.path.join(index_dir, f"bucket={b}")


def _index_parts(bdir: str, exclude_run: str | None = None) -> list[str]:
    if not os.path.isdir(bdir):
        return []
    out = []
    for f in sorted(os.listdir(bdir)):
        if not f.endswith(".parquet"):
            continue   # torn .tmp files from a killed ingest
        if exclude_run is not None and f == f"ingest_{exclude_run}.parquet":
            continue
        out.append(os.path.join(bdir, f))
    return out


def dedup_ingest(ds: rd.Dataset, index_dir: str, run_id: str,
                 num_buckets: int = 64, id_col: str = "doc_id",
                 text_col: str = "text") -> rd.Dataset:
    """Ingest a new shard against the index: returns the FRESH rows —
    (id_col, h) for docs whose text hash is not in the index, one
    min-id representative per hash within the ingest — and appends
    their hashes to the index.

    Consume the returned Dataset fully (e.g. ``write_parquet`` or a
    semi-join back to the shard for the surviving texts): the index
    append happens inside the per-bucket tasks as the stream runs."""
    os.makedirs(index_dir, exist_ok=True)

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hex(df[text_col])
        b = np.fromiter(
            (int(x[:8], 16) % num_buckets if isinstance(x, str) else 0
             for x in h), count=len(h), dtype=np.int32)
        return pd.DataFrame({"h": h.to_numpy(),
                             id_col: df[id_col].to_numpy(),
                             "__b": b})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        bdir = _bucket_dir(index_dir, b)
        os.makedirs(bdir, exist_ok=True)
        # within-ingest dedup: min id per hash
        fresh = (g.sort_values(["h", id_col], kind="mergesort")
                 .drop_duplicates("h")
                 .rename(columns={id_col: "keep_id"})[["h", "keep_id"]])
        # against the index (excluding this run's own prior attempt,
        # so retries are idempotent)
        parts = _index_parts(bdir, exclude_run=run_id)
        if parts:
            import pyarrow.parquet as pq
            seen = pa.concat_tables(
                [pq.read_table(p, columns=["h"]) for p in parts])
            fresh = fresh[~fresh["h"].isin(seen["h"].to_pandas())]
        out = pa.Table.from_pandas(fresh.reset_index(drop=True),
                                   schema=_INDEX_SCHEMA,
                                   preserve_index=False)
        import pyarrow.parquet as pq
        dst = os.path.join(bdir, f"ingest_{run_id}.parquet")
        pq.write_table(out, dst + ".tmp")
        os.replace(dst + ".tmp", dst)      # atomic: never torn
        return fresh.rename(columns={"keep_id": id_col})

    return (ds.map_batches(hash_batch, batch_format="pandas")
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas"))


def compact_index(index_dir: str, run_id: str = "compacted") -> dict:
    """Merge each bucket's ingest parts into one part (monthly dumps
    accumulate one small file per bucket per ingest; parquet open cost
    eventually dominates the per-bucket read). Single-writer protocol,
    same doctrine as ``state/compact.py``: write the merged part as
    ``.tmp``, atomic-rename it in, THEN delete the source parts — a
    kill at any point leaves either the old parts (tmp ignored) or the
    merged part plus already-deleted sources (idempotent re-run
    finishes the deletes). Do not compact concurrently with an ingest.
    Returns {buckets, parts_before, parts_after, rows}."""
    import pyarrow.parquet as pq
    buckets = parts_before = rows = 0
    if not os.path.isdir(index_dir):
        return {"buckets": 0, "parts_before": 0, "parts_after": 0,
                "rows": 0}
    for b in sorted(os.listdir(index_dir)):
        bdir = os.path.join(index_dir, b)
        if not os.path.isdir(bdir):
            continue
        parts = _index_parts(bdir)
        dst = os.path.join(bdir, f"ingest_{run_id}.parquet")
        if len(parts) <= 1 and parts == [dst]:
            continue
        buckets += 1
        parts_before += len(parts)
        tbl = pa.concat_tables([pq.read_table(p) for p in parts]) \
            if parts else _INDEX_SCHEMA.empty_table()
        rows += tbl.num_rows
        pq.write_table(tbl, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
        for p in parts:
            if p != dst:
                os.remove(p)
    return {"buckets": buckets, "parts_before": parts_before,
            "parts_after": buckets, "rows": rows}


def index_stats(index_dir: str) -> dict:
    """Driver-side summary of the index: per-run row counts and the
    total distinct-hash count (sums part metadata — no data read)."""
    import pyarrow.parquet as pq
    runs: dict[str, int] = {}
    total = 0
    if not os.path.isdir(index_dir):
        return {"total_hashes": 0, "runs": {}}
    for b in sorted(os.listdir(index_dir)):
        bdir = os.path.join(index_dir, b)
        if not os.path.isdir(bdir):
            continue
        for p in _index_parts(bdir):
            n = pq.read_metadata(p).num_rows
            run = os.path.basename(p)[len("ingest_"):-len(".parquet")]
            runs[run] = runs.get(run, 0) + n
            total += n
    return {"total_hashes": total, "runs": runs}
