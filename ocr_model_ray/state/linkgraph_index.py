"""Cross-run link-graph index: accumulate host-level edge weights
across crawl ingests, then run graph analytics (PageRank, components,
in-link stats) over the UNION graph without rescanning prior crawls.

Engine extension (no reference counterpart): a web corpus arrives as
monthly dumps; host-graph signals (PageRank priors, mirror families)
must reflect EVERY crawl seen so far, but re-deriving the graph from
all prior dumps per ingest is O(corpus). This module persists the
host graph itself — O(distinct host pairs), thousands of times smaller
than the page corpus — using the same crash-safe part protocol as
``state/dedup_index.py``:

    index_dir/bucket=<B>/ingest_<run_id>.parquet   # src_host, dst_host, n

* hash-bucketed by (src, dst) digest, so a pair's weight fragments
  all live in one bucket directory;
* append-only immutable parts per (bucket, run): tmp + atomic rename —
  a killed ingest leaves only ``.tmp`` litter the next reader ignores;
* idempotent per run_id: re-running an ingest with the same run_id
  overwrites its own parts (never double-counts);
* readers merge at read time (sum of per-part n), so ingests never
  rewrite history; ``compact_linkgraph`` folds parts per bucket when
  file count starts to dominate read cost (single-writer protocol).

Scale shape: ONE bucketed exchange per ingest (edge rows, never
pages); the union-graph read is a column-pruned parquet scan of the
index followed by one bucketed re-aggregation.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

log = logging.getLogger(__name__)

_EDGE_SCHEMA = pa.schema([("src_host", pa.string()),
                          ("dst_host", pa.string()),
                          ("n", pa.int64())])


def _bucket_dir(index_dir: str, b: int) -> str:
    return os.path.join(index_dir, f"bucket={b}")


def _manifest(bdir: str) -> dict:
    import json
    path = os.path.join(bdir, "MANIFEST.json")
    if not os.path.exists(path):
        return {"compact": None, "consumed": []}
    with open(path) as f:
        return json.load(f)


def _live_parts(bdir: str) -> list[str]:
    """Liveness rule (the double-count-proof core of the protocol):
    ``compact_*`` parts are live ONLY when the bucket manifest names
    them; ``ingest_*`` parts are live only when NOT in the manifest's
    consumed list. Weighted sums are not set-idempotent, so a crashed
    compaction must never leave both a merged part and its sources
    visible: before the manifest lands the new compact part is
    ignored; after it lands the consumed sources are ignored even if
    their deletes are still pending."""
    if not os.path.isdir(bdir):
        return []
    m = _manifest(bdir)
    consumed = set(m["consumed"])
    out = []
    for f in sorted(os.listdir(bdir)):
        if not f.endswith(".parquet"):
            continue    # .tmp litter from a killed writer
        if f.startswith("compact_"):
            if f == m["compact"]:
                out.append(os.path.join(bdir, f))
        elif f not in consumed:
            out.append(os.path.join(bdir, f))
    return out


def linkgraph_ingest(edges: rd.Dataset, index_dir: str, run_id: str,
                     src: str = "src_host", dst: str = "dst_host",
                     num_buckets: int = 64) -> dict:
    """Ingest one crawl's edge stream: ONE bucketed exchange, per
    bucket a vectorized (src, dst) count aggregation written as this
    run's immutable part. Returns {buckets, edge_rows, distinct_pairs}
    (a driver-side scalar summary — the edges themselves never
    collect)."""
    os.makedirs(index_dir, exist_ok=True)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        key = df[src].astype(str) + "\x00" + df[dst].astype(str)
        b = pd.util.hash_array(key.to_numpy()) % num_buckets
        return pd.DataFrame({"src_host": df[src], "dst_host": df[dst],
                             "__b": b.astype(np.int32)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        bdir = _bucket_dir(index_dir, b)
        os.makedirs(bdir, exist_ok=True)
        agg = (g.groupby(["src_host", "dst_host"], as_index=False)
               .agg(n=("src_host", "size")))
        out = pa.Table.from_pandas(agg, schema=_EDGE_SCHEMA,
                                   preserve_index=False)
        import pyarrow.parquet as pq
        dstf = os.path.join(bdir, f"ingest_{run_id}.parquet")
        pq.write_table(out, dstf + ".tmp")
        os.replace(dstf + ".tmp", dstf)     # atomic: never torn
        return pd.DataFrame({"pairs": pd.Series([len(agg)],
                                                dtype="int64"),
                             "rows": pd.Series([len(g)], dtype="int64")})

    summary = (edges.map_batches(tag, batch_format="pandas")
               .groupby("__b").map_groups(per_bucket,
                                          batch_format="pandas")
               .to_pandas())
    return {"buckets": int(len(summary)),
            "edge_rows": int(summary["rows"].sum()) if len(summary) else 0,
            "distinct_pairs": int(summary["pairs"].sum())
            if len(summary) else 0}


def read_linkgraph(index_dir: str,
                   num_buckets: int = 64) -> rd.Dataset:
    """The accumulated union graph: (src_host, dst_host, n) with n
    summed across every ingest. Column-pruned parquet scan of the
    index parts + one bucketed re-aggregation (pair fragments only
    ever live in one bucket, but across RUNS within it)."""
    from ..functions.bucketed import bucketed_agg
    files: list[str] = []
    if os.path.isdir(index_dir):
        for b in sorted(os.listdir(index_dir)):
            files.extend(_live_parts(os.path.join(index_dir, b)))
    if not files:
        return rd.from_arrow(_EDGE_SCHEMA.empty_table())
    parts = rd.read_parquet(files)
    out = bucketed_agg(parts, ["src_host", "dst_host"],
                       {"n": ("n", "sum")}, num_buckets=num_buckets)

    def typed(df: pd.DataFrame) -> pa.Table:
        if df.empty or "src_host" not in df.columns:
            return _EDGE_SCHEMA.empty_table()
        return pa.Table.from_pandas(df.astype({"n": "int64"}),
                                    schema=_EDGE_SCHEMA,
                                    preserve_index=False)

    return out.map_batches(typed, batch_format="pandas")


def compact_linkgraph(index_dir: str) -> dict:
    """Fold each bucket's LIVE parts into one pre-aggregated
    ``compact_<epoch>`` part. Single-writer, crash-safe at every step
    (see ``_live_parts`` for the liveness rule):

      1. write ``compact_<epoch+1>.parquet`` (tmp + atomic rename) —
         invisible to readers until step 2;
      2. atomically replace MANIFEST.json naming the new compact part
         and listing every consumed source — the commit point;
      3. delete consumed sources (lazy: a kill here just leaves
         ignored files the next compaction prunes from the manifest
         once gone).

    Do not run concurrently with an ingest in the same bucket (the
    single-writer rule all the index compactions share)."""
    import json

    import pyarrow.parquet as pq
    buckets = parts_before = rows = 0
    if not os.path.isdir(index_dir):
        return {"buckets": 0, "parts_before": 0, "parts_after": 0,
                "rows": 0}
    for b in sorted(os.listdir(index_dir)):
        bdir = os.path.join(index_dir, b)
        if not os.path.isdir(bdir):
            continue
        live = _live_parts(bdir)
        if len(live) <= 1:
            continue
        m = _manifest(bdir)
        epoch = 0
        if m["compact"]:
            epoch = int(m["compact"].split("_")[1].split(".")[0]) + 1
        buckets += 1
        parts_before += len(live)
        tbl = pa.concat_tables([pq.read_table(p) for p in live])
        merged = (tbl.to_pandas()
                  .groupby(["src_host", "dst_host"], as_index=False)
                  .agg(n=("n", "sum")))
        rows += len(merged)
        new_name = f"compact_{epoch}.parquet"
        dstf = os.path.join(bdir, new_name)
        pq.write_table(pa.Table.from_pandas(merged,
                                            schema=_EDGE_SCHEMA,
                                            preserve_index=False),
                       dstf + ".tmp")
        os.replace(dstf + ".tmp", dstf)            # step 1
        consumed = sorted(
            {os.path.basename(p) for p in live}
            | {c for c in m["consumed"]
               if os.path.exists(os.path.join(bdir, c))})
        mpath = os.path.join(bdir, "MANIFEST.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump({"compact": new_name, "consumed": consumed}, f)
        os.replace(mpath + ".tmp", mpath)          # step 2: commit
        for p in live:                             # step 3: lazy
            os.remove(p)
        if m["compact"]:
            old = os.path.join(bdir, m["compact"])
            if os.path.exists(old):
                os.remove(old)
    return {"buckets": buckets, "parts_before": parts_before,
            "parts_after": buckets, "rows": rows}
