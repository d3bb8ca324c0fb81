"""Partitioned window operator (PARTITION BY ... ORDER BY ... frames).

Engine extension (no reference counterpart): the general shape behind
LAG/LEAD, running totals, session ids, and row ranks at 10^12 rows —
Ray Data has no window API, so this module provides the canonical
composition:

1. ONE shuffle co-locates each partition key by hashing it into
   ``num_buckets`` buckets (``groupby(bucket)``), so the wide exchange
   moves every row exactly once and Python overhead is per BUCKET
   (dozens of calls), never per key (millions).
2. Each bucket frame is sorted once by (key, *order_cols) — partitions
   are contiguous runs, so ANY per-partition window reduces to a
   vectorized kernel over the whole frame with key-boundary masks
   (shift/cumsum/groupby-ffill), exactly like a sort-based window
   operator in a columnar engine.

Skew note: a hot key costs one bucket, and every kernel here is linear
in the bucket's rows — there is no per-key quadratic step to blow up.

Built-in kernels cover the common frames; pass any custom
``kernel(sorted_frame, new_key_mask) -> DataFrame`` for the rest. The
relational window queries (session ids, LAG deltas, as-of fill,
per-user stats) are thin wrappers over this module.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: multiplicative mix for the bucket hash (same constant the joins use)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash_partitioned_window(ds: rd.Dataset, partition_col: str,
                            order_cols: Sequence[str],
                            kernel: Callable[[pd.DataFrame, pd.Series],
                                             pd.DataFrame],
                            num_buckets: int = 32) -> rd.Dataset:
    """Run ``kernel`` over every partition, vectorized per bucket.

    ``kernel(g, new_key)`` receives the bucket frame ``g`` sorted by
    (partition_col, *order_cols) and a boolean Series ``new_key``
    marking each partition's first row; it must return a DataFrame of
    output rows (any shape — per-row windows or per-key aggregates).
    The partition column must be integer-typed (hash bucketing);
    string keys can pre-hash into an int column."""
    order_cols = list(order_cols)

    def tag(t: pa.Table) -> pa.Table:
        key = t[partition_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        mixed = (key * _MIX) >> np.uint64(32)
        b = pa.array((mixed % np.uint64(num_buckets)).astype(np.int32))
        # metadata-free blocks: parquet reads carry pandas key/value
        # schema metadata that Ray's sort can't hash (it warns per
        # reduce block when unified with metadata-free blocks)
        return t.replace_schema_metadata(None).append_column("__bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(
            [partition_col] + order_cols, kind="mergesort")
        new_key = g[partition_col].ne(g[partition_col].shift())
        return kernel(g, new_key)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pandas"))


# --- built-in kernels --------------------------------------------------------
def row_number_kernel(out_cols: Sequence[str], name: str = "row_number"):
    """1-based rank within the partition in order-column order."""
    def kernel(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        seq = np.arange(len(g), dtype=np.int64)
        base = pd.Series(seq, index=g.index).where(new_key).ffill()
        out = g[list(out_cols)].copy()
        out[name] = (seq - base.to_numpy() + 1).astype("int64")
        return out
    return kernel


def lag_kernel(col: str, out_cols: Sequence[str], name: str | None = None):
    """Previous row's ``col`` within the partition (NULL at starts)."""
    name = name or f"{col}_lag"

    def kernel(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        lagged = g[col].shift()
        lagged[new_key] = None
        out = g[list(out_cols)].copy()
        out[name] = lagged
        return out
    return kernel


def cumsum_kernel(col: str, out_cols: Sequence[str],
                  name: str | None = None):
    """Running total of ``col`` within the partition (inclusive)."""
    name = name or f"{col}_running"

    def kernel(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        s = g[col].cumsum()
        base = s.where(new_key).ffill() - g[col].where(new_key).ffill()
        out = g[list(out_cols)].copy()
        out[name] = s - base
        return out
    return kernel


def percent_rank_kernel(out_cols: Sequence[str],
                        name: str = "percent_rank",
                        order_cols: Sequence[str] | None = None):
    """SQL PERCENT_RANK(): (rank - 1) / (partition_rows - 1), 0.0 for
    single-row partitions — one IEEE division per row, bit-identical
    to the oracle's.

    Pass ``order_cols`` (the same columns given to
    ``hash_partitioned_window``) to get true SQL peer-group ranks —
    tied order keys share the rank of their run's first row. Without
    it the rank is the row position (ROW_NUMBER-based), which equals
    SQL PERCENT_RANK only when the order columns form a unique key
    within each partition."""
    order_cols = list(order_cols or [])

    def kernel(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        seq = np.arange(len(g), dtype=np.int64)
        nk = new_key.to_numpy()
        base = pd.Series(seq, index=g.index).where(nk).ffill().to_numpy()
        if order_cols:
            # peer-group rank: a row's rank is the 0-based position of
            # the first row of its tied run (new run when the partition
            # or any order column changes)
            new_peer = nk.copy()
            for c in order_cols:
                new_peer |= g[c].ne(g[c].shift()).to_numpy()
            peer_start = pd.Series(seq, index=g.index) \
                .where(new_peer).ffill().to_numpy()
            rank = peer_start - base
        else:
            rank = seq - base  # 0-based ROW_NUMBER rank
        # partition sizes: distance between consecutive starts
        starts = np.flatnonzero(nk)
        sizes = np.diff(np.append(starts, len(g)))
        n = np.repeat(sizes, sizes).astype(np.int64)
        out = g[list(out_cols)].copy()
        pr = np.zeros(len(g), dtype=np.float64)
        multi = n > 1
        pr[multi] = rank[multi] * 1.0 / (n[multi] - 1)
        out[name] = pr
        return out
    return kernel


def ntile_kernel(n: int, out_cols: Sequence[str], name: str = "ntile"):
    """SQL NTILE(n): split each partition into n buckets in order-column
    order, the first (rows % n) buckets one row larger — vectorized via
    the same rank/partition-size arrays as percent_rank. Partitions
    smaller than n give each row its own bucket (rank + 1), per SQL."""
    def kernel(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        seq = np.arange(len(g), dtype=np.int64)
        nk = new_key.to_numpy()
        base = pd.Series(seq, index=g.index).where(nk).ffill().to_numpy()
        rank = (seq - base).astype(np.int64)
        starts = np.flatnonzero(nk)
        sizes = np.diff(np.append(starts, len(g)))
        s = np.repeat(sizes, sizes).astype(np.int64)
        q, r = s // n, s % n
        cut = r * (q + 1)
        tile = np.where(rank < cut,
                        rank // np.maximum(q + 1, 1),
                        r + (rank - cut) // np.maximum(q, 1)) + 1
        out = g[list(out_cols)].copy()
        out[name] = tile.astype("int64")
        return out
    return kernel
