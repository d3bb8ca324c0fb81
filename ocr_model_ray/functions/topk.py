"""Distributed top-k without a global sort shuffle.

A full ``ds.sort(...).limit(k)`` moves every row; for top-k the only
rows that can matter are each block's local top-k. So: per-batch
partial top-k inside ``map_batches`` (vectorized pandas nlargest /
sort_values), then one tiny driver-side merge. Data moved: k rows per
block instead of all rows.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import ray.data as rd


def topk(ds: rd.Dataset, by: Sequence[str], k: int,
         descending: Sequence[bool] | bool = True) -> pd.DataFrame:
    """Global top-k rows ordered by ``by`` (ties broken by the later
    columns — include a unique key for determinism)."""
    by = list(by)
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    ascending = [not d for d in descending]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) <= k:
            return df
        return df.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    small = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if small.empty and not set(by).issubset(small.columns):
        return small  # schema-less all-empty collect; caller types it
    return (small.sort_values(by, ascending=ascending, kind="mergesort")
            .head(k).reset_index(drop=True))


def grouped_topk(ds: rd.Dataset, group_cols: Sequence[str],
                 by: Sequence[str], k: int,
                 descending: Sequence[bool] | bool = False) -> pd.DataFrame:
    """Top-k rows PER GROUP (windowed-rank shape, the stratified-sample
    primitive). Per-group top-k is associative, so each block prunes to
    its own per-group top-k first and only ``k x groups`` rows per
    block ever move; the driver-side final merge holds at most
    ``k x n_groups`` rows — fine for k-per-stratum sampling; for
    millions of groups route the partials through
    ``groupby(group).map_groups`` instead."""
    group_cols = list(group_cols)
    by = list(by)
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    ascending = [not d for d in descending]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a null group is its own partition, like SQL's
        # PARTITION BY (pandas would silently discard those rows)
        return (df.sort_values(by, ascending=ascending, kind="mergesort")
                .groupby(group_cols, sort=False, dropna=False).head(k))

    small = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if small.empty and not set(by).issubset(small.columns):
        return small  # schema-less all-empty collect; caller types it
    return (small.sort_values(by, ascending=ascending, kind="mergesort")
            .groupby(group_cols, sort=False, dropna=False).head(k)
            .sort_values(group_cols + by, ascending=[True] * len(group_cols)
                         + ascending, kind="mergesort")
            .reset_index(drop=True))
