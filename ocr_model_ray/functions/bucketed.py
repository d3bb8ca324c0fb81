"""High-cardinality grouped aggregation — the bucket doctrine as a
reusable operator.

Ray Data's sort-based ``groupby(key).aggregate(...)`` pays
interpreter-level cost per GROUP on both the sort-map and reduce side.
That is fine for bounded key domains (return flags, priorities,
nations) and catastrophic at document / order / token cardinality:
measured on this box (32 CPUs), 5M rows with 1.25M distinct int64 keys
took >390 s (timed out) through ``Dataset.groupby().aggregate(Sum)``,
while the plan here took **1.9 s**. The md5-keyed exact-dedup case
measured 190 s -> 3.4 s at a 1.25M-doc soak (scripts/scale_soak.py).

Plan shape (same doctrine as ``window.hash_partitioned_window`` and
``joins.hash_bucket_join``): ONE wide exchange moves each row exactly
once into ``num_buckets`` int buckets derived from the key hash, and
every per-key aggregation inside a bucket is a single vectorized
pandas groupby — Python cost per BUCKET (dozens of calls), C per key.
Because the exchange is BY KEY HASH, a bucket holds every row of each
of its keys, so non-distributive aggregations (nunique, median) are
exact too, and hot keys cost one linear groupby, never a quadratic
step.

At 100 TB: the exchange volume equals the input row width — callers
should pre-aggregate per batch first when the aggregation is
distributive (the combiner pattern), then feed the partials here.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: multiplicative mix shared with the join/window bucket hashes
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_ids(t: pa.Table, keys: list[str],
                num_buckets: int) -> pa.Array:
    """Vectorized uniform bucket id over one or more key columns.
    Integer keys mix at C speed; strings go through pandas' cython
    siphash (``pd.util.hash_array``), never a Python loop per row."""
    acc = np.zeros(len(t), dtype=np.uint64)
    for k in keys:
        col = t[k].to_numpy(zero_copy_only=False)
        if np.issubdtype(col.dtype, np.integer):
            h = col.astype(np.uint64, copy=False) * _MIX
        else:
            h = pd.util.hash_array(np.asarray(col, dtype=object),
                                   categorize=False).astype(np.uint64)
        acc = acc * np.uint64(1099511628211) + (h >> np.uint64(16))
    out = ((acc * _MIX) >> np.uint64(32)) % np.uint64(num_buckets)
    return pa.array(out.astype(np.int32))


def bucketed_agg(ds: rd.Dataset, keys: str | Sequence[str],
                 aggs: dict[str, tuple[str, str]],
                 num_buckets: int = 64) -> rd.Dataset:
    """GROUP BY ``keys`` with per-key Python cost eliminated.

    ``aggs`` is pandas NamedAgg form: ``{out_col: (in_col, fn)}`` where
    ``fn`` is any pandas aggregation name (``sum``/``min``/``max``/
    ``size``/``count``/``nunique``/``mean``/...). Output: one row per
    distinct key combination, columns ``[*keys, *aggs]``, unordered
    (sort downstream if needed). An EMPTY input yields an empty,
    schema-less Dataset (Ray's map_groups emits no blocks for zero
    groups) — check ``.empty`` before touching columns, as the query
    pipelines do."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    named = {o: pd.NamedAgg(column=c, aggfunc=f)
             for o, (c, f) in aggs.items()}

    def tag(t: pa.Table) -> pa.Table:
        # metadata-free: mixed schema metadata trips Ray's sort-unify
        # hash (one warning per reduce block otherwise)
        return t.replace_schema_metadata(None).append_column(
            "__b", _bucket_ids(t, key_list, num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(key_list, as_index=False, sort=False,
                          dropna=False).agg(**named))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas"))


def bucketed_argmax(ds: rd.Dataset, keys: str | Sequence[str],
                    order_by: str,
                    tiebreak: Sequence[str] = (),
                    largest: bool = True,
                    num_buckets: int = 64) -> rd.Dataset:
    """One WHOLE ROW per key: the row with the largest (``largest=
    False``: smallest) ``order_by`` value — the latest-snapshot /
    latest-event reduce (keep the newest Common-Crawl capture per url,
    the last event per user). The same direction applies to the
    ``tiebreak`` columns; pass a unique column there for a fully
    deterministic winner (SQL twin: ``row_number() OVER (PARTITION BY
    keys ORDER BY order_by DESC, tiebreak DESC) = 1``).

    Per-key argmax is associative, so each block prunes to its own
    per-key winner first (one vectorized sort + drop_duplicates) and
    only ONE row per key per block enters the single bucketed exchange;
    the per-bucket reduce is the identical prune. Hot keys cost one
    linear pass, and the exchange volume is bounded by
    ``distinct_keys x blocks`` rows, not the input."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [order_by, *tiebreak]
    ascending = [not largest] * len(order_cols)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(order_cols, ascending=ascending,
                               kind="mergesort")
                .drop_duplicates(key_list, keep="first"))

    def tag(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None).append_column(
            "__b", _bucket_ids(t, key_list, num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return prune(g).drop(columns="__b")

    return (ds.map_batches(prune, batch_format="pandas")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas"))


def bucketed_distinct(ds: rd.Dataset, keys: str | Sequence[str],
                      num_buckets: int = 64) -> rd.Dataset:
    """DISTINCT ``keys`` (exact) with the same bucketed exchange —
    ``Dataset.unique``/``groupby().count()`` hit the per-group wall at
    high cardinality. Output: one row per distinct key combination.

    Each block pre-distincts BEFORE the exchange (distinct is
    idempotent, so block-local dedup then bucket dedup equals one
    global dedup): one Arrow hash pass per block bounds the exchange
    volume by ``distinct_keys x blocks`` rows instead of the input —
    the combiner doctrine, decisive on low-cardinality or duplicate-
    heavy streams (a host-graph edge scan collapses ~1.6M rows to a
    few hundred per block here)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def tag(t: pa.Table) -> pa.Table:
        t = t.select(key_list).group_by(key_list).aggregate([])
        return t.replace_schema_metadata(None).append_column(
            "__b", _bucket_ids(t, key_list, num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[key_list].drop_duplicates()

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas"))
