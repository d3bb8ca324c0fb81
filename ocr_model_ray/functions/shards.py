"""Deterministic global pseudo-shuffle + training shard assignment.

The last step of a training-data pipeline is writing the curated
corpus out as fixed-size shards in a RANDOM-LOOKING but reproducible
global order (so data-parallel trainers stream i.i.d.-ish batches and
a re-run of the job bit-reproduces the shard layout). The reference's
export stage writes per-job result files in deterministic document
order (worker/pipeline/exporters, cited in stages/export.py); this
operator supplies the corpus-scale equivalent: a frozen total order
``(md5(CAST(id AS VARCHAR)), id)`` — the same engine-independent
shuffle key the repo's deterministic samplers and
``tiers.token_budget_select`` use — with every document assigned

    rank  = ROW_NUMBER() OVER (ORDER BY md5, id) - 1
    shard = rank // shard_size
    pos   = rank %  shard_size

``ray.data.Dataset.random_shuffle`` is the built-in alternative; it
is a full materializing exchange of the PAYLOAD bytes and its order
is seed-and-partitioning dependent, so it can't back a byte-stable
resume contract. Here payloads never move at all: the output is the
(id, rank, shard, pos) assignment table; the writer joins it back (or
feeds ``checkpoint.run_sharded``) and each shard directory is
independently resumable.

Distributed plan — NO global sort, one narrow exchange:

1. one streaming combiner pass counts docs per md5 hex-prefix bin
   (``16^bin_hex`` bins; the per-batch partial is a bincount, so the
   exchange is at most ``bins`` rows per block);
2. the driver folds the tiny (bin, n) sketch and prefix-sums it in
   bin order: ``prefix[b]`` = number of docs in every earlier bin =
   the global rank of bin ``b``'s first doc;
3. ONE bucketed exchange ships only ``(bin, id)`` rows (16 B/doc —
   the md5 is recomputed bin-locally rather than shipped at 32 B);
   each bin sorts its own rows by (md5, id) and emits
   ``prefix[bin] + arange`` ranks.

md5 is uniform, so bins are balanced by construction: a bin holds
``n_docs / 16^bin_hex`` docs in expectation (raise ``bin_hex`` for a
bigger corpus — at 10^12 docs, ``bin_hex=6`` keeps a bin under 60k
rows while the driver sketch stays a 16.7M-entry int64 array).

``id_col`` must be a unique int64 key (doc_id/url id); duplicate ids
would tie in the ORDER BY and make ROW_NUMBER engine-dependent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .tiers import _id_md5

#: md5 hex digits for the distributed rank bins (16^3 = 4096 bins)
DEFAULT_BIN_HEX = 3


def _empty_assign(id_col: str) -> pd.DataFrame:
    return pd.DataFrame({
        id_col: pd.Series([], dtype="int64"),
        "rank": pd.Series([], dtype="int64"),
        "shard": pd.Series([], dtype="int64"),
        "pos": pd.Series([], dtype="int64")})


def _finish(ids: np.ndarray, rank: np.ndarray, shard_size: int,
            id_col: str) -> pd.DataFrame:
    return pd.DataFrame({
        id_col: ids.astype(np.int64),
        "rank": rank.astype(np.int64),
        "shard": (rank // shard_size).astype(np.int64),
        "pos": (rank % shard_size).astype(np.int64)})


def global_shuffle_shards(ds: rd.Dataset, shard_size: int,
                          id_col: str = "doc_id",
                          bin_hex: int = DEFAULT_BIN_HEX,
                          mode: str = "auto") -> rd.Dataset:
    """(id, rank, shard, pos) for every row of ``ds`` under the frozen
    pseudo-shuffle order — see the module docstring for the plan.
    Output is unordered (sort downstream if needed); bit-identical
    across plans, partitionings and reruns."""
    if shard_size < 1:
        raise ValueError("shard_size must be >= 1")
    if not 1 <= bin_hex <= 7:
        raise ValueError("bin_hex must be in 1..7")
    from .dedup_algos import _resolve_mode

    n_bins = 16 ** bin_hex

    if _resolve_mode(ds, mode) == "local":
        def only_ids(t: pa.Table) -> pa.Table:
            return t.select([id_col]).replace_schema_metadata(None)

        frame = ds.map_batches(only_ids, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        if frame.empty or id_col not in frame.columns:
            return rd.from_pandas(_empty_assign(id_col))
        ids = frame[id_col].to_numpy().astype(np.int64)
        h = _id_md5(ids)
        order = np.lexsort((ids, h))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = np.arange(len(ids), dtype=np.int64)
        return rd.from_pandas(_finish(ids, rank, shard_size, id_col))

    def binned_counts(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table({"b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        h = _id_md5(ids)
        b = np.fromiter((int(x[:bin_hex], 16) for x in h),
                        count=len(h), dtype=np.int64)
        u, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    folded = ds.map_batches(binned_counts, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    if folded.empty or "b" not in folded.columns:
        return rd.from_pandas(_empty_assign(id_col))
    per_bin = np.zeros(n_bins, dtype=np.int64)
    g = folded.groupby("b")["n"].sum()
    per_bin[g.index.to_numpy()] = g.to_numpy()
    prefix = np.concatenate(([0], np.cumsum(per_bin)[:-1]))

    import ray
    pref = ray.put(prefix)

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int64())})
        h = _id_md5(ids)
        b = np.fromiter((int(x[:bin_hex], 16) for x in h),
                        count=len(h), dtype=np.int64)
        return pa.table({id_col: pa.array(ids.astype(np.int64)),
                         "__b": pa.array(b)})

    def per_bin_rank(gdf: pd.DataFrame) -> pd.DataFrame:
        base = int(ray.get(pref)[int(gdf["__b"].iat[0])])
        ids = gdf[id_col].to_numpy().astype(np.int64)
        h = _id_md5(ids)
        order = np.lexsort((ids, h))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = base + np.arange(len(ids), dtype=np.int64)
        return _finish(ids, rank, shard_size, id_col)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bin_rank,
                                       batch_format="pandas"))
