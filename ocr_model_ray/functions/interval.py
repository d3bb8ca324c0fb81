"""Interval (range) join: match right-side rows whose timestamp falls
in a left-side row's [t, t + window) band — no equality key at all.

Engine extension (no reference counterpart): the canonical distributed
plan for temporal band joins at 10^12 rows, where neither side is
broadcastable and sort-merge over the whole time axis would serialize:

1. Time is cut into fixed EPOCHS at least as wide as the window.
   Every right row belongs to exactly ONE epoch; every left row's
   band overlaps at most TWO, so the left side replicates <= 2x —
   bounded fan-out, no quadratic expansion.
2. Both sides hash-shuffle ONCE on the epoch id (the same bucketed
   shuffle the window operator uses). Inside a bucket, each epoch's
   right timestamps sort once and every left band resolves to a
   ``searchsorted`` pair — vectorized over all left rows at once.
3. Per-replica partial counts (zeros included, so unmatched left rows
   survive — LEFT-join semantics) complete in one tiny groupby over
   the left key.

Skew note: a hot epoch costs one bucket; within the bucket the work is
O((L + R) log R) — no per-key Python, no cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .window import hash_partitioned_window

_US_PER_DAY = 86_400_000_000


def interval_count_join(left: rd.Dataset, right: rd.Dataset,
                        left_key: str, left_time: str, right_time: str,
                        window_us: int, epoch_us: int | None = None,
                        num_buckets: int = 32,
                        out_name: str = "n_matches",
                        mode: str = "distributed") -> rd.Dataset:
    """Per-left-row count of right rows with
    ``right_time in [left_time, left_time + window_us)``.

    Returns a Dataset of (left_key, out_name) — one row per left row
    (zero counts included). ``epoch_us`` defaults to the smallest
    multiple of the window >= 1 day (epochs must be >= the window so a
    band spans at most two).

    ``mode='local'`` is the usual small-input plan (caller knows both
    sides are tiny from parquet metadata): the prepped rows collect
    once and the identical epoch kernel runs in-process, skipping the
    two shuffles' fixed cost. Pinned equal to distributed by test."""
    if epoch_us is None:
        epoch_us = max(window_us, _US_PER_DAY)
    if epoch_us < window_us:
        raise ValueError("epoch_us must be >= window_us")

    def lprep(t: pa.Table) -> pa.Table:
        lo = pc.cast(t[left_time], pa.int64()).to_numpy(
            zero_copy_only=False)
        key = t[left_key].to_numpy(zero_copy_only=False)
        hi = lo + window_us
        e0 = lo // epoch_us
        e1 = (hi - 1) // epoch_us
        # replica per touched epoch (1 or 2)
        two = e1 != e0
        ep = np.concatenate([e0, e1[two]])
        k = np.concatenate([key, key[two]])
        lo2 = np.concatenate([lo, lo[two]])
        hi2 = np.concatenate([hi, hi[two]])
        return pa.table({
            "__epoch": pa.array(ep, pa.int64()),
            "is_left": pa.array(np.ones(len(ep), np.int8)),
            "key": pa.array(k.astype(np.int64)),
            "lo": pa.array(lo2, pa.int64()),
            "hi": pa.array(hi2, pa.int64()),
            "ts": pa.array(np.zeros(len(ep), np.int64)),
        })

    def rprep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[right_time], pa.int64()).to_numpy(
            zero_copy_only=False)
        ep = ts // epoch_us
        n = len(ts)
        return pa.table({
            "__epoch": pa.array(ep, pa.int64()),
            "is_left": pa.array(np.zeros(n, np.int8)),
            "key": pa.array(np.zeros(n, np.int64)),
            "lo": pa.array(np.zeros(n, np.int64)),
            "hi": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(ts, pa.int64()),
        })

    both = left.map_batches(lprep, batch_format="pyarrow").union(
        right.map_batches(rprep, batch_format="pyarrow"))

    def kernel(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        # g sorted by __epoch; resolve each epoch run independently
        ep = g["__epoch"].to_numpy()
        isl = g["is_left"].to_numpy().astype(bool)
        keys, cnts = [], []
        starts = np.flatnonzero(new_key.to_numpy())
        ends = np.append(starts[1:], len(ep))
        for st, en in zip(starts, ends):
            sl = slice(st, en)
            lmask = isl[sl]
            lkey = g["key"].to_numpy()[sl][lmask]
            if lkey.size == 0:
                continue
            lo = g["lo"].to_numpy()[sl][lmask]
            hi = g["hi"].to_numpy()[sl][lmask]
            ts = np.sort(g["ts"].to_numpy()[sl][~lmask])
            # count only this epoch's right rows: the band is clipped
            # implicitly because ts all lie inside the epoch
            c = (np.searchsorted(ts, hi, side="left")
                 - np.searchsorted(ts, lo, side="left"))
            keys.append(lkey)
            cnts.append(c)
        if not keys:
            return pd.DataFrame({"key": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        out = pd.DataFrame({"key": np.concatenate(keys),
                            "n": np.concatenate(cnts)})
        return (out.groupby("key", as_index=False)["n"].sum()
                .astype({"key": "int64", "n": "int64"}))

    # Ray collapses all-empty collects to schema-less frames/tables;
    # both plans must return the typed (left_key, out_name) shape anyway
    empty = pd.DataFrame({left_key: pd.Series([], dtype="int64"),
                          out_name: pd.Series([], dtype="int64")})

    if mode == "local":
        frame = both.to_pandas()
        if frame.empty or "__epoch" not in frame.columns:
            return rd.from_pandas(empty)
        frame = (frame.sort_values("__epoch", kind="mergesort")
                 .reset_index(drop=True))
        new_key = frame["__epoch"].ne(frame["__epoch"].shift())
        out = (kernel(frame, new_key)
               .groupby("key", as_index=False)["n"].sum()
               .rename(columns={"key": left_key, "n": out_name}))
        return rd.from_pandas(out.astype({left_key: "int64",
                                          out_name: "int64"}))

    partials = hash_partitioned_window(both, "__epoch", [], kernel,
                                       num_buckets=num_buckets)
    from .bucketed import bucketed_agg
    done = bucketed_agg(partials, "key", {out_name: ("n", "sum")})

    def rename(t: pa.Table) -> pa.Table:
        if t.num_columns != 2:
            return pa.Table.from_pandas(empty, preserve_index=False)
        return t.rename_columns([left_key, out_name])

    return done.map_batches(rename, batch_format="pyarrow")
