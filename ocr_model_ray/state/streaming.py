"""Incremental streaming state via raw Ray actors (SURVEY.md custom-
operator rule (c): only where the Dataset API can't express the
semantics — here, windowed state that must SURVIVE ACROSS feeds of an
unbounded, ordered stream).

``ShardedSessionizer`` partitions keys over a pool of state actors
(one per key-hash bucket). Batches are routed by key hash and must
arrive in non-decreasing event-time order per key (the caller's
contract, stated per ray_guide's streaming pattern). Each actor keeps
the open session per key; ``flush`` closes remaining sessions.

For BOUNDED data, `pipelines.relational.events_sessions` (one
`groupby(key).map_groups` over sorted groups) is the right shape — this
module exists for the genuinely incremental case (e.g. a log tailer
feeding chunks), and its results are tested equal to the batch
operator's.
"""

from __future__ import annotations

import zlib
from collections import defaultdict

import pandas as pd
import ray


@ray.remote
class _SessionShard:
    """State actor for one key bucket: open-session tracking."""

    def __init__(self, gap_seconds: float) -> None:
        self.gap = gap_seconds
        self.last_ts: dict = {}        # key -> last event ts (epoch seconds)
        self.closed: dict = defaultdict(int)   # key -> closed session count
        self.events: dict = defaultdict(int)   # key -> event count

    def ingest(self, keys: list, ts_seconds: list) -> int:
        """Feed (key, ts) pairs; ts non-decreasing per key across calls."""
        for k, t in zip(keys, ts_seconds):
            last = self.last_ts.get(k)
            if last is not None and (t - last) > self.gap:
                self.closed[k] += 1
            self.last_ts[k] = t
            self.events[k] += 1
        return len(keys)

    def flush(self) -> dict:
        """Close all open sessions; return per-key totals."""
        out = {}
        for k in self.events:
            n_open = 1 if k in self.last_ts else 0
            out[k] = {"n_sessions": self.closed[k] + n_open,
                      "n_events": self.events[k]}
        return out


class ShardedSessionizer:
    """Driver-side facade: routes batches to shards, merges flush."""

    def __init__(self, num_shards: int = 4, gap_minutes: float = 30.0) -> None:
        self.num_shards = num_shards
        self.shards = [_SessionShard.remote(gap_minutes * 60.0)
                       for _ in range(num_shards)]

    @staticmethod
    def _norm_key(key):
        """Canonical key: integral VALUES become python int (so int64 7,
        numpy 7 and '7'-as-object are ONE key — same shard AND same
        per-key state); everything else (inf/NaN/Decimal oddities
        included — hence the broad except) keys by its value as-is."""
        try:
            v = int(key)
        except Exception:  # noqa: BLE001 — inf=OverflowError, etc.
            return key
        return v if v == key or isinstance(key, str) else key

    def _shard_of(self, key) -> int:
        key = self._norm_key(key)
        if isinstance(key, int):
            # pure-int twin of the vectorized uint64 multiplicative
            # hash in ingest_batch (identical results, no numpy boxing)
            h = ((key & 0xFFFFFFFFFFFFFFFF) * 0x9E3779B97F4A7C15) \
                & 0xFFFFFFFFFFFFFFFF
            return (h >> 33) % self.num_shards
        return zlib.crc32(str(key).encode()) % self.num_shards

    def ingest_batch(self, df: pd.DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts") -> None:
        """Route one (already per-key-time-ordered) batch to the shards.
        Shard assignment is vectorized (numpy multiplicative hash for
        integer keys; crc32 fallback otherwise); mask selection keeps
        per-key event order intact."""
        import numpy as np
        # unit-safe epoch seconds (datetime64[us].astype(int64) would give
        # MICROseconds; dividing by a Timedelta is unit-independent)
        ts = (pd.to_datetime(df[ts_col]) - pd.Timestamp(0)) / pd.Timedelta(seconds=1)
        keys = df[key_col].to_numpy()
        if np.issubdtype(keys.dtype, np.integer):
            with np.errstate(over="ignore"):
                shards = ((keys.astype(np.uint64)
                           * np.uint64(0x9E3779B97F4A7C15))
                          >> np.uint64(33)) % np.uint64(self.num_shards)
            shards = shards.astype(np.int64)
        else:
            # normalize the VALUES too, not just the routing: the shard
            # actors key their state dicts by the shipped value, so
            # int64 7 and '7'-as-object must arrive as the same key
            keys = np.array([self._norm_key(k) for k in keys],
                            dtype=object)
            shards = np.fromiter(
                (self._shard_of(k) for k in keys),
                dtype=np.int64, count=len(keys))
        tsv = ts.to_numpy(dtype=np.float64)
        refs = []
        for s in np.unique(shards):
            m = shards == s
            refs.append(self.shards[int(s)].ingest.remote(
                keys[m].tolist(), tsv[m].tolist()))
        ray.get(refs)

    def finalize(self, key_col: str = "user_id") -> pd.DataFrame:
        parts = ray.get([s.flush.remote() for s in self.shards])
        rows = []
        for part in parts:
            for k, v in part.items():
                rows.append({key_col: k, **v})
        return (pd.DataFrame(rows)
                .sort_values(key_col).reset_index(drop=True)
                if rows else pd.DataFrame(columns=[key_col, "n_sessions",
                                                   "n_events"]))


@ray.remote
class _WatermarkShard:
    """State actor for one key bucket with OUT-OF-ORDER arrivals:
    events buffer per key until the shard watermark (max event time
    seen minus allowed lateness) passes them, then apply to the gap
    logic in event-time order. Events older than their key's already-
    finalized frontier count as ``late_dropped`` instead of silently
    corrupting session state — the Flink/Beam watermark contract."""

    def __init__(self, gap_seconds: float, lateness_seconds: float) -> None:
        self.gap = gap_seconds
        self.lateness = lateness_seconds
        self.max_ts = float("-inf")          # shard watermark source
        self.pending: dict = defaultdict(list)   # key -> unsorted ts buffer
        self.frontier: dict = {}             # key -> last FINALIZED ts
        self.closed: dict = defaultdict(int)
        self.events: dict = defaultdict(int)
        self.late_dropped: dict = defaultdict(int)

    def _advance(self, key, upto: float) -> None:
        """Finalize this key's buffered events with ts <= upto; drained
        buffers leave the pending dict (so advance cost tracks ACTIVE
        keys, not every key ever seen)."""
        buf = self.pending.get(key)
        if not buf:
            self.pending.pop(key, None)
            return
        buf.sort()
        i = 0
        for t in buf:
            if t > upto:
                break
            last = self.frontier.get(key)
            if last is not None and (t - last) > self.gap:
                self.closed[key] += 1
            self.frontier[key] = t
            self.events[key] += 1
            i += 1
        if i == len(buf):
            del self.pending[key]
        else:
            del buf[:i]

    def ingest(self, keys: list, ts_seconds: list) -> int:
        touched = set()
        prev_wm = self.max_ts - self.lateness
        for k, t in zip(keys, ts_seconds):
            fr = self.frontier.get(k)
            if fr is not None and t < fr:
                # beyond allowed lateness: its position in the session
                # sequence was already finalized
                self.late_dropped[k] += 1
                continue
            self.pending[k].append(t)
            touched.add(k)
            if t > self.max_ts:
                self.max_ts = t
        watermark = self.max_ts - self.lateness
        # keys not in this batch only need re-examination when the
        # watermark MOVED; otherwise their buffers can't have ripened
        scan = list(self.pending) if watermark > prev_wm else touched
        for k in scan:
            self._advance(k, watermark)
        return len(keys)

    def flush(self) -> dict:
        for k in list(self.pending):
            self._advance(k, float("inf"))
        out = {}
        for k in set(self.events) | set(self.late_dropped):
            n_open = 1 if k in self.frontier else 0
            out[k] = {"n_sessions": self.closed[k] + n_open,
                      "n_events": self.events[k],
                      "late_dropped": self.late_dropped[k]}
        return out


class WatermarkSessionizer(ShardedSessionizer):
    """Sessionization over an out-of-order stream: same sharded
    routing as ShardedSessionizer, but each shard buffers events and
    finalizes only up to ``max_event_time - allowed_lateness``. With
    lateness >= the stream's maximum disorder the result is EXACTLY the
    in-order/batch sessionizer's (pinned by test); later events are
    counted per key in ``late_dropped`` rather than corrupting state."""

    def __init__(self, num_shards: int = 4, gap_minutes: float = 30.0,
                 lateness_minutes: float = 10.0) -> None:
        self.num_shards = num_shards
        self.shards = [_WatermarkShard.remote(gap_minutes * 60.0,
                                              lateness_minutes * 60.0)
                       for _ in range(num_shards)]

    def finalize(self, key_col: str = "user_id") -> pd.DataFrame:
        out = super().finalize(key_col)
        if "late_dropped" not in out.columns:  # empty stream: the
            # parent's typed-empty fallback lacks this class's column
            out["late_dropped"] = pd.Series([], dtype="int64")
        return out
