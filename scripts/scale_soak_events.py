"""Events/window scale soak: run the sessionization / window / pivot
queries through their DISTRIBUTED plans on an events table replicated
above the 128 MB size cut, verifying each against DuckDB on the same
parquet.

    python scripts/scale_soak_events.py [--replicas 100] [--queries all]

Corpus: sf0.1 events replicated R times with user_id and event_id
offset per replica — every user's event sequence (and thus every
session, window frame, and as-of chain) stays intact while the user
population grows R-fold, which is exactly how a sharded clickstream
scales. Tables are directories of part files. Prints one JSON line
per query: {query, seconds, rows, match, oracle_seconds}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SOAK_DIR = "/tmp/ocr_model_ray_soak"
OTHER = ["region", "nation", "customer", "supplier", "part",
         "orders", "lineitem", "documents", "embeddings"]


def build_corpus(replicas: int) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = os.path.join(SOAK_DIR, f"events_x{replicas}")
    marker = out + "._DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in OTHER:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    base = pq.read_table(os.path.join(SRC, "events.parquet"))
    uspan = 1 + int(pc.max(base["user_id"]).as_py())
    espan = 1 + int(pc.max(base["event_id"]).as_py())
    d = os.path.join(out, "events.parquet")
    os.makedirs(d, exist_ok=True)
    for r in range(replicas):
        dst = os.path.join(d, f"part_{r:04d}.parquet")
        if os.path.exists(dst):
            continue  # resumable build (atomic writes below)
        cols = {n: base[n] for n in base.column_names}
        cols["user_id"] = pc.add(base["user_id"], r * uspan)
        cols["event_id"] = pc.add(base["event_id"], r * espan)
        pq.write_table(pa.table(cols), dst + ".tmp")
        os.replace(dst + ".tmp", dst)
    open(marker, "w").write("ok")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--queries", default="all")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    corpus = build_corpus(args.replicas)
    from ocr_model_ray.pipelines.relational import _join_mode
    assert _join_mode(corpus, "events") == "distributed", \
        "soak corpus must exceed the size cut"

    import duckdb
    import numpy as np
    import pandas as pd
    import __ray_entry__ as em
    import tests.test_queries_oracle as tq

    con = duckdb.connect()
    for t in OTHER + ["events"]:
        p = os.path.join(corpus, f"{t}.parquet")
        src = f"{p}/part_*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{src}')")

    # queries with aggregated (not per-event) outputs — comparable at
    # 10M input rows without shipping 10M-row frames twice
    names = ["events_user_stats", "events_sessions", "events_daily",
             "events_type_pivot", "events_top_users_per_type",
             "events_sliding_week", "events_type_counts_salted",
             "events_props_stats", "events_rank_in_user",
             # per-user output (one row each): the argmax combiner's
             # exchange volume is the thing under test at this size
             "events_latest_per_user"]
    if args.queries != "all":
        names = [n for n in names if n in args.queries.split(",")]

    qs, sqls = em.queries(), em.oracle_sql()
    all_ok = True
    for name in names:
        if name not in qs or name not in sqls:
            continue
        t = time.time()
        got = tq._canon(tq._to_pandas(qs[name](corpus)))
        sec = round(time.time() - t, 2)
        t = time.time()
        want = tq._canon(con.sql(sqls[name]).df())
        osec = round(time.time() - t, 2)
        ok = len(got) == len(want) and list(got.columns) == list(want.columns)
        if ok:
            for c in got.columns:
                g = got[c].reset_index(drop=True)
                w = want[c].reset_index(drop=True)
                if pd.api.types.is_float_dtype(g):
                    ok &= bool(np.array_equal(
                        g.astype(float).values.view("int64"),
                        w.astype(float).values.view("int64")))
                else:
                    ok &= bool((g == w).all())
        print(json.dumps({"query": name, "seconds": sec,
                          "rows": len(got), "match": bool(ok),
                          "oracle_seconds": osec}), flush=True)
        all_ok &= ok
    # incremental streaming sessionizer (actor-per-key-bucket state):
    # feed the same 10M events in event-time order as a log tailer
    # would, then pin the per-user session panel EQUAL to the batch
    # operator (which the SQL oracle just verified above)
    if args.queries in ("all", "streaming_sessions"):
        import ray.data as rd
        from ocr_model_ray.state.streaming import ShardedSessionizer

        t = time.time()
        ds = rd.read_parquet(os.path.join(corpus, "events.parquet"),
                             columns=["user_id", "ts"]).sort("ts")
        sz = ShardedSessionizer(num_shards=8)  # facade over shard actors
        n_fed = 0
        for b in ds.iter_batches(batch_size=131072,
                                 batch_format="pandas"):
            sz.ingest_batch(b)
            n_fed += len(b)
        got = sz.finalize()
        sec = round(time.time() - t, 2)
        want = tq._canon(tq._to_pandas(qs["events_sessions"](corpus)))
        got = tq._canon(got)
        ok = (len(got) == len(want)
              and list(got.columns) == list(want.columns)
              and all((got[c].reset_index(drop=True)
                       == want[c].reset_index(drop=True)).all()
                      for c in got.columns))
        print(json.dumps({"query": "streaming_sessions", "seconds": sec,
                          "rows": len(got), "fed": n_fed,
                          "match": bool(ok)}), flush=True)
        all_ok &= ok

    # out-of-order watermark sessionizer: feed with BOUNDED DISORDER
    # (deterministic per-event jitter < allowed lateness), so the
    # watermark contract guarantees exact equality with the batch
    # operator and zero late drops — the Flink/Beam semantics at volume
    if args.queries in ("all", "watermark_sessions"):
        import pyarrow as pa
        import ray.data as rd
        from ocr_model_ray.state.streaming import WatermarkSessionizer

        t = time.time()
        MIX = np.uint64(0x9E3779B97F4A7C15)

        def jitter(tb: pa.Table) -> pa.Table:
            eid = tb["event_id"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            j = (((eid * MIX) >> np.uint64(33)) % np.uint64(300)) \
                .astype("timedelta64[s]")
            feed = tb["ts"].to_numpy(zero_copy_only=False) + j
            return pa.table({"user_id": tb["user_id"], "ts": tb["ts"],
                             "__feed": pa.array(feed)})

        ds = (rd.read_parquet(os.path.join(corpus, "events.parquet"),
                              columns=["user_id", "ts", "event_id"])
              .map_batches(jitter, batch_format="pyarrow")
              .sort("__feed"))
        wz = WatermarkSessionizer(num_shards=8, gap_minutes=30,
                                  lateness_minutes=10)
        n_fed = 0
        for b in ds.iter_batches(batch_size=131072,
                                 batch_format="pandas"):
            wz.ingest_batch(b[["user_id", "ts"]])
            n_fed += len(b)
        got = wz.finalize()
        sec = round(time.time() - t, 2)
        dropped = int(got["late_dropped"].sum())
        want = tq._canon(tq._to_pandas(qs["events_sessions"](corpus)))
        gotc = tq._canon(got.drop(columns=["late_dropped"]))
        ok = (dropped == 0 and len(gotc) == len(want)
              and list(gotc.columns) == list(want.columns)
              and all((gotc[c].reset_index(drop=True)
                       == want[c].reset_index(drop=True)).all()
                      for c in gotc.columns))
        print(json.dumps({"query": "watermark_sessions", "seconds": sec,
                          "rows": len(gotc), "fed": n_fed,
                          "late_dropped": dropped,
                          "match": bool(ok)}), flush=True)
        all_ok &= ok

    print(json.dumps({"soak": "PASS" if all_ok else "FAIL"}))
    ray.shutdown()
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
