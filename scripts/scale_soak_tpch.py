"""Relational scale soak: run the heavy TPC-H-shape queries through
their DISTRIBUTED plans on fact tables replicated above the 128 MB
size cut, verifying each against DuckDB on the same parquet.

    python scripts/scale_soak_tpch.py [--replicas 48] [--queries all]

Corpus: sf0.1 lineitem + orders replicated R times with order keys
offset per replica (per-order groups stay intact; per-customer /
per-supplier / per-part groups grow R-fold — the hot-key direction),
dims symlinked unchanged. Tables are DIRECTORIES of part files, the
shape real partitioned tables have, so this also exercises the
dir-aware size cut. Prints one JSON line per query:
{query, seconds, rows, match, oracle_seconds}.
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

REPLICATED = {"lineitem": ("l_orderkey",), "orders": ("o_orderkey",)}
DIMS = ["region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings"]


def build_corpus(replicas: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SOAK_DIR, f"tpch_x{replicas}")
    marker = out + "._DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    for t, keycols in REPLICATED.items():
        base = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        span = 1 + max(int(pa.compute.max(base[k]).as_py())
                       for k in keycols)
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        for r in range(replicas):
            dst = os.path.join(d, f"part_{r:04d}.parquet")
            if os.path.exists(dst):
                continue  # resumable build (atomic writes below)
            cols = {}
            for name in base.column_names:
                col = base[name]
                if name in keycols:
                    col = pa.compute.add(col, r * span)
                cols[name] = col
            pq.write_table(pa.table(cols), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
    open(marker, "w").write("ok")
    return out


def make_oracle(dir_: str):
    import duckdb
    con = duckdb.connect()
    for t in DIMS + list(REPLICATED):
        p = os.path.join(dir_, f"{t}.parquet")
        src = f"{p}/part_*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{src}')")
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=48)
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
    assert _join_mode(corpus, "lineitem") == "distributed", \
        "soak corpus must exceed the size cut"

    import __ray_entry__ as em
    import tests.test_queries_oracle as tq
    import numpy as np
    import pandas as pd

    con = make_oracle(corpus)
    names = ["q1_pricing_summary", "q10_returned_revenue",
             "q13_customer_distribution", "q18_large_orders",
             "supplier_revenue", "q11_important_parts",
             "q16_supplier_part_counts",
             "q3_top_orders", "q5_region_revenue",
             "q4_priority_returned", "q12_priority_lines",
             "q9_product_profit", "q21_waiting_supplier",
             "q7_nation_volume", "order_priority_counts",
             "q2_min_cost_supplier", "q17_small_qty_revenue"]
    if args.queries != "all":
        names = [n for n in names if n in args.queries.split(",")]

    qs, sqls = em.queries(), em.oracle_sql()
    all_ok = True
    for name in names:
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
    print(json.dumps({"soak": "PASS" if all_ok else "FAIL"}))
    ray.shutdown()
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
