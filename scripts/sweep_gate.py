"""Full-panel gate sweep: run every ``queries()`` entry side-by-side
with its ``oracle_sql()`` twin under the driver's own comparator shape
(columns sorted by name, bit-exact value compare — float columns via
int64 bit views, object columns with None==None) and print one line
per query plus a summary.

Usage: python scripts/sweep_gate.py [--sf /root/testdata/sf0.01]
                                    [--cpus 8] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bit_equal(got, want) -> tuple[bool, str]:
    import numpy as np
    import pandas as pd
    if list(got.columns) != list(want.columns):
        return False, f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return False, f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        g = got[c].reset_index(drop=True)
        w = want[c].reset_index(drop=True)
        if pd.api.types.is_float_dtype(g):
            if not np.array_equal(g.astype(float).values.view("int64"),
                                  w.astype(float).values.view("int64")):
                return False, f"float col {c}"
        else:
            eq = g == w
            both_na = g.isna() & w.isna()
            if not bool((eq | both_na).all()):
                return False, f"col {c}"
    return True, ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em
    import tests.test_queries_oracle as tq

    qs = em.queries()
    sqls = em.oracle_sql()
    names = sorted(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    t_all = time.time()
    n_pass = n_fail = 0
    fails: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            got = tq._canon(tq._to_pandas(qs[name](args.sf)))
            want = tq._canon(tq._oracle(args.sf, sqls[name]))
            ok, why = _bit_equal(got, want)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            ok, why = False, f"exception: {exc!r}"
        dt = time.time() - t0
        if ok:
            n_pass += 1
            print(f"PASS {dt:6.2f}s {name}", flush=True)
        else:
            n_fail += 1
            fails.append(name)
            print(f"FAIL {dt:6.2f}s {name}  ({why})", flush=True)
    print(f"\n{n_pass}/{n_pass + n_fail} pass in "
          f"{time.time() - t_all:.0f}s at {args.sf} "
          f"(cpus={args.cpus})")
    if fails:
        print("failing:", ",".join(fails))
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
