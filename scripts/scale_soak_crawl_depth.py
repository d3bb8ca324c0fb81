"""Round-4 soak: BFS crawl-depth assignment at volume, verified
against the closed-form truth of a constructed graph.

Graph: a K x W grid of hosts g<r>_<c> with edges g<r>_<c> ->
g<r+1>_<c> (down) and g<r>_<c> -> g<r>_<c+1> (right) — truth:
depth(g<r>_<c>) = r + c from seed g0_0 (every monotone lattice path
is shortest; the BFS min must pick r+c among the many candidate
paths). Plus M isolated 2-cycles (p<i> <-> q<i>) that must stay
unreached. max_depth caps the output at the diagonal r + c <=
max_depth, exercising the cap at volume.

Usage: python scripts/scale_soak_crawl_depth.py --rows 1000 --cols 1000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1000)
    ap.add_argument("--cols", type=int, default=1000)
    ap.add_argument("--cycles", type=int, default=100_000)
    ap.add_argument("--max-depth", type=int, default=12)
    ap.add_argument("--tree", type=int, default=0,
                    help="instead of the grid: complete binary tree "
                         "over hosts t1..tN (i -> 2i, 2i+1), seed t1; "
                         "truth depth(t_i) = floor(log2 i). Frontier "
                         "at level k is 2^k hosts — exercises the "
                         "broadcast path at million-host frontiers")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ocr_model_ray.functions.link_graph import crawl_depth

    R, C, M, CAP = args.rows, args.cols, args.cycles, args.max_depth

    if args.tree:
        from ocr_model_ray.functions.link_graph import crawl_depth
        N = args.tree
        t0 = time.time()
        # complete binary tree: every node i in 2..N has parent i//2
        kids = np.arange(2, N + 1)
        par = kids // 2
        src = np.char.add("t", par.astype(str))
        dst = np.char.add("t", kids.astype(str))
        edges = rd.from_pandas(pd.DataFrame(
            {"src_host": src, "dst_host": dst})) \
            .repartition(args.cpus * 4)
        build_s = time.time() - t0
        t0 = time.time()
        out = crawl_depth(edges, ["t1"], max_depth=CAP,
                          mode="distributed").to_pandas()
        run_s = time.time() - t0
        ids = np.arange(1, N + 1)
        depth_true = np.floor(np.log2(ids)).astype(np.int64)
        want = depth_true <= CAP
        truth = pd.DataFrame({
            "host": np.char.add("t", ids[want].astype(str)),
            "depth": depth_true[want]}).sort_values("host") \
            .reset_index(drop=True)
        got = out.sort_values("host").reset_index(drop=True)
        ok = (len(got) == len(truth)
              and (got["host"].to_numpy()
                   == truth["host"].to_numpy()).all()
              and (got["depth"].to_numpy()
                   == truth["depth"].to_numpy()).all())
        print(json.dumps({
            "tree": N, "edges": int(len(kids)), "max_depth": CAP,
            "reached": int(len(out)),
            "expected_reached": int(want.sum()), "tree_ok": bool(ok),
            "max_frontier": int(2 ** min(CAP, int(np.log2(N)))),
            "build_s": round(build_s, 1), "run_s": round(run_s, 1),
        }))
        sys.exit(0 if ok else 1)

    t0 = time.time()
    r = np.repeat(np.arange(R), C)
    c = np.tile(np.arange(C), R)

    def name(rr, cc):
        return np.char.add(np.char.add(
            np.char.add("g", rr.astype(str)), "_"), cc.astype(str))

    down_ok = r < R - 1
    right_ok = c < C - 1
    src = np.concatenate([name(r[down_ok], c[down_ok]),
                          name(r[right_ok], c[right_ok])])
    dst = np.concatenate([name(r[down_ok] + 1, c[down_ok]),
                          name(r[right_ok], c[right_ok] + 1)])
    cyc = np.arange(M).astype(str)
    src = np.concatenate([src, np.char.add("p", cyc),
                          np.char.add("q", cyc)])
    dst = np.concatenate([dst, np.char.add("q", cyc),
                          np.char.add("p", cyc)])
    edges = rd.from_pandas(pd.DataFrame({"src_host": src,
                                         "dst_host": dst})) \
        .repartition(args.cpus * 4)
    build_s = time.time() - t0

    t0 = time.time()
    out = crawl_depth(edges, ["g0_0"], max_depth=CAP,
                      mode="distributed").to_pandas()
    run_s = time.time() - t0

    want = r + c <= CAP
    truth = pd.DataFrame({"host": name(r[want], c[want]),
                          "depth": (r + c)[want].astype("int64")})
    got = out.sort_values("host").reset_index(drop=True)
    truth = truth.sort_values("host").reset_index(drop=True)
    grid_ok = (len(got) == len(truth)
               and (got["host"].to_numpy() == truth["host"].to_numpy()).all()
               and (got["depth"].to_numpy()
                    == truth["depth"].to_numpy()).all())
    cycles_ok = not out["host"].str.startswith(("p", "q")).any()

    print(json.dumps({
        "edges": int(len(src)), "grid": [R, C], "cycles": M,
        "max_depth": CAP, "reached": int(len(out)),
        "expected_reached": int(want.sum()),
        "grid_ok": bool(grid_ok), "cycles_ok": bool(cycles_ok),
        "build_s": round(build_s, 1), "run_s": round(run_s, 1),
        "edges_per_sec": round(len(src) / max(run_s, 1e-9), 1),
    }))
    if not (grid_ok and cycles_ok):
        sys.exit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
