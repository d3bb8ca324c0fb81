"""Round-5 soak: HyperBall as the documented SCALE PATH for harmonic
centrality (round-4 verdict #7) — run the distributed HyperBall
sketch over a >=1M-host graph where exact truncated harmonic is
computable per sampled host, and check the estimates land within the
sketch's documented error bound while the exact plan's exchange
volume is demonstrably infeasible at the same scale.

Graph: N prime; host h_i links to h_{(a*i+b) mod N} for three (a, b)
pairs — out-degree exactly 3, and because N is prime every node's
IN-neighbours are the three modular preimages (a^-1 * (v - b)), so a
driver-side reverse BFS gives the EXACT truncated harmonic
H(v) = sum_d n_d / d for any sampled host in O(3^depth) — no engine
code in the ground truth.

The estimator's advantage is quantified, not hand-waved: the exact
distributed plan's per-round state is the discovered (src, host)
PAIR set — sum of ball sizes, measured from the driver BFS sample —
while HyperBall ships N x 2^p bytes per round. The soak reports
both volumes.

Usage: python scripts/scale_soak_hyperball.py --hosts 1000003
       python scripts/scale_soak_hyperball.py --hosts 10007 --p 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the three out-edge generators (a, b); a must be coprime with N
GENS = ((2, 1), (3, 7), (5, 13))
MAX_DEPTH = 8


def exact_harmonic(v: int, n: int) -> tuple[float, int]:
    """Driver-side reverse BFS: exact truncated harmonic of host v
    and its in-ball size (sources at distance 1..MAX_DEPTH)."""
    invs = [pow(a, -1, n) for a, _ in GENS]
    dist = {v: 0}
    q = deque([v])
    h = 0.0
    reached = 0
    while q:
        u = q.popleft()
        d = dist[u]
        if d == MAX_DEPTH:
            continue
        for (a, b), ai in zip(GENS, invs):
            w = (ai * (u - b)) % n
            if w not in dist:
                dist[w] = d + 1
                h += 1.0 / (d + 1)
                reached += 1
                q.append(w)
    return h, reached


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=1_000_003,
                    help="node count; must be prime")
    ap.add_argument("--p", type=int, default=8,
                    help="HLL precision (2^p registers; rel std err "
                         "~1.04/sqrt(2^p): p=8 -> 6.5%%, p=10 -> 3.2%%)")
    ap.add_argument("--samples", type=int, default=60)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    N, P = args.hosts, args.p

    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ocr_model_ray.functions.link_graph import hyperball_centrality

    def synth(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["id"].to_numpy().astype(np.int64)
        srcs, dsts = [], []
        for a, c in GENS:
            srcs.append(ids)
            dsts.append((a * ids + c) % N)
        s = np.concatenate(srcs)
        d = np.concatenate(dsts)
        return pd.DataFrame({
            "src_host": pd.Series(s).map(lambda x: f"h{x}"),
            "dst_host": pd.Series(d).map(lambda x: f"h{x}")})

    t0 = time.time()
    edges = (rd.range(N).repartition(args.cpus * 2)
             .map_batches(synth, batch_format="pandas").materialize())
    build_s = round(time.time() - t0, 1)

    t0 = time.time()
    est = hyperball_centrality(edges, max_depth=MAX_DEPTH, p=P,
                               mode="distributed").to_pandas()
    hb_wall = round(time.time() - t0, 1)

    # exact ground truth for a deterministic host sample
    rng = np.random.RandomState(7)
    sample = sorted(int(x) for x in rng.choice(N, args.samples,
                                               replace=False))
    est_idx = est.set_index("host")
    rel_errs = []
    ball_sizes = []
    for v in sample:
        h_exact, ball = exact_harmonic(v, N)
        ball_sizes.append(ball)
        h_est = float(est_idx.loc[f"h{v}", "harmonic_est"])
        rel_errs.append(abs(h_est - h_exact) / max(h_exact, 1e-9))
    rel = np.array(rel_errs)
    sigma = 1.04 / np.sqrt(1 << P)

    # the exact distributed plan's per-round exchange is the pair
    # frontier: estimate its total volume from the sampled ball sizes
    mean_ball = float(np.mean(ball_sizes))
    exact_pair_rows = mean_ball * N           # ~sum of ball sizes
    hb_bytes_per_round = N * (1 << P)

    # bound: per-host harmonic is a sum of DIFFERENCES of HLL
    # estimates, so its error can exceed one counter's sigma; the
    # soak's pass bar is the paper-practical 3*sigma on the MEAN
    # error and 6*sigma on the worst sampled host
    ok = (float(rel.mean()) <= 3 * sigma
          and float(rel.max()) <= 6 * sigma)
    print(json.dumps({
        "soak": "hyperball", "hosts": N, "edges": 3 * N, "p": P,
        "cpus": args.cpus, "build_s": build_s,
        "hyperball_wall_s": hb_wall, "samples": len(sample),
        "mean_ball_size": round(mean_ball, 1),
        "rel_err_mean": round(float(rel.mean()), 4),
        "rel_err_max": round(float(rel.max()), 4),
        "sigma": round(sigma, 4),
        "exact_plan_pair_rows_est": int(exact_pair_rows),
        "hyperball_bytes_per_round": int(hb_bytes_per_round),
        "pass": bool(ok)}), flush=True)
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
