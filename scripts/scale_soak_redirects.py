"""Round-4 soak: redirect-chain resolution (pointer doubling) at
volume, verified against the closed-form truth of a constructed
functional graph.

Graph: K chains of length L (srcs ``c<i>_<j>`` -> ``c<i>_<j+1>``,
terminal ``c<i>_<L>``) plus M 2-cycles (``p<i> <-> q<i>``). Truth per
construction: chain src at depth j resolves to the chain terminal in
L - j hops when L - j <= max_hops, else NULL; every cycle src is
NULL. With L > max_hops both cap behaviors are exercised at volume.

Checks: the distributed plan's full output EQUALS the closed form —
every final and every hop count, no extras.

Usage: python scripts/scale_soak_redirects.py --chains 50000 --length 100
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
    ap.add_argument("--chains", type=int, default=50_000)
    ap.add_argument("--length", type=int, default=100)
    ap.add_argument("--cycles", type=int, default=100_000)
    ap.add_argument("--max-hops", type=int, default=32)
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

    from ocr_model_ray.functions.url_ops import resolve_redirects

    K, L, M, CAP = args.chains, args.length, args.cycles, args.max_hops

    t0 = time.time()
    ci = np.repeat(np.arange(K), L)
    cj = np.tile(np.arange(L), K)
    chain_src = np.char.add(np.char.add(
        np.char.add("c", ci.astype(str)), "_"), cj.astype(str))
    chain_dst = np.char.add(np.char.add(
        np.char.add("c", ci.astype(str)), "_"), (cj + 1).astype(str))
    cyc = np.arange(M).astype(str)
    src = np.concatenate([chain_src, np.char.add("p", cyc),
                          np.char.add("q", cyc)])
    dst = np.concatenate([chain_dst, np.char.add("q", cyc),
                          np.char.add("p", cyc)])
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})) \
        .repartition(args.cpus * 4)
    build_s = time.time() - t0

    t0 = time.time()
    out = resolve_redirects(edges, max_hops=CAP,
                            mode="distributed").to_pandas()
    run_s = time.time() - t0

    # closed-form truth, vectorized
    n_edges = len(src)
    assert len(out) == n_edges, (len(out), n_edges)
    out = out.set_index("src")
    got_final = out["final"].to_numpy()
    got_hops = out["hops"].to_numpy()

    truth_final = np.where(
        L - cj <= CAP,
        np.char.add(np.char.add("c", ci.astype(str)), f"_{L}"), None)
    truth_hops = np.where(L - cj <= CAP, L - cj, 0)
    cf = out.loc[chain_src]
    chain_ok = (
        (cf["hops"].to_numpy() == truth_hops).all()
        and (pd.Series(cf["final"].to_numpy()).fillna("\0")
             == pd.Series(truth_final).fillna("\0")).all())
    cyc_rows = out.loc[np.concatenate([np.char.add("p", cyc),
                                       np.char.add("q", cyc)])]
    cycle_ok = (cyc_rows["final"].isna().all()
                and (cyc_rows["hops"] == 0).all())

    print(json.dumps({
        "edges": n_edges, "chains": K, "length": L, "cycles": M,
        "max_hops": CAP, "chain_ok": bool(chain_ok),
        "cycle_ok": bool(cycle_ok),
        "resolved": int((got_hops > 0).sum()),
        "gave_up": int(pd.isna(got_final).sum()),
        "build_s": round(build_s, 1), "run_s": round(run_s, 1),
        "edges_per_sec": round(n_edges / max(run_s, 1e-9), 1),
    }))
    if not (chain_ok and cycle_ok):
        sys.exit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
