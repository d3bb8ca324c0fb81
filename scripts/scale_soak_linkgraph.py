"""Round-4 soak: the distributed fixed-point PageRank matches the
single-frame reference BIT-EXACTLY at volume, with bounded iteration
cost after the block-compaction fix.

Synthesizes an edge stream of ``--docs`` documents over ``--hosts``
hosts (1-4 outlinks per doc, multiplicative host mixing — a skewed
graph with hubs, sinks, self-loops and repeated edges), runs
``pagerank_hosts(mode='distributed')`` (edges enter as a many-block
Dataset, every iteration is Dataset-resident), and compares every
``rank_fp`` against ``_pagerank_frame`` computed independently on the
collected distinct edge set. Integer fixed point means the comparison
is equality, not tolerance.

Usage: python scripts/scale_soak_linkgraph.py --docs 2000000 --hosts 100000
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
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--hosts", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--iter-plan", default="auto",
                choices=["auto", "exchange", "broadcast"])
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ocr_model_ray.functions.link_graph import (_pagerank_frame,
                                                    pagerank_hosts)

    H = args.hosts

    def edges_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        counts = 1 + (ids % 4)
        rep = np.repeat(ids, counts)
        ends = np.cumsum(counts)
        j = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
            - np.repeat(ends - counts, counts)
        src = rep % H
        dst = (rep * 2654435761 + j * 40503 + 17) % H
        return pa.table({"src_host": pa.array(
                             [f"h{v}.soak.org" for v in src.tolist()]),
                         "dst_host": pa.array(
                             [f"h{v}.soak.org" for v in dst.tolist()])})

    ids = rd.range(args.docs).map_batches(
        lambda t: pa.table({"doc_id": t["id"]}), batch_format="pyarrow")
    edges = ids.map_batches(edges_batch, batch_format="pyarrow")

    t0 = time.monotonic()
    out = pagerank_hosts(edges, iters=args.iters,
                         mode="distributed",
                         iter_plan=args.iter_plan).to_pandas()
    dist_s = time.monotonic() - t0

    # independent single-frame reference over the SAME edge multiset
    t0 = time.monotonic()
    frame = edges.to_pandas()
    ref = _pagerank_frame(frame, args.iters, "src_host", "dst_host")
    ref_s = time.monotonic() - t0

    out = out.sort_values("host").reset_index(drop=True)
    ref = ref.sort_values("host").reset_index(drop=True)
    hosts_equal = out["host"].tolist() == ref["host"].tolist()
    fp_equal = bool(hosts_equal
                    and (out["rank_fp"].to_numpy()
                         == ref["rank_fp"].to_numpy()).all())

    result = {
        "docs": args.docs, "hosts_param": H,
        "edges": int(len(frame)),
        "hosts_seen": int(len(ref)),
        "iters": args.iters,
        "iter_plan": args.iter_plan,
        "distributed_sec": round(dist_s, 1),
        "reference_sec": round(ref_s, 1),
        "rank_fp_bit_equal": fp_equal,
        "pass": fp_equal,
    }
    print(json.dumps(result))
    ray.shutdown()
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
