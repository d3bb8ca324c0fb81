"""Round-4 soak: the DISTRIBUTED near-dup plan produces its pairs with
BOUNDED DRIVER MEMORY — edges/candidates/verified pairs live in the
object store end-to-end (round-3 verdict #1's done criterion).

Runs near_dup_pairs_ds over the replica corpus (same builder as
scale_soak.py), consumes the pair Dataset by STREAMING it to parquet
(never .to_pandas()), and samples the driver process RSS throughout.
Reports peak driver RSS growth over the post-init baseline; the pass
bound is deliberately generous (driver growth must stay a small
constant, not O(pairs)) and the same bound is asserted at 1x and 10x
corpus scale by running the script twice.

Usage: python scripts/scale_soak_neardup_rss.py --replicas 25
       python scripts/scale_soak_neardup_rss.py --replicas 250
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_soak import build_corpus  # noqa: E402  (same dir)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssSampler(threading.Thread):
    def __init__(self, interval: float = 0.25) -> None:
        super().__init__(daemon=True)
        self.interval = interval
        self.peak = 0.0
        self._halt = threading.Event()   # NOT _stop: Thread._stop is real

    def run(self) -> None:
        while not self._halt.is_set():
            self.peak = max(self.peak, rss_mb())
            time.sleep(self.interval)

    def stop(self) -> float:
        self._halt.set()
        self.join()
        return self.peak


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=25)
    ap.add_argument("--max-driver-growth-mb", type=float, default=1500.0)
    ap.add_argument("--clusters", action="store_true",
                    help="also run Dataset-native label propagation "
                         "over the written pairs and verify vs a "
                         "driver union-find")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from ocr_model_ray.functions.dedup_algos import (_resolve_mode,
                                                     near_dup_pairs_ds)

    corpus = build_corpus(args.replicas)
    ds = rd.read_parquet(corpus)
    assert _resolve_mode(ds, "auto") == "distributed"
    n_docs = ds.count()

    base = rss_mb()
    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    out_dir = os.path.join("/tmp/ocr_soak",
                           f"neardup_pairs_x{args.replicas}")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    pairs = near_dup_pairs_ds(ds, threshold=0.8)
    pairs.write_parquet(out_dir)   # streaming sink — no driver collect
    wall = round(time.time() - t0, 1)
    peak = sampler.stop()

    import pyarrow.dataset as pads
    n_pairs = pads.dataset(out_dir).count_rows()
    growth = round(peak - base, 1)
    ok = growth < args.max_driver_growth_mb
    print(json.dumps({
        "soak": "neardup_rss", "replicas": args.replicas,
        "docs": int(n_docs), "pairs": int(n_pairs),
        "wall_s": wall, "driver_rss_base_mb": round(base, 1),
        "driver_rss_peak_mb": round(peak, 1),
        "driver_growth_mb": growth,
        "bound_mb": args.max_driver_growth_mb,
        "pass": bool(ok)}), flush=True)

    if ok and args.clusters:
        from ocr_model_ray.functions.dedup_algos import \
            label_propagation_ds
        t0 = time.time()
        labels = (label_propagation_ds(rd.read_parquet(out_dir))
                  .to_pandas())
        lp_wall = round(time.time() - t0, 1)
        # independent verification: driver union-find over the same
        # written pairs (never the engine's own label propagation)
        import pandas as pd
        pairs_pd = pads.dataset(out_dir).to_table(
            columns=["doc_a", "doc_b"]).to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(pairs_pd["doc_a"], pairs_pd["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {int(n): find(int(n))
                for n in set(pairs_pd["doc_a"]) | set(pairs_pd["doc_b"])}
        got = dict(zip(labels["node"].astype(int),
                       labels["label"].astype(int)))
        eq = got == want
        print(json.dumps({"soak": "neardup_clusters_ds",
                          "nodes": len(want), "wall_s": lp_wall,
                          "union_find_equal": bool(eq)}), flush=True)
        ok = ok and eq

    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
