"""Round-5 soak: the DISTRIBUTED winnow-pair plan produces its pairs
with BOUNDED DRIVER MEMORY — postings/counted pairs/qualifying pairs
live in the object store end-to-end (round-4 verdict #1's done
criterion: the winnow family mirrors the MinHash family's
neardup_rss receipt).

Runs shared_fingerprint_pairs_ds over the scale_soak_winnow corpus
(random char soup + planted per-family quotes), consumes the pair
Dataset by STREAMING it to parquet (never .to_pandas()), and samples
the driver process RSS throughout. Also verifies every planted pair
is present in the written parquet and (with --clusters) that
Dataset-native label propagation over the written pairs matches a
driver union-find.

Usage: python scripts/scale_soak_winnow_rss.py --docs 1250000
       python scripts/scale_soak_winnow_rss.py --docs 12500000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
        self._halt = threading.Event()

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
    ap.add_argument("--docs", type=int, default=1_250_000)
    ap.add_argument("--plant-every", type=int, default=100)
    ap.add_argument("--max-driver-growth-mb", type=float, default=1500.0)
    ap.add_argument("--clusters", action="store_true")
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

    from ocr_model_ray.functions.winnow import shared_fingerprint_pairs_ds

    N, PE = args.docs, args.plant_every
    # 64-char alphabet: 64^5 ~ 1.07e9 distinct 5-grams, so at 12.5M
    # docs the per-hash df stays ~1 like real web text. The 26-char
    # soup scale_soak_winnow uses is fine at <=1M docs but collapses
    # the gram space at 12.5M (df ~ N*len/26^5 ~ 16), exploding the
    # honest pair volume quadratically (~1.4e9 counted pairs, 40+ GB
    # of spill) — a corpus-density artifact, not an engine property.
    AL = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz"
                       b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .",
                       dtype=np.uint8)

    def _rand_text(seed: int, n_chars: int) -> str:
        rng = np.random.RandomState(seed % (2**31 - 1))
        return AL[rng.randint(0, len(AL), n_chars)].tobytes().decode()

    def _doc_text(i: int) -> str:
        base = _rand_text(i * 2 + 1, 60)
        if (i // PE) % 2 == 0 and i % PE in (0, 1):
            quote = _rand_text(10**9 + (i // PE), 300)
            return quote + " " + base
        return base

    def synth(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "text": [_doc_text(int(i)) for i in ids]})

    t0 = time.time()
    docs = (rd.range(N).repartition(args.cpus * 4)
            .map_batches(synth, batch_format="pandas").materialize())
    build_s = round(time.time() - t0, 1)

    base = rss_mb()
    sampler = RssSampler()
    sampler.start()
    out_dir = os.path.join("/tmp/ocr_soak", f"winnow_pairs_x{N}")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    pairs = shared_fingerprint_pairs_ds(docs, min_shared=2)
    pairs.write_parquet(out_dir)   # streaming sink — no driver collect
    wall = round(time.time() - t0, 1)
    peak = sampler.stop()

    import pyarrow.dataset as pads
    written = pads.dataset(out_dir)
    n_pairs = written.count_rows()
    got = written.to_table(columns=["doc_a", "doc_b"]).to_pandas()
    got_set = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    exp = {(i, i + 1) for i in range(0, N - 1, PE)
           if (i // PE) % 2 == 0 and i + 1 < N}
    planted_found = len(exp & got_set)

    growth = round(peak - base, 1)
    ok = growth < args.max_driver_growth_mb \
        and planted_found == len(exp)
    print(json.dumps({
        "soak": "winnow_rss", "docs": N, "cpus": args.cpus,
        "build_s": build_s, "pairs": int(n_pairs), "wall_s": wall,
        "planted": len(exp), "planted_found": planted_found,
        "driver_rss_base_mb": round(base, 1),
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
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in got_set:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {n: find(n) for p in got_set for n in p}
        got_labels = dict(zip(labels["node"].astype(int),
                              labels["label"].astype(int)))
        eq = got_labels == want
        print(json.dumps({"soak": "winnow_clusters_ds",
                          "nodes": len(want), "wall_s": lp_wall,
                          "union_find_equal": bool(eq)}), flush=True)
        ok = ok and eq

    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
