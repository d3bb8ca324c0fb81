"""Round-4 soak: the exact Hamming self-join at volume, verified
against a closed-form planted truth.

Corpus: N uniform-random 64-bit hashes (seeded) — the probability a
random pair lands within Hamming distance 3 is
(1 + 64 + 2016 + 41664) / 2^64 ~ 2.4e-15, so even at N = 10M
(~5e13 pairs) the expected background count is ~0.1; the soak
additionally VERIFIES zero background by checking every emitted pair
against the planted set. Planted: K clusters, each a base hash plus
members at exact distances 1..3 (distinct flipped bits), yielding a
closed-form pair list with known distances (members of one cluster
pair with each other at the xor-popcount of their flip masks —
computed directly when building the truth).

Checks: the distributed hamming_pairs output EQUALS the closed-form
pair set — ids and distances, bit-exact, no extras, no misses.

Usage: python scripts/scale_soak_hamming.py --rows 10000000 --clusters 2000
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
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--scheme", default="bands",
                    choices=("bands", "blocks"))
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

    from ocr_model_ray.functions.dedup_algos import (
        _popcount_u64, hamming_pairs)

    rng = np.random.RandomState(42)
    h = rng.randint(0, 2**63, size=args.rows, dtype=np.int64) \
        .astype(np.uint64)
    h |= rng.randint(0, 2, size=args.rows).astype(np.uint64) << np.uint64(63)

    # plant clusters over the first 4*K ids: base + flips of 1/2/3
    # distinct bits (bits chosen per cluster, deterministic)
    K = args.clusters
    truth = {}
    for c in range(K):
        ids = [4 * c + j for j in range(4)]
        bits = rng.choice(64, size=3, replace=False)
        masks = [np.uint64(0)]
        acc = np.uint64(0)
        for b in bits:
            acc = acc | (np.uint64(1) << np.uint64(int(b)))
            masks.append(acc)
        base = h[ids[0]]
        for j in range(4):
            h[ids[j]] = base ^ masks[j]
        for x in range(4):
            for y in range(x + 1, 4):
                d = int(_popcount_u64(
                    np.array([masks[x] ^ masks[y]]))[0])
                if d <= 3:
                    truth[(ids[x], ids[y])] = d

    t0 = time.time()
    frame = pd.DataFrame({"doc_id": np.arange(args.rows, dtype=np.int64),
                          "h64": h.view(np.int64)})
    ds = rd.from_pandas(frame).repartition(args.cpus * 4)
    build_s = time.time() - t0

    t0 = time.time()
    out = hamming_pairs(ds, max_hamming=3, scheme=args.scheme,
                        mode="distributed").to_pandas()
    join_s = time.time() - t0

    got = {(int(a), int(b)): int(d) for a, b, d in
           zip(out["doc_a"], out["doc_b"], out["hamming"])} \
        if len(out) else {}
    extras = {k: v for k, v in got.items() if k not in truth}
    misses = {k: v for k, v in truth.items() if k not in got}
    wrong = {k: (got[k], truth[k]) for k in got.keys() & truth.keys()
             if got[k] != truth[k]}
    match = not extras and not misses and not wrong

    print(json.dumps({
        "rows": args.rows, "clusters": K, "scheme": args.scheme,
        "planted_pairs": len(truth), "got_pairs": len(got),
        "extras": len(extras), "misses": len(misses),
        "wrong_distance": len(wrong), "match": match,
        "build_s": round(build_s, 1), "join_s": round(join_s, 1),
        "pairs_per_sec": round(len(got) / max(join_s, 1e-9), 1),
    }))
    if not match:
        print({"extras": list(extras.items())[:5],
               "misses": list(misses.items())[:5],
               "wrong": list(wrong.items())[:5]}, file=sys.stderr)
        sys.exit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
