"""Round-4 soak: winnowing partial-overlap pairs at volume with
planted quote pairs, verified independently (fingerprints recomputed
per flagged doc by the scalar reference path, jaccards re-derived
from the recomputed sets — no engine code in the check).

Corpus: N docs of RANDOM character soup (seeded per doc — structured
"u{i}t{j}" skeletons share char-grams corpus-wide and legitimately
pair up, and ONE global quote in thousands of docs trips the max_df
boilerplate guard by design: both first-draft mistakes of this soak,
kept here as documentation); every PLANT_EVERY-th doc pair shares a
150-char quote RANDOM PER FAMILY (df = 2, far under max_df), which
the winnowing guarantee must surface as a pair.

Usage: python scripts/scale_soak_winnow.py --docs 500000
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
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--plant-every", type=int, default=100)
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

    from ocr_model_ray.functions.winnow import (_doc_fingerprints,
                                                _kr_constants,
                                                DEFAULT_K, DEFAULT_W,
                                                shared_fingerprint_pairs)

    N = args.docs
    PE = args.plant_every
    AL = np.frombuffer(b"abcdefghijklmnopqrstuvwxy ", dtype=np.uint8)

    def _rand_text(seed: int, n_chars: int) -> str:
        rng = np.random.RandomState(seed % (2**31 - 1))
        return AL[rng.randint(0, len(AL), n_chars)].tobytes().decode()

    def _doc_text(i: int) -> str:
        base = _rand_text(i * 2 + 1, 60)
        if (i // PE) % 2 == 0 and i % PE in (0, 1):
            # quote >> base so the planted pair's fingerprint jaccard
            # sits well above the 1/2 cut (quote 300 / base 60 ->
            # shared ~ 0.7; equal lengths hover AT the cut and only
            # ~27% of plants pass — measured, kept as documentation)
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
    build_s = time.time() - t0

    t0 = time.time()
    pairs = shared_fingerprint_pairs(docs, mode="distributed",
                                     min_shared=2)
    run_s = time.time() - t0

    # expected planted pairs
    exp = set()
    for i in range(0, N - 1, PE):
        if (i // PE) % 2 == 0 and i + 1 < N:
            exp.add((i, i + 1))
    got = set(zip(pairs["doc_a"].astype(int),
                  pairs["doc_b"].astype(int)))
    planted_found = len(exp & got)

    # independent verification of EVERY emitted pair: recompute both
    # docs' fingerprint sets with the scalar reference kernel and
    # re-derive (n_shared, jaccard)
    consts = _kr_constants(DEFAULT_K)
    flagged = sorted({d for p in got for d in p} | {d for p in exp
                                                    for d in p})
    fps = {i: set(_doc_fingerprints(_doc_text(i), DEFAULT_K,
                                    DEFAULT_W, consts)[1].tolist())
           for i in flagged}
    bad = 0
    for row in pairs.itertuples():
        a, b = int(row.doc_a), int(row.doc_b)
        shared = len(fps[a] & fps[b])
        jac = shared / float(len(fps[a] | fps[b]))
        if shared != int(row.n_shared) or jac != float(row.jaccard) \
                or not (shared >= 2 and 2 * shared
                        >= len(fps[a] | fps[b])):
            bad += 1

    print(json.dumps({
        "docs": N, "cpus": args.cpus,
        "build_s": round(build_s, 1), "pairs_s": round(run_s, 1),
        "planted": len(exp), "planted_found": planted_found,
        "pairs_emitted": len(got),
        "pairs_failing_independent_recompute": bad,
        "pass": bool(planted_found == len(exp) and bad == 0)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
