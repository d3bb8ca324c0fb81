"""Round-5 soak: incremental near-dup delta against the cross-run
MinHash index at volume (round-4 verdict #6's done criterion).

Old corpus (N docs) ingests into a fresh index; a new crawl (N/10
docs) runs ``minhash_delta`` against it. Every PLANT_EVERY-th new doc
is an exact or near copy (one token flipped) of a specific old doc;
all other new docs are novel. Checks: every planted dup is flagged
with the RIGHT match_old, no novel doc is flagged, and a second
delta under the same run_id is bit-identical (idempotent retry).

Usage: python scripts/scale_soak_minhash_delta.py --docs 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--plant-every", type=int, default=10)
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

    from ocr_model_ray.state.minhash_index import (minhash_delta,
                                                   minhash_ingest)

    N = args.docs
    M = N // 10                   # new-crawl size
    PE = args.plant_every

    WORDS = np.array([f"w{i:03d}" for i in range(700)], dtype=object)

    def _text(seed: int, flip: bool = False) -> str:
        rng = np.random.RandomState(seed % (2**31 - 1))
        toks = WORDS[rng.randint(0, len(WORDS), 40)].tolist()
        if flip:
            toks[7] = "FLIPPED"
        return " ".join(toks)

    def synth_old(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "text": [_text(int(i) * 7 + 3) for i in ids]})

    def synth_new(b: pd.DataFrame) -> pd.DataFrame:
        # new ids live above the old id space; every PE-th is a copy
        # (even plants exact, odd plants near) of old doc (i*PE) % N
        ids = b["id"].to_numpy().astype(np.int64)
        out_id, out_tx = [], []
        for i in ids:
            i = int(i)
            nid = N + i
            if i % PE == 0:
                src = (i * PE) % N
                out_tx.append(_text(src * 7 + 3,
                                    flip=bool((i // PE) % 2)))
            else:
                out_tx.append(_text(10**9 + i * 13 + 5))
            out_id.append(nid)
        return pd.DataFrame({"doc_id": np.asarray(out_id, np.int64),
                             "text": out_tx})

    t0 = time.time()
    old = (rd.range(N).repartition(args.cpus * 4)
           .map_batches(synth_old, batch_format="pandas").materialize())
    new = (rd.range(M).repartition(args.cpus * 2)
           .map_batches(synth_new, batch_format="pandas").materialize())
    build_s = round(time.time() - t0, 1)

    import shutil
    idx = "/tmp/ocr_soak/mh_delta_index"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    minhash_ingest(old, idx, "old").materialize()
    ingest_s = round(time.time() - t0, 1)

    corpus = old.union(new).materialize()
    t0 = time.time()
    out = (minhash_delta(new, idx, "new", corpus, threshold=0.8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    delta_s = round(time.time() - t0, 1)

    # exact plants MUST all hit (identical signatures share every
    # band); near plants (one token of 40 flipped, true 3-gram
    # jaccard ~0.9) are subject to LSH's documented probabilistic
    # recall — a miss is acceptable only if it IS a banding miss,
    # i.e. the pair's true jaccard clears the cut (so the verify
    # stage didn't drop it) and the miss rate stays tiny
    planted = {N + i: (i * PE) % N for i in range(0, M, PE)}
    exact_plant = {nid for i, nid in
                   ((i, N + i) for i in range(0, M, PE))
                   if (i // PE) % 2 == 0}
    flagged = out[out["is_dup"] == 1]
    got = dict(zip(flagged["doc_id"].astype(int),
                   flagged["match_old"].astype(int)))
    miss_exact = sum(1 for nid in exact_plant if nid not in got)
    near_missed = [nid for nid in planted
                   if nid not in got and nid not in exact_plant]
    # independent recheck of every near miss with the scalar shingle
    # reference: the true jaccard must be >= 0.8 (an LSH band miss,
    # not a verify bug)
    from ocr_model_ray.functions.dedup_algos import shingles
    bad_miss = 0
    for nid in near_missed:
        i = nid - N
        sa = set(shingles(_text(((i * PE) % N) * 7 + 3), 3).tolist())
        sb = set(shingles(_text(((i * PE) % N) * 7 + 3,
                                flip=True), 3).tolist())
        if len(sa & sb) / len(sa | sb) < 0.8:
            bad_miss += 1
    near_recall = 1.0 - len(near_missed) / max(1, len(planted)
                                               - len(exact_plant))
    wrong = sum(1 for nid, src in planted.items()
                if nid in got and got[nid] != src)
    false_pos = int((~flagged["doc_id"].isin(planted.keys())).sum())

    t0 = time.time()
    retry = (minhash_delta(new, idx, "new", corpus, threshold=0.8)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    retry_s = round(time.time() - t0, 1)
    idem = bool(out.equals(retry))

    ok = (miss_exact == 0 and wrong == 0 and false_pos == 0
          and bad_miss == 0 and near_recall >= 0.97 and idem)
    print(json.dumps({
        "soak": "minhash_delta", "old_docs": N, "new_docs": M,
        "cpus": args.cpus, "build_s": build_s, "ingest_s": ingest_s,
        "delta_s": delta_s, "retry_s": retry_s,
        "planted": len(planted),
        "exact_plants": len(exact_plant), "exact_missed": miss_exact,
        "near_missed_lsh": len(near_missed),
        "near_missed_below_cut": bad_miss,
        "near_recall": round(near_recall, 4),
        "planted_wrong_match": wrong, "false_positives": false_pos,
        "retry_bit_identical": idem, "pass": ok}), flush=True)
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
