"""Round-4 soak: content-defined chunking + dup-share at volume,
verified by a FULL DuckDB replay of the gram-hash boundaries and the
distinct-doc dup rule over the identical synthesized frame (bit-exact
compare), plus planted identical-doc pairs whose dup_share must be
exactly 1.0.

Corpus: N docs of seeded random character soup (~120 chars); every
``--plant-every``-th doc pair is identical. The DuckDB g-CTE costs
~80 gram rows/doc, so default N keeps the oracle tractable (the
engine side was also run standalone at 1.25M docs, 5x this, in
~2 s/pass — the oracle is the bottleneck here, not the engine).

Usage: python scripts/scale_soak_cdc.py --docs 250000
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
    ap.add_argument("--docs", type=int, default=250_000)
    ap.add_argument("--plant-every", type=int, default=100)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import duckdb
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em
    from ocr_model_ray.functions.chunking import cdc_dup_share

    N = args.docs
    PE = args.plant_every
    AL = np.frombuffer(b"abcdefghijklmnopqrstuvwxy ", dtype=np.uint8)

    def _text(i: int) -> str:
        # planted pair (2m*PE, 2m*PE+1) share one text
        seed = i
        if (i // PE) % 2 == 0 and i % PE in (0, 1):
            seed = (i // PE) * PE
        rng = np.random.RandomState(seed % (2**31 - 1))
        return AL[rng.randint(0, len(AL), 120)].tobytes().decode()

    def synth(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "text": [_text(int(i)) for i in ids]})

    t0 = time.time()
    docs = (rd.range(N).repartition(args.cpus * 4)
            .map_batches(synth, batch_format="pandas").materialize())
    build_s = time.time() - t0

    t0 = time.time()
    got = cdc_dup_share(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    run_s = time.time() - t0

    t0 = time.time()
    frame = docs.to_pandas()
    con = duckdb.connect()
    con.register("documents", frame)
    truth = con.sql(em.oracle_sql()["docs_cdc_dup_share"]).df()
    oracle_s = time.time() - t0

    ok_rows = len(got) == len(truth)
    bit_equal = ok_rows
    if ok_rows:
        for c in ("doc_id", "n_chunks", "n_chars", "dup_chunks",
                  "dup_chars"):
            bit_equal &= bool(
                (got[c].to_numpy().astype(np.int64)
                 == truth[c].to_numpy().astype(np.int64)).all())
        bit_equal &= bool(np.array_equal(
            got["dup_share"].to_numpy().view("int64"),
            truth["dup_share"].to_numpy().view("int64")))

    planted = got[(got["doc_id"] // PE) % 2 == 0]
    planted = planted[planted["doc_id"] % PE < 2]
    planted_ok = bool((planted["dup_share"] == 1.0).all()) \
        and len(planted) == 2 * ((N + 2 * PE - 1) // (2 * PE))

    print(json.dumps({
        "docs": N, "cpus": args.cpus,
        "build_s": round(build_s, 1),
        "dup_share_s": round(run_s, 1),
        "oracle_s": round(oracle_s, 1),
        "bit_equal": bool(bit_equal),
        "planted_pairs_share_1": bool(planted_ok),
        "n_planted_docs": int(len(planted)),
        "pass": bool(bit_equal and planted_ok)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
