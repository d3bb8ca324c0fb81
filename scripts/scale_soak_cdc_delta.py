"""Round-4 soak: chunk-level snapshot delta at volume — full DuckDB
replay of the synthesis, hash boundaries and distinct-set join over
the identical frame (bit-exact), plus the CDC property in closed
form: unchanged urls MUST score kept_share exactly 1.0 and edited urls
almost always lose <= 3 chunks (the insertion's gram window can kill
a nearby boundary and merge several small chunks, so the bound is a
99.9% tail bound, not absolute — measured 1 in 10k exceeding it).

Corpus: N urls of seeded random soup (~120 chars); snapshot 2 inserts
one char at position 10 for every third url.

Usage: python scripts/scale_soak_cdc_delta.py --urls 250000
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
    ap.add_argument("--urls", type=int, default=250_000)
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
    from ocr_model_ray.functions.chunking import cdc_snapshot_delta

    N = args.urls
    AL = np.frombuffer(b"abcdefghijklmnopqrstuvwxy ", dtype=np.uint8)

    def _base(i: int) -> str:
        rng = np.random.RandomState(i % (2**31 - 1))
        return AL[rng.randint(0, len(AL), 120)].tobytes().decode()

    def synth(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["id"].to_numpy().astype(np.int64)
        rows = []
        for i in ids:
            t1 = _base(int(i))
            t2 = t1[:10] + "Z" + t1[10:] if i % 3 == 0 else t1
            u = f"https://s.example/{i}"
            rows.append((u, 1, t1, int(i)))
            rows.append((u, 2, t2, int(i)))
        return pd.DataFrame(rows, columns=["url", "snap", "text",
                                           "doc_id"])

    t0 = time.time()
    pages = (rd.range(N).repartition(args.cpus * 4)
             .map_batches(synth, batch_format="pandas").materialize())
    build_s = time.time() - t0

    t0 = time.time()
    got = cdc_snapshot_delta(pages).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    run_s = time.time() - t0

    # full DuckDB replay: reuse the panel oracle minus its synthesis
    # (we register the real pages frame and strip the pages CTE by
    # exposing it as the view the oracle builds from documents)
    t0 = time.time()
    frame = pages.to_pandas()
    con = duckdb.connect()
    con.register("pages_real", frame[["url", "snap", "text"]])
    sql = em.oracle_sql()["url_cdc_delta"]
    # swap the synthesized pages CTE for the registered frame
    head, _, tail = sql.partition("g AS (")
    sql2 = ("WITH pages AS (SELECT url, snap, text FROM pages_real),\n"
            "g AS (" + tail)
    truth = con.sql(sql2).df()
    oracle_s = time.time() - t0

    ok = len(got) == len(truth)
    if ok:
        for c in ("url", "n_chunks", "n_chars", "kept_chunks",
                  "kept_chars"):
            g = got[c].to_numpy()
            w = truth[c].to_numpy()
            ok &= bool((g == w).all())
        ok &= bool(np.array_equal(
            got["kept_share"].to_numpy().view("int64"),
            truth["kept_share"].to_numpy().view("int64")))

    ids = got["url"].str.extract(r"/(\d+)$", expand=False) \
        .astype(np.int64)
    unchanged = got[ids % 3 != 0]
    edited = got[ids % 3 == 0]
    lost = (edited["n_chunks"] - edited["kept_chunks"]).to_numpy()
    prop_ok = bool((unchanged["kept_share"] == 1.0).all()) \
        and float((lost <= 3).mean()) >= 0.999 \
        and bool((edited["kept_share"] < 1.0).all())

    print(json.dumps({
        "urls": N, "cpus": args.cpus,
        "build_s": round(build_s, 1), "delta_s": round(run_s, 1),
        "oracle_s": round(oracle_s, 1),
        "bit_equal": bool(ok),
        "cdc_property_ok": prop_ok,
        "mean_edited_kept_share":
            round(float(edited["kept_share"].mean()), 4),
        "pass": bool(ok and prop_ok)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
