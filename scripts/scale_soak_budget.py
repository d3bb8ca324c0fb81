"""Round-4 soak: token-budget corpus selection at volume, verified
against DuckDB's independent replay of the frozen semantics (tier
cuts from the clamped histogram + the full SUM() OVER window).

Corpus: N docs, word count = (doc_id * 7919 + 13) % 123 — a flat-ish
integer distribution exercising all four tiers and ties at the cuts.
Budget = total tokens // 3: the marginal tier's threshold hex-bin is
resolved on the distributed path.

Usage: python scripts/scale_soak_budget.py --docs 1250000
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
    ap.add_argument("--docs", type=int, default=1_250_000)
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

    from ocr_model_ray.functions.tiers import token_budget_select

    N = args.docs
    ids = np.arange(N, dtype=np.int64)
    words = (ids * 7919 + 13) % 123
    total = int(words.sum())
    budget = total // 3

    t0 = time.time()
    texts = pd.Series(words).map(lambda k: " ".join(["w"] * int(k)))
    docs = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})) \
        .repartition(args.cpus * 4).materialize()
    build_s = time.time() - t0

    t0 = time.time()
    kept = token_budget_select(docs, budget,
                               mode="distributed").to_pandas()
    run_s = time.time() - t0

    # independent DuckDB replay over (doc_id, n_words): tier cuts per
    # the frozen float comparison, then the full window
    t0 = time.time()
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": ids, "n_words": words}))
    truth = con.execute("""
        WITH h AS (SELECT least(n_words, 4095) AS s,
                          count(*) AS n FROM d GROUP BY 1),
        c AS (SELECT s, sum(n) OVER (ORDER BY s) AS cum,
                     (SELECT sum(n) FROM h) AS tot FROM h),
        cuts AS (SELECT
            (SELECT min(s) FROM c
             WHERE CAST(cum AS DOUBLE) >= 0.25 * CAST(tot AS DOUBLE))
                AS c1,
            (SELECT min(s) FROM c
             WHERE CAST(cum AS DOUBLE) >= 0.5 * CAST(tot AS DOUBLE))
                AS c2,
            (SELECT min(s) FROM c
             WHERE CAST(cum AS DOUBLE) >= 0.75 * CAST(tot AS DOUBLE))
                AS c3),
        t AS (SELECT doc_id, n_words,
                     1 + CASE WHEN least(n_words, 4095) >
                              (SELECT c1 FROM cuts) THEN 1 ELSE 0 END
                       + CASE WHEN least(n_words, 4095) >
                              (SELECT c2 FROM cuts) THEN 1 ELSE 0 END
                       + CASE WHEN least(n_words, 4095) >
                              (SELECT c3 FROM cuts) THEN 1 ELSE 0 END
                         AS tier
              FROM d),
        o AS (SELECT doc_id, n_words, tier,
                     sum(n_words) OVER (
                         ORDER BY tier DESC,
                                  md5(CAST(doc_id AS VARCHAR)), doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(tier AS INTEGER) AS tier
        FROM o WHERE cum <= ?
        ORDER BY doc_id
    """, [budget]).df()
    oracle_s = time.time() - t0

    got = kept.sort_values("doc_id").reset_index(drop=True)
    ok = (len(got) == len(truth)
          and (got["doc_id"].to_numpy()
               == truth["doc_id"].to_numpy()).all()
          and (got["n_words"].to_numpy().astype(np.int64)
               == truth["n_words"].to_numpy()).all()
          and (got["tier"].to_numpy().astype(np.int64)
               == truth["tier"].to_numpy().astype(np.int64)).all())
    kept_tokens = int(got["n_words"].sum())

    print(json.dumps({
        "docs": N, "total_tokens": total, "budget": budget,
        "kept_docs": int(len(got)), "kept_tokens": kept_tokens,
        "oracle_kept": int(len(truth)),
        "budget_respected": bool(kept_tokens <= budget),
        "bit_equal": bool(ok),
        "build_s": round(build_s, 1), "run_s": round(run_s, 1),
        "oracle_s": round(oracle_s, 1),
        "docs_per_sec": round(N / max(run_s, 1e-9), 1),
    }))
    ray.shutdown()
    sys.exit(0 if (ok and kept_tokens <= budget) else 1)


if __name__ == "__main__":
    main()
