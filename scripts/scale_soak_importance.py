"""Round-4 soak: DSIR-style importance weights at volume, BIT-EXACT
against a direct DuckDB replay of the full two-pass plan.

Corpus: the replica builder from scale_soak.py (distinct texts per
replica), with the target column derived deterministically
(doc_id % 7 == 0 -> 'fr', else 'en') on BOTH sides. The engine runs
the real distributed plan (combiner counts pass -> broadcast arrays ->
scoring pass); DuckDB recomputes hashed-bigram buckets, source/target
counts, and every per-doc (num, den, weight) from the same parquet.
Every value must be equal — integer sums end-to-end plus one float
expression written identically on both sides.

Usage: python scripts/scale_soak_importance.py --replicas 100
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_soak import build_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
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

    from ocr_model_ray.functions.importance import (
        importance_bucket_counts, importance_weights)

    corpus = build_corpus(args.replicas)

    def with_lang(df: pd.DataFrame) -> pd.DataFrame:
        lang = np.where(df["doc_id"].to_numpy() % 7 == 0, "fr", "en")
        return df.assign(lang=lang)

    def docs():
        return (rd.read_parquet(corpus, columns=["doc_id", "text"])
                .map_batches(with_lang, batch_format="pandas"))

    t0 = time.monotonic()
    s, t = importance_bucket_counts(docs())
    got = (importance_weights(docs(), s, t).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    engine_s = time.monotonic() - t0

    # DuckDB replay — the same CTE structure as the registered oracle,
    # with lang derived from doc_id exactly as the engine derives it
    t0 = time.monotonic()
    con = duckdb.connect()
    want = con.sql(f"""
        WITH docs AS (
            SELECT doc_id, text,
                   CASE WHEN doc_id % 7 = 0 THEN 'fr' ELSE 'en' END
                       AS lang
            FROM read_parquet('{corpus}/*.parquet')),
        toks AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(text,
                       '[ \t\n\r\f\v]+'), w -> w <> '') AS t
            FROM docs WHERE text IS NOT NULL),
        occ AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 4))
                        AS INTEGER) % 256 AS b
            FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
            WHERE len(t) >= 2),
        bc AS (
            SELECT b, count(*) AS s_n,
                   sum(CASE WHEN lang IS NOT NULL AND lang <> 'en'
                            THEN 1 ELSE 0 END) AS t_n
            FROM occ GROUP BY b),
        tot AS (SELECT sum(s_n) AS s_tot, sum(t_n) AS t_tot FROM bc),
        per_doc AS (
            SELECT occ.doc_id, sum(bc.t_n) AS num, sum(bc.s_n) AS den
            FROM occ JOIN bc USING (b) GROUP BY occ.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(p.num, 0) AS BIGINT) AS num,
               CAST(coalesce(p.den, 0) AS BIGINT) AS den,
               CASE WHEN p.den IS NULL OR p.den = 0 THEN NULL
                    ELSE (CAST(p.num AS DOUBLE) / CAST(p.den AS DOUBLE))
                         * ((SELECT CAST(s_tot AS DOUBLE) FROM tot)
                            / (SELECT CAST(t_tot AS DOUBLE) FROM tot))
               END AS weight
        FROM docs d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY doc_id
    """).df()
    duck_s = time.monotonic() - t0

    ok = (len(got) == len(want)
          and got["doc_id"].tolist() == want["doc_id"].tolist()
          and (got["num"].to_numpy() == want["num"].to_numpy()).all()
          and (got["den"].to_numpy() == want["den"].to_numpy()).all()
          and np.array_equal(
              got["weight"].to_numpy(np.float64).view("int64"),
              want["weight"].to_numpy(np.float64).view("int64")))

    result = {
        "replicas": args.replicas,
        "docs": int(len(got)),
        "bucket_mass": int(s.sum()),
        "target_mass": int(t.sum()),
        "engine_sec": round(engine_s, 1),
        "duckdb_sec": round(duck_s, 1),
        "bit_equal": bool(ok),
        "pass": bool(ok),
    }
    print(json.dumps(result))
    ray.shutdown()
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
