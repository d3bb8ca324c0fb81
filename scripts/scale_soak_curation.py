"""Round-4 soak: the curation composite (pipelines/curation.py) at
volume, verified against an independent DuckDB replay on the same
generated parquet.

Corpus: sf0.1 documents (doc_id, text, lang) replicated R times with a
per-replica END suffix token (" zz<r>q") — replicas are md5-disjoint
while each replica keeps sf0.1's internal duplicate structure and
Gopher stats, so exact-dedup scales linearly like a sharded crawl.
Contamination is PLANTED: docs with doc_id % 499 == 0 get a fixed
8-token leak appended, and the eval-gram set is exactly that leak's
one 8-gram — so the decontam stage's truth is closed-form on both
sides (the SQL side checks the contiguous space-joined token run,
faithful by construction because the plant is appended whole).

Checks (all integers, must be EQUAL):
  * the 5-row funnel frame (stage, docs, chars) vs the DuckDB replay
    of the full lang/gopher/dedup/decontam chain;
  * curation_kept checksums (count, sum doc_id, sum chars) vs DuckDB.

Usage: python scripts/scale_soak_curation.py --replicas 250
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_DIR = "/tmp/ocr_model_ray_soak"
LEAK = " ".join(f"leak{i:02d}" for i in range(8))


def build_corpus(replicas: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SOAK_DIR, f"curdocs_x{replicas}")
    marker = out + "._DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    base = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()
    n = len(base)
    for r in range(replicas):
        dst = os.path.join(out, f"part_{r:04d}.parquet")
        if os.path.exists(dst):
            continue
        ids = base["doc_id"].to_numpy() + r * n
        texts = (base["text"].fillna("") + f" zz{r}q")
        planted = (ids % 499 == 0)
        texts = texts.where(~planted, texts + " " + LEAK)
        t = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts.tolist(), pa.string()),
            "lang": pa.array(base["lang"].tolist(), pa.string()),
        })
        pq.write_table(t, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
    open(marker, "w").write("ok")
    return out


# the same CTE chain as __ray_entry__'s curation oracle, minus the
# eval-split cut (the soak corpus IS the corpus) and with the planted
# leak as the closed-form contamination truth
SQL = f"""
WITH base AS (SELECT doc_id, lang, coalesce(text, '') AS text
              FROM read_parquet('{{d}}/part_*.parquet')),
w AS (SELECT doc_id, lang, text,
             list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                         x -> x <> '') AS toks
      FROM base),
m AS (SELECT doc_id, lang, text,
             CAST(length(text) AS BIGINT) AS chars,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(toks,
                  x -> length(x))), 0) AS BIGINT) AS total_chars,
             CAST(len(list_filter(toks, x ->
                  regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(regexp_extract_all(text, '#'))
                  + len(regexp_extract_all(text, '\\.\\.\\.'))
                  AS BIGINT) AS n_sym,
             CAST(len(list_intersect(list_distinct(toks),
                  ['the','and','of','to','in','a','is','for']))
                  AS BIGINT) AS n_stop
      FROM w),
v AS (SELECT doc_id, lang, text, chars,
             (lang IN ('en','de','fr','es')) AS lang_ok,
             (n_words >= 50 AND n_words <= 100000
              AND CAST(total_chars AS DOUBLE)/greatest(n_words,1) >= 3.0
              AND CAST(total_chars AS DOUBLE)/greatest(n_words,1) <= 10.0
              AND CAST(n_alpha AS DOUBLE)/greatest(n_words,1) >= 0.8
              AND CAST(n_sym AS DOUBLE)/greatest(n_words,1) <= 0.1
              AND n_stop >= 2) AS gopher_ok
      FROM m),
q AS (SELECT * FROM v WHERE lang_ok AND gopher_ok),
g AS (SELECT md5(text) AS h, min(doc_id) AS keep_id,
             max(chars) AS chars,
             max(CASE WHEN contains(text, ' {LEAK}')
                 THEN 1 ELSE 0 END) AS cont
      FROM q GROUP BY md5(text))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=250)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ocr_model_ray.functions.decontam import ngram_set
    from ocr_model_ray.pipelines.curation import (
        curation_groups, curation_kept)

    d = build_corpus(args.replicas)
    grams = ngram_set([LEAK], n=8)
    docs = rd.read_parquet(d, columns=["doc_id", "text", "lang"])

    t0 = time.time()
    groups, funnel = curation_groups(docs, grams, mode="distributed")
    funnel_s = time.time() - t0

    t0 = time.time()
    kept = curation_kept(
        rd.read_parquet(d, columns=["doc_id", "text", "lang"]),
        grams, mode="distributed")

    def checks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": pd.array([len(df)], dtype="int64"),
            "sid": pd.array([int(df["doc_id"].sum())], dtype="int64"),
            "sch": pd.array([int(df["chars"].sum())], dtype="int64")})

    kc = (kept.map_batches(checks, batch_format="pandas")
          .to_pandas().sum())
    kept_s = time.time() - t0

    sql = SQL.format(d=d)
    want_funnel = duckdb.sql(sql + """
        SELECT 'input' AS stage, CAST(count(*) AS BIGINT) AS docs,
               CAST(coalesce(sum(chars),0) AS BIGINT) AS chars FROM v
        UNION ALL SELECT 'lang', count(*),
               CAST(coalesce(sum(chars),0) AS BIGINT) FROM v WHERE lang_ok
        UNION ALL SELECT 'quality', count(*),
               CAST(coalesce(sum(chars),0) AS BIGINT) FROM q
        UNION ALL SELECT 'exact_dedup', count(*),
               CAST(coalesce(sum(chars),0) AS BIGINT) FROM g
        UNION ALL SELECT 'decontam', count(*),
               CAST(coalesce(sum(chars),0) AS BIGINT) FROM g WHERE cont = 0
    """).df()
    want_kept = duckdb.sql(sql + """
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(sum(keep_id),0) AS BIGINT) AS sid,
               CAST(coalesce(sum(chars),0) AS BIGINT) AS sch
        FROM g WHERE cont = 0
    """).df()

    got = {r["stage"]: (int(r["docs"]), int(r["chars"]))
           for _, r in funnel.iterrows()}
    want = {r["stage"]: (int(r["docs"]), int(r["chars"]))
            for _, r in want_funnel.iterrows()}
    funnel_match = got == want
    kept_match = (int(kc["n"]) == int(want_kept["n"][0])
                  and int(kc["sid"]) == int(want_kept["sid"][0])
                  and int(kc["sch"]) == int(want_kept["sch"][0]))

    print(json.dumps({
        "replicas": args.replicas,
        "docs": got.get("input", (0, 0))[0],
        "funnel": {k: list(vv) for k, vv in got.items()},
        "funnel_match": funnel_match,
        "kept": {k: int(kc[k]) for k in ("n", "sid", "sch")},
        "kept_match": kept_match,
        "funnel_s": round(funnel_s, 1), "kept_s": round(kept_s, 1),
    }))
    if not (funnel_match and kept_match):
        print({"want_funnel": want, "want_kept": want_kept.to_dict()},
              file=sys.stderr)
        sys.exit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
