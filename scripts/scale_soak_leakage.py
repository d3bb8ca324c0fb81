"""Round-4 soak: split_leakage + registrable_domain_stats at volume,
verified closed-form against the planted structure (independent
arithmetic recompute, never the engine's own code paths).

Corpus: N synthetic docs, each 40 tokens of the form ``a<id>w<j>`` —
every non-planted doc's word-3-gram set is disjoint from every other
doc's, so the exact Jaccard join's posting lists stay O(1) and the
soak cost is linear in N (the quadratic hazard is exactly what the
max_df guard exists for; this corpus proves the clean-path scaling).
Held-out split = doc_id % 10 == 0 (each decade's first id). Plants,
per decade with held doc h = 10*(id//10):

  * train ids with id % 7 == 3 copy h's text verbatim
      -> exact_leak = True, and (identical gram sets) max_jaccard 1.0
  * train ids with id % 7 == 5 copy h's text with token 20 replaced
      -> 3 of 38 grams differ: max_jaccard = 35/41 ~ 0.8537 >= 0.8,
         exact_leak = False
  * every other train doc must NOT appear.

registrable_domain_stats runs over the same ids through the
``__ray_entry__.synth_site_url_batch`` scheme; expected per-eTLD+1
counts come from a direct DuckDB replay of the id arithmetic.

Usage: python scripts/scale_soak_leakage.py --docs 1250000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_DIR = "/tmp/ocr_model_ray_soak"
NTOK = 40
NEAR_J = 35.0 / 41.0


def build_corpus(n_docs: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SOAK_DIR, f"leakdocs_{n_docs}")
    marker = out + "._DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    part = 25_000

    def text_of(i: int) -> str:
        return " ".join(f"a{i}w{j}" for j in range(NTOK))

    for p0 in range(0, n_docs, part):
        dst = os.path.join(out, f"part_{p0 // part:05d}.parquet")
        if os.path.exists(dst):
            continue
        ids = np.arange(p0, min(p0 + part, n_docs), dtype=np.int64)
        texts = []
        for i in ids.tolist():
            if i % 10 != 0 and i % 7 == 3:
                texts.append(text_of(10 * (i // 10)))
            elif i % 10 != 0 and i % 7 == 5:
                h = 10 * (i // 10)
                toks = [f"a{h}w{j}" for j in range(NTOK)]
                toks[20] = f"n{i}x"
                texts.append(" ".join(toks))
            else:
                texts.append(text_of(i))
        t = pa.table({"doc_id": pa.array(ids),
                      "text": pa.array(texts, pa.string())})
        pq.write_table(t, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
    open(marker, "w").write("ok")
    return out


def expected_leaks(n_docs: int):
    """Independent arithmetic recompute of the planted truth."""
    import numpy as np
    ids = np.arange(n_docs, dtype=np.int64)
    train = ids % 10 != 0
    exact = train & (ids % 7 == 3)
    near = train & (ids % 7 == 5)
    return ids[exact], ids[near]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_250_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import duckdb
    import numpy as np
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from __ray_entry__ import synth_site_url_batch, synth_site_url_sql
    from ocr_model_ray.functions.decontam import split_leakage
    from ocr_model_ray.functions.url_ops import registrable_domain_stats

    d = build_corpus(args.docs)

    # --- split_leakage at volume, forced distributed -----------------
    docs = rd.read_parquet(d, columns=["doc_id", "text"])
    t0 = time.time()
    got = split_leakage(docs, holdout_mod=10, threshold=0.8,
                        mode="distributed")
    leak_s = time.time() - t0

    exp_exact, exp_near = expected_leaks(args.docs)
    ge = got[got["exact_leak"]]
    gn = got[~got["exact_leak"]]
    exact_ok = (np.array_equal(ge["doc_id"].to_numpy(), exp_exact)
                and bool((ge["max_jaccard"] == 1.0).all()))
    near_ok = (np.array_equal(gn["doc_id"].to_numpy(), exp_near)
               and bool((gn["max_jaccard"] == NEAR_J).all()))

    # --- registrable_domain_stats over the same ids ------------------
    with_urls = rd.read_parquet(d, columns=["doc_id"]) \
        .map_batches(synth_site_url_batch, batch_format="pyarrow")
    t0 = time.time()
    etld = (registrable_domain_stats(with_urls).to_pandas()
            .sort_values("etld1").reset_index(drop=True))
    etld_s = time.time() - t0

    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT doc_id FROM read_parquet('{d}/part_*.parquet')""")
    want = con.execute(f"""
        WITH u AS ({synth_site_url_sql('documents')}),
        h AS (SELECT lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/:?#]*)', 1)) AS host
              FROM u),
        r AS (SELECT CASE
              WHEN regexp_extract(host, '([^.]+[.][^.]+)$', 1)
                   IN ('co.uk', 'org.uk', 'github.io')
              THEN NULLIF(regexp_extract(host,
                   '([^.]+[.][^.]+[.][^.]+)$', 1), '')
              WHEN regexp_extract(host, '([^.]+)$', 1)
                   IN ('com', 'org', 'net', 'io', 'uk')
              THEN NULLIF(regexp_extract(host,
                   '([^.]+[.][^.]+)$', 1), '')
              ELSE NULL END AS etld1 FROM h)
        SELECT etld1, count(*) AS n_docs FROM r
        WHERE etld1 IS NOT NULL GROUP BY etld1 ORDER BY etld1
    """).df()
    etld_ok = (etld["etld1"].tolist() == want["etld1"].tolist()
               and np.array_equal(
                   etld["n_docs"].to_numpy().astype(np.int64),
                   want["n_docs"].to_numpy().astype(np.int64)))

    print(json.dumps({
        "docs": args.docs,
        "leaks_found": int(len(got)),
        "exact_planted": int(len(exp_exact)),
        "near_planted": int(len(exp_near)),
        "exact_match": exact_ok, "near_match": near_ok,
        "etld_rows": int(len(etld)), "etld_match": etld_ok,
        "leak_s": round(leak_s, 1), "etld_s": round(etld_s, 1),
    }))
    if not (exact_ok and near_ok and etld_ok):
        sys.exit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
