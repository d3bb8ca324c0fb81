"""Round-4 soak: token-vote classifier at volume, verified against
DuckDB's independent replay of the counts, the HUGEINT cross-multiply
votes, and the per-doc vote sums — plus the planted-separability
check (labeled docs classify back to their own class).

Corpus: deterministic token soup — doc i draws 12 words from a
class-specific 4-word vocabulary sharing one 'meh' token; every third
doc is unlabeled and mixes both vocabularies.

Usage: python scripts/scale_soak_classifier.py --docs 1250000
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
    ap.add_argument("--regime", default="bcast",
                    choices=["bcast", "join"])
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

    from ocr_model_ray.functions.classifier import token_vote_classifier

    N = args.docs
    POS = np.array(["good", "fine", "nice", "meh"])
    NEG = np.array(["bad", "awful", "poor", "meh"])
    MIX = np.array(["good", "bad", "meh", "nice"])

    def synth(ids: np.ndarray) -> pd.DataFrame:
        lab = np.where(ids % 3 == 0, 1,
                       np.where(ids % 3 == 1, 0, -1))
        # deterministic 12-word draws from the class vocabulary via
        # a splitmix-ish integer hash — no RNG state, partition-safe
        texts = []
        for i, l in zip(ids, lab):
            h = (np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)
                 + np.uint64(np.arange(12))
                 * np.uint64(0xBF58476D1CE4E5B9))
            w = (h >> np.uint64(33)).astype(np.int64) % 4
            voc = POS if l == 1 else NEG if l == 0 else MIX
            texts.append(" ".join(voc[w]))
        return pd.DataFrame({"doc_id": ids.astype(np.int64),
                             "text": texts,
                             "label": lab.astype(np.int64)})

    t0 = time.time()
    base = rd.range(N).repartition(args.cpus * 4)

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        return synth(b["id"].to_numpy())

    docs = base.map_batches(mk, batch_format="pandas").materialize()
    build_s = time.time() - t0

    t0 = time.time()
    out = token_vote_classifier(
        docs, mode="distributed",
        vocab_broadcast_rows=0 if args.regime == "join"
        else 2_000_000)
    run_s = time.time() - t0

    # DuckDB independent replay over the identical frame
    t0 = time.time()
    frame = docs.to_pandas()
    con = duckdb.connect()
    con.register("documents", frame)
    truth = con.execute("""
        WITH tok AS (SELECT doc_id, label,
                unnest(list_filter(string_split_regex(
                    text, '[ \t\n\r\f\v]+'), x -> x <> '')) AS tok
                FROM documents),
        cnt AS (SELECT tok,
                CAST(sum(CASE WHEN label=1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS np_,
                CAST(sum(CASE WHEN label=0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS nn
                FROM tok WHERE label IN (0,1) GROUP BY tok),
        tot AS (SELECT CAST(coalesce(sum(np_),0) AS BIGINT) AS tp,
                       CAST(coalesce(sum(nn),0) AS BIGINT) AS tn,
                       CAST(count(*) AS BIGINT) AS v FROM cnt),
        vote AS (SELECT tok,
                 CASE WHEN CAST(np_+1 AS HUGEINT)*(tn+v)
                         > CAST(nn+1 AS HUGEINT)*(tp+v) THEN 1
                      WHEN CAST(np_+1 AS HUGEINT)*(tn+v)
                         < CAST(nn+1 AS HUGEINT)*(tp+v) THEN -1
                      ELSE 0 END AS vote FROM cnt, tot),
        sc AS (SELECT t.doc_id,
               CAST(sum(CASE WHEN v.vote=1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS votes_pos,
               CAST(sum(CASE WHEN v.vote=-1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS votes_neg,
               CAST(count(*) AS BIGINT) AS n_tokens
               FROM tok t LEFT JOIN vote v USING (tok)
               GROUP BY t.doc_id)
        SELECT doc_id, votes_pos, votes_neg, n_tokens,
               CAST(CASE WHEN votes_pos > votes_neg THEN 1 ELSE 0 END
                    AS BIGINT) AS pred
        FROM sc ORDER BY doc_id""").df()
    oracle_s = time.time() - t0

    got = out.sort_values("doc_id").reset_index(drop=True)
    bit_equal = (len(got) == len(truth) and all(
        (got[c].to_numpy().astype(np.int64)
         == truth[c].to_numpy().astype(np.int64)).all()
        for c in got.columns))

    lab = frame.set_index("doc_id")["label"]
    labeled = got[lab.reindex(got["doc_id"]).isin([0, 1]).to_numpy()]
    acc = float((labeled["pred"].to_numpy()
                 == lab.reindex(labeled["doc_id"]).to_numpy()).mean())

    print(json.dumps({
        "docs": N, "cpus": args.cpus, "regime": args.regime,
        "build_s": round(build_s, 1), "classify_s": round(run_s, 1),
        "oracle_s": round(oracle_s, 1),
        "bit_equal": bool(bit_equal),
        "train_acc": round(acc, 4),
        "pass": bool(bit_equal and acc > 0.9)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
