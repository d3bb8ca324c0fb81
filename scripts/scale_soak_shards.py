"""Round-4 soak: global pseudo-shuffle shard assignment + sliding
chunking at volume, verified against DuckDB's independent replay of
the frozen semantics (ROW_NUMBER over (md5, id); list-slice windows
on a deterministic synthetic token stream).

Usage: python scripts/scale_soak_shards.py --docs 1250000
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
    ap.add_argument("--shard-size", type=int, default=2048)
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

    from ocr_model_ray.functions.chunking import chunk_windows
    from ocr_model_ray.functions.shards import global_shuffle_shards

    N = args.docs
    S = args.shard_size
    ids = np.arange(N, dtype=np.int64) * 3 + 5

    # ---------------- shard assignment at volume ----------------
    t0 = time.time()
    docs = rd.from_pandas(pd.DataFrame({"doc_id": ids})) \
        .repartition(args.cpus * 4).materialize()
    build_s = time.time() - t0

    t0 = time.time()
    got = (global_shuffle_shards(docs, S, mode="distributed")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    run_s = time.time() - t0

    t0 = time.time()
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": ids}))
    truth = con.execute(f"""
        WITH o AS (SELECT doc_id, ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                       - 1 AS rk FROM d)
        SELECT doc_id, CAST(rk AS BIGINT) AS rank,
               CAST(rk // {S} AS BIGINT) AS shard,
               CAST(rk % {S} AS BIGINT) AS pos
        FROM o ORDER BY doc_id""").df()
    oracle_s = time.time() - t0

    shard_ok = (len(got) == len(truth) and all(
        (got[c].to_numpy().astype(np.int64)
         == truth[c].to_numpy().astype(np.int64)).all()
        for c in ("doc_id", "rank", "shard", "pos")))
    sizes = got.groupby("shard").size()
    full_ok = bool((sizes.iloc[:-1] == S).all()) \
        and int(sizes.iloc[-1]) == (N % S or S)

    # ---------------- chunking at volume -------------------------
    # deterministic token counts; verify aggregate invariants in
    # closed form (full text replay at this volume is the oracle
    # test's job at sf scale)
    n_words = (ids * 7919 + 13) % 300
    C, T = 64, 48

    def synth(t) -> "pd.DataFrame":
        d = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
        w = (d["doc_id"].to_numpy() * 7919 + 13) % 300
        d["text"] = pd.Series(w).map(
            lambda k: " ".join(["w"] * int(k)))
        return d

    t0 = time.time()
    corpus = docs.map_batches(synth, batch_format="pandas")
    ch = chunk_windows(corpus, chunk_size=C, stride=T)

    def agg(t) -> pd.DataFrame:
        d = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
        return pd.DataFrame({
            "n_chunks": [len(d)],
            "tok": [int(d["n_tokens"].sum())],
            "text_toks": [int(d["chunk_text"].str.split().str.len()
                              .sum())]})

    a = ch.map_batches(agg, batch_format="pandas").to_pandas().sum()
    chunk_s = time.time() - t0

    exp_chunks = np.where(
        n_words > 0,
        1 + np.maximum(0, n_words - C + T - 1) // T, 0)
    # exact token total: full chunks contribute C each except the
    # last, which has n - (k-1)*T tokens (when n > 0)
    k = exp_chunks
    last = np.where(n_words > 0, n_words - (k - 1) * T, 0)
    exp_tok = np.where(n_words > 0, (k - 1) * C + last, 0)
    chunk_ok = (int(a["n_chunks"]) == int(exp_chunks.sum())
                and int(a["tok"]) == int(exp_tok.sum())
                and int(a["text_toks"]) == int(exp_tok.sum()))

    print(json.dumps({
        "docs": N, "shard_size": S, "cpus": args.cpus,
        "build_s": round(build_s, 1),
        "shard_assign_s": round(run_s, 1),
        "shard_oracle_s": round(oracle_s, 1),
        "shard_bit_equal": bool(shard_ok),
        "shards_full": bool(full_ok),
        "chunk_s": round(chunk_s, 1),
        "chunks": int(a["n_chunks"]),
        "chunk_invariants_ok": bool(chunk_ok),
        "pass": bool(shard_ok and full_ok and chunk_ok)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
