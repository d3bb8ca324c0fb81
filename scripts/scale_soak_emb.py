"""Embedding scale soak: run the vector operators on a corpus
replicated above the 128 MB size cut and verify against DuckDB
(label stats, brute-force kNN) or an independent recompute
(cosine near-dup, where an O(N^2) SQL oracle is infeasible).

    python scripts/scale_soak_emb.py [--replicas 250] [--ops all]

Corpus: sf0.1 embeddings (2k vectors, dim 64) replicated R times with
vec_id offsets and a per-replica DIAGONAL +-1 SIGN FLIP: an orthogonal
transform, so within-replica cosines (and norms) are bit-identical to
the base corpus while cross-replica similarity is scrambled — replicas
don't collapse into one giant duplicate cluster the way verbatim
copies would. Queries (vec_id < 10) live only in replica 0.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SOAK_DIR = "/tmp/ocr_model_ray_soak"
OTHER = ["region", "nation", "customer", "supplier", "part", "orders",
         "lineitem", "documents", "events"]


def build_corpus(replicas: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SOAK_DIR, f"emb_x{replicas}")
    marker = out + "._DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in OTHER:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    base = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    n = base.num_rows
    mat = np.stack(base["embedding"].to_pandas().to_numpy())  # (n, d)
    dim = mat.shape[1]
    rng = np.random.RandomState(11)
    d = os.path.join(out, "embeddings.parquet")
    os.makedirs(d, exist_ok=True)
    for r in range(replicas):
        flips = (rng.randint(0, 2, dim) * 2 - 1).astype(np.float32) \
            if r else np.ones(dim, np.float32)
        m = mat * flips[None, :]
        t = pa.table({
            "vec_id": pa.array(
                base["vec_id"].to_numpy(zero_copy_only=False) + r * n,
                pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), dim).cast(
                pa.list_(pa.float32())),
            "label": base["label"],
        })
        pq.write_table(t, os.path.join(d, f"part_{r:04d}.parquet"))
    open(marker, "w").write("ok")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=300)
    ap.add_argument("--ops", default="all")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    corpus = build_corpus(args.replicas)

    import duckdb
    import numpy as np
    import pandas as pd
    import __ray_entry__ as em
    import tests.test_queries_oracle as tq

    con = duckdb.connect()
    for t in OTHER + ["embeddings", "documents"]:
        p = os.path.join(corpus, f"{t}.parquet")
        src = f"{p}/part_*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{src}')")

    qs, sqls = em.queries(), em.oracle_sql()
    all_ok = True

    def run_sql(name):
        nonlocal all_ok
        t = time.time()
        got = tq._canon(tq._to_pandas(qs[name](corpus)))
        sec = round(time.time() - t, 2)
        t = time.time()
        want = tq._canon(con.sql(sqls[name]).df())
        osec = round(time.time() - t, 2)
        ok = len(got) == len(want) and list(got.columns) == list(want.columns)
        if ok:
            for c in got.columns:
                g = got[c].reset_index(drop=True)
                w = want[c].reset_index(drop=True)
                if pd.api.types.is_float_dtype(g):
                    ok &= bool(np.array_equal(
                        g.astype(float).values.view("int64"),
                        w.astype(float).values.view("int64")))
                else:
                    ok &= bool((g == w).all())
        print(json.dumps({"query": name, "seconds": sec,
                          "rows": len(got), "match": bool(ok),
                          "oracle_seconds": osec}), flush=True)
        all_ok &= ok

    ops = args.ops.split(",") if args.ops != "all" else [
        "emb_label_stats", "emb_knn_bruteforce", "emb_near_dup",
        "emb_quantize", "emb_knn_int8"]

    for name in ["emb_label_stats", "emb_knn_bruteforce",
                 "emb_quantize", "emb_knn_int8"]:
        if name in ops:
            run_sql(name)

    if "emb_near_dup" in ops:
        # no feasible O(N^2) SQL oracle; structural checks instead:
        # every emitted pair's cosine recomputed independently in
        # numpy float64 (the oracle's arithmetic), bit-exactly
        t = time.time()
        got = tq._to_pandas(qs["emb_near_dup"](corpus))
        sec = round(time.time() - t, 2)
        t = time.time()
        ids = sorted(set(got["vec_a"]) | set(got["vec_b"]))
        con.register("want_ids", pd.DataFrame({"vec_id": ids}))
        vec = con.sql("SELECT vec_id, embedding FROM embeddings "
                      "JOIN want_ids USING (vec_id)").df()
        vmap = {int(r.vec_id): np.asarray(r.embedding, np.float64)
                for r in vec.itertuples()}

        def cos(a, b):
            va, vb = vmap[int(a)], vmap[int(b)]
            return round(float(va @ vb /
                               (np.sqrt(va @ va) * np.sqrt(vb @ vb))), 5)

        want_sim = np.array([cos(a, b) for a, b in
                             zip(got["vec_a"], got["vec_b"])])
        exact = np.array_equal(want_sim.view("int64"),
                               got["sim"].to_numpy().view("int64"))
        ordered = bool((got["vec_a"] < got["vec_b"]).all())
        thr = bool((got["sim"] >= 0.4).all())
        ok = bool(exact and ordered and thr and len(got) > 0)
        print(json.dumps({"query": "emb_near_dup", "seconds": sec,
                          "rows": len(got), "match": ok,
                          "cosine_exact": bool(exact),
                          "check_seconds": round(time.time() - t, 2)}),
              flush=True)
        all_ok &= ok

    import ray.data as rd
    emb_path = os.path.join(corpus, "embeddings.parquet")

    if "emb_near_dup_hi" in ops or args.ops == "all":
        # a higher threshold (0.5 — the corpus has no 0.8 pairs):
        # hyperplane buckets stay small, recall near target — same
        # independent float64 check
        from ocr_model_ray.functions.similarity import cosine_near_dup
        t = time.time()
        got = cosine_near_dup(rd.read_parquet(
            os.path.join(corpus, "embeddings.parquet")), threshold=0.5)
        sec = round(time.time() - t, 2)
        t = time.time()
        ids = sorted(set(got["vec_a"]) | set(got["vec_b"]))
        con.register("want_ids_hi", pd.DataFrame({"vec_id": ids}))
        vec = con.sql("SELECT vec_id, embedding FROM embeddings "
                      "JOIN want_ids_hi USING (vec_id)").df()
        vmap = {int(r.vec_id): np.asarray(r.embedding, np.float64)
                for r in vec.itertuples()}

        def cos_hi(a, b):
            va, vb = vmap[int(a)], vmap[int(b)]
            return round(float(va @ vb /
                               (np.sqrt(va @ va) * np.sqrt(vb @ vb))), 5)

        ws = np.array([cos_hi(a, b) for a, b in
                       zip(got["vec_a"], got["vec_b"])])
        exact = (np.array_equal(ws.view("int64"),
                                got["sim"].to_numpy().view("int64"))
                 if len(got) else True)
        thr_ok = bool((got["sim"] >= 0.5).all()) if len(got) else True
        ok = bool(exact and thr_ok and len(got) > 0)
        print(json.dumps({"query": "emb_near_dup_hi_threshold",
                          "seconds": sec, "rows": len(got),
                          "cosine_exact": bool(exact),
                          "match": ok,
                          "check_seconds": round(time.time() - t, 2)}),
              flush=True)
        all_ok &= ok

    if "emb_kmeans" in ops or args.ops == "all":
        # structural: every assignment is (within one 1e-5 sim-grid
        # step of) the argmax centroid, recomputed independently in
        # numpy for a 20k sample; all k clusters populated
        from ocr_model_ray.functions.clustering import (kmeans_assign,
                                                        kmeans_fit)
        t = time.time()
        ds = rd.read_parquet(emb_path)
        cent = kmeans_fit(ds, k=8, train_size=50_000)
        assigned = kmeans_assign(ds, cent).to_pandas()
        sec = round(time.time() - t, 2)
        t = time.time()
        sample = assigned.sort_values("vec_id").iloc[::max(1, len(assigned) // 20_000)]
        con.register("want_ids2",
                     pd.DataFrame({"vec_id": sample["vec_id"]}))
        vec = con.sql("SELECT vec_id, embedding FROM embeddings "
                      "JOIN want_ids2 USING (vec_id)").df()
        m = np.stack(vec["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        c = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        sims = m @ c.T
        best = sims.max(axis=1)
        got_sim = sims[np.arange(len(m)),
                       sample.set_index("vec_id").loc[
                           vec["vec_id"], "cluster"].to_numpy()]
        within = bool((best - got_sim <= 1e-5 + 1e-12).all())
        populated = assigned["cluster"].nunique() == 8
        ok = within and populated and len(assigned) == ds.count()
        print(json.dumps({"query": "emb_kmeans", "seconds": sec,
                          "rows": len(assigned), "match": bool(ok),
                          "argmax_within_grid": within,
                          "clusters_populated": bool(populated),
                          "check_seconds": round(time.time() - t, 2)}),
              flush=True)
        all_ok &= ok

    if "emb_ann_recall" in ops or args.ops == "all":
        # ANN recall vs the exact scan at volume (structural floor; the
        # measured number is the report)
        from ocr_model_ray.functions.similarity import (ivf_knn,
                                                        knn_bruteforce,
                                                        lsh_knn)
        qdf = con.sql("SELECT vec_id, embedding FROM embeddings "
                      "WHERE vec_id < 10 ORDER BY vec_id").df()
        t = time.time()
        exact = knn_bruteforce(rd.read_parquet(emb_path), qdf, k=5)
        e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
        recalls = {}
        for name, fn in (("lsh", lsh_knn), ("ivf", ivf_knn)):
            approx = fn(rd.read_parquet(emb_path), qdf, k=5)
            a = {(r.query_id, r.neighbor_id)
                 for r in approx.itertuples()}
            recalls[name] = round(len(e & a) / len(e), 3)
        ok = all(r >= 0.2 for r in recalls.values())
        print(json.dumps({"query": "emb_ann_recall",
                          "seconds": round(time.time() - t, 2),
                          "recall": recalls, "match": bool(ok)}),
              flush=True)
        all_ok &= ok

    print(json.dumps({"soak": "PASS" if all_ok else "FAIL"}))
    ray.shutdown()
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
