"""Multimodal plumbing soak: the image decode / feature actor-pool
stages on ~1 GB of binary payloads — the 'large binary columns need
small batches + actor pools' part of the design, at volume.

    python scripts/scale_soak_multimodal.py [--rows 100000]

Corpus: pseudo-PNG containers (the deterministic decode path; real
image libs are stubbed in this environment) of 4-16 KB each, plus a
planted 0.5% of corrupt payloads that must DEAD-LETTER into the error
column without failing any task. Checks, all independent of the stage
code: row-count preservation, metadata equal to an in-process parse of
a 10k sample, unit-norm embeddings, bit-identical embeddings across
two runs at different concurrency, and exact dead-letter count.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_DIR = "/tmp/ocr_model_ray_soak"


def build_corpus(rows: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ocr_model_ray.spec import PSEUDO_PNG_HEADER

    out = os.path.join(SOAK_DIR, f"imgs_x{rows}")
    marker = out + "._DONE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(5)
    per_file = 5000
    for f0 in range(0, rows, per_file):
        dst = os.path.join(out, f"part_{f0 // per_file:04d}.parquet")
        if os.path.exists(dst):
            continue
        ids, payloads = [], []
        for i in range(f0, min(f0 + per_file, rows)):
            ids.append(f"img{i:07d}")
            if i % 200 == 199:           # planted corrupt payload
                payloads.append(b"\x00garbage" + bytes([i % 256]) * 64)
                continue
            n_words = 40 + (i % 160)
            body = {"w": 640 + (i % 1280), "h": 480 + (i % 720),
                    "words": [f"w{i}_{j}" for j in range(n_words)],
                    "pad": "x" * int(rng.randint(2000, 12000))}
            payloads.append(PSEUDO_PNG_HEADER
                            + json.dumps(body).encode())
        t = pa.table({"id": pa.array(ids, pa.string()),
                      "image": pa.array(payloads, pa.large_binary())})
        pq.write_table(t, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
    open(marker, "w").write("ok")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ocr_model_ray.stages.multimodal import (_decode_meta,
                                                 decode_images,
                                                 embed_images)

    corpus = build_corpus(args.rows)
    size = rd.read_parquet(corpus).size_bytes()
    print(json.dumps({"corpus": corpus, "size_bytes": int(size)}),
          flush=True)
    all_ok = True

    # --- decode stage ---------------------------------------------------
    t = time.time()
    meta = decode_images(rd.read_parquet(corpus), concurrency=8,
                         batch_size=64).to_pandas()
    sec = round(time.time() - t, 2)
    n_bad = int(meta["error"].notna().sum())
    want_bad = args.rows // 200
    sample = meta.sort_values("id").iloc[::max(1, len(meta) // 10_000)]
    import duckdb
    con = duckdb.connect()
    con.register("want_ids", pd.DataFrame({"id": sample["id"]}))
    raw = con.sql(f"SELECT id, image FROM "
                  f"read_parquet('{corpus}/part_*.parquet') "
                  f"JOIN want_ids USING (id)").df()
    ok_meta = True
    for r in raw.itertuples():
        m = meta.loc[meta["id"] == r.id].iloc[0]
        try:
            want = _decode_meta(bytes(r.image))
            ok_meta &= (m["width"] == want["width"]
                        and m["height"] == want["height"]
                        and m["n_objects"] == want["n_objects"]
                        and m["error"] is None or pd.isna(m["error"]))
        except ValueError:
            ok_meta &= pd.notna(m["error"])
    ok = (len(meta) == args.rows and n_bad == want_bad and bool(ok_meta))
    print(json.dumps({"stage": "decode", "seconds": sec,
                      "rows": len(meta), "dead_lettered": n_bad,
                      "expected_dead": want_bad,
                      "sample_meta_equal": bool(ok_meta),
                      "match": bool(ok)}), flush=True)
    all_ok &= ok

    # --- feature stage: unit-norm + concurrency-independence -----------
    t = time.time()
    e1 = embed_images(rd.read_parquet(corpus), concurrency=8,
                      batch_size=64).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    e2 = embed_images(rd.read_parquet(corpus), concurrency=2,
                      batch_size=256).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    sec = round(time.time() - t, 2)
    m1 = np.stack(e1["embedding"].to_numpy())
    m2 = np.stack(e2["embedding"].to_numpy())
    ids_equal = bool((e1["id"] == e2["id"]).all())
    bit_equal = bool(np.array_equal(m1.view("int64"), m2.view("int64")))
    norms = np.linalg.norm(m1, axis=1)
    unit = bool(np.allclose(norms[~np.isnan(norms)], 1.0, atol=1e-6))
    ok = ids_equal and bit_equal and unit and len(e1) == args.rows
    print(json.dumps({"stage": "embed", "seconds": sec, "rows": len(e1),
                      "bit_equal_across_concurrency": bit_equal,
                      "unit_norm": unit, "match": bool(ok)}), flush=True)
    all_ok &= ok

    print(json.dumps({"soak": "PASS" if all_ok else "FAIL"}))
    ray.shutdown()
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
