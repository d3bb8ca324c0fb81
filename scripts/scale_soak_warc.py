"""WARC container soak: the fixture corpus (multi-MB giant blobs,
malformed rows, every payload kind) round-trips through the
distributed WARC sink and the streaming reader at volume, with
throughput numbers for both directions.

Invariants: record count preserved; per-url payload md5 equal to the
source corpus (order-independent fingerprint over url -> md5); reader
parallelism = one task per shard file.

    python scripts/scale_soak_warc.py [--multiplier 25]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=25)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as em
    from ocr_model_ray.sources.warc import read_warc, write_warc_dir

    corpus = em._fixture_dir("t2", multiplier=args.multiplier,
                             rows_per_file=2000)

    def fingerprint(ds) -> tuple[int, str]:
        def per_batch(t: pa.Table) -> pa.Table:
            urls = t["url"].to_pylist()
            hs = [hashlib.md5(p or b"").hexdigest()
                  for p in t["html"].to_pylist()]
            return pa.table({"url": urls, "h": hs})
        acc = {}
        for b in ds.map_batches(per_batch, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            for u, h in zip(b["url"].to_pylist(), b["h"].to_pylist()):
                acc[u] = h
        # order-independent digest
        rows = sorted(acc.items())
        return (len(rows),
                hashlib.md5(json.dumps(rows).encode()).hexdigest())

    src = rd.read_parquet(corpus, columns=["url", "warc_ts", "html"])
    n_src, fp_src = fingerprint(src)
    total_bytes = int(sum(os.path.getsize(os.path.join(corpus, f))
                          for f in os.listdir(corpus)))

    out_dir = tempfile.mkdtemp(prefix="warc_soak_")
    try:
        t0 = time.time()
        receipts = write_warc_dir(
            rd.read_parquet(corpus, columns=["url", "warc_ts", "html"]),
            out_dir).materialize()
        t_write = time.time() - t0
        n_written = int(receipts.sum("n_records") or 0)
        n_shards = len(os.listdir(out_dir))
        warc_bytes_total = sum(os.path.getsize(os.path.join(out_dir, f))
                               for f in os.listdir(out_dir))

        t1 = time.time()
        back = read_warc(out_dir)
        n_back, fp_back = fingerprint(back)
        t_read = time.time() - t1

        ok = (n_written == n_src and n_back == n_src
              and fp_back == fp_src and n_src > 0)
        print(json.dumps({
            "soak": "PASS" if ok else "FAIL",
            "docs": n_src, "shards": n_shards,
            "warc_gb": round(warc_bytes_total / 1e9, 2),
            "src_parquet_gb": round(total_bytes / 1e9, 2),
            "fingerprint_equal": fp_back == fp_src,
            "write_sec": round(t_write, 1),
            "write_docs_per_sec": round(n_src / t_write, 1),
            "read_sec": round(t_read, 1),
            "read_docs_per_sec": round(n_src / t_read, 1),
            "read_mb_per_sec": round(warc_bytes_total / 1e6 / t_read, 1),
        }))
        return 0 if ok else 1
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
