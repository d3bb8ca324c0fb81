"""Extraction determinism soak: the north rule's core invariant —
byte-identical extracted text per url — checked at bench-corpus volume
ACROSS PARALLELISM LEVELS. The flagship pipeline runs in two fresh
processes (num_cpus=8 and num_cpus=32) over the same 415k-page corpus;
the outputs must agree url-for-url on the md5 of extracted_text (and
on every summary stat), proving no batch-boundary, scheduling-order or
parallelism effect leaks into the extraction semantics.

    python scripts/scale_soak_extract.py [--multiplier 100]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import hashlib, json, os, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[2]),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pandas as pd
from ocr_model_ray.pipelines.extract_pipeline import (ExtractConfig,
                                                      extract_pipeline)

ds = extract_pipeline(sys.argv[1], ExtractConfig(emit="summary"))
acc = {}
for b in ds.iter_batches(batch_format="pandas", batch_size=None):
    for u, t, wc, cc, conf in zip(b["url"], b["extracted_text"],
                                  b["word_count"], b["char_count"],
                                  b["confidence"]):
        h = hashlib.md5((t or "").encode("utf-8")).hexdigest()
        acc[u] = (h, int(wc), int(cc), round(float(conf), 9))
# one order-independent fingerprint + the row count
rows = sorted(acc.items())
total = hashlib.md5(json.dumps(rows).encode()).hexdigest()
print("FPR " + json.dumps({"n": len(rows), "fingerprint": total}))
ray.shutdown()
"""


def run_child(corpus: str, ncpu: int) -> dict:
    p = subprocess.run([sys.executable, "-c", CHILD, corpus, str(ncpu)],
                       cwd=REPO, capture_output=True, text=True)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("FPR ")]
    assert p.returncode == 0 and line, p.stderr[-2000:]
    return json.loads(line[0][4:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=100)
    args = ap.parse_args()

    import __ray_entry__ as em
    corpus = em._fixture_dir("t2", multiplier=args.multiplier,
                             rows_per_file=2000)

    t = time.time()
    a = run_child(corpus, 8)
    ta = round(time.time() - t, 1)
    t = time.time()
    b = run_child(corpus, 32)
    tb = round(time.time() - t, 1)
    ok = a == b and a["n"] > 0
    print(json.dumps({"soak": "PASS" if ok else "FAIL",
                      "docs": a["n"], "sec_8cpu": ta, "sec_32cpu": tb,
                      "fingerprint_equal": bool(a == b),
                      "fingerprint": a["fingerprint"][:16]}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
