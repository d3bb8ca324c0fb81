"""Incremental-extraction soak: snapshot-over-snapshot reuse at
bench-corpus volume.

Builds crawl snapshot v2 from the fixture corpus by perturbing a
deterministic ~2% of payloads (url-hash selected, payload-appended
marker), then checks the three invariants that make incremental
processing trustworthy at 100 TB:

  1. run_incremental(v2, prior=v1_out) re-extracts EXACTLY the
     perturbed url set (rows_extracted == planted count);
  2. its output is url-for-url fingerprint-identical to a full
     re-extraction of v2 — carried rows are byte-equal to what
     re-extraction would have produced;
  3. the carried mass never re-enters the extraction pool (the
     metrics record's carry/extract split is exact).

    python scripts/scale_soak_incremental.py [--multiplier 25]
        [--change-pct 2]
"""
from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _perturb(src_dir: str, dst_dir: str, change_pct: int) -> int:
    """Copy the corpus, appending a marker to a deterministic
    url-hash-selected slice of payloads. Returns the changed count."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    changed = 0
    for f in sorted(glob.glob(os.path.join(src_dir, "*.parquet"))):
        t = pq.read_table(f)
        urls = t["url"].to_pylist()
        sel = [int(hashlib.md5(u.encode()).hexdigest()[:4], 16) % 100
               < change_pct for u in urls]
        html = t["html"].to_pylist()
        for i, s in enumerate(sel):
            if s:
                html[i] = (html[i] or b"") + b"<!-- snapshot-2 -->"
                changed += 1
        t = t.set_column(t.schema.get_field_index("html"), "html",
                         pa.array(html, t["html"].type))
        _ = pc  # (vector path not worth it for a one-shot soak copy)
        pq.write_table(t, os.path.join(dst_dir, os.path.basename(f)))
    return changed


CHILD = r"""
import glob, hashlib, json, os, sys
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ocr_model_ray.pipelines.checkpoint import run_resumable
from ocr_model_ray.pipelines.extract_pipeline import ExtractConfig
from ocr_model_ray.pipelines.incremental import run_incremental

mode, inp, out = sys.argv[1], sys.argv[2], sys.argv[3]
cfg = ExtractConfig(emit="summary")
if mode == "full":
    rec = run_resumable(inp, out, cfg, num_partitions=32)
else:
    rec = run_incremental(inp, sys.argv[4], out, cfg,
                          num_partitions=32)

import pandas as pd
import pyarrow.parquet as pq
acc = {}
for f in glob.glob(os.path.join(out, "data", "**", "*.parquet"),
                   recursive=True):
    b = pq.read_table(f, columns=["url", "extracted_text"]).to_pandas()
    for u, t in zip(b["url"], b["extracted_text"]):
        acc[u] = hashlib.md5((t or "").encode()).hexdigest()
fp = hashlib.md5(json.dumps(sorted(acc.items())).encode()).hexdigest()
print("REC " + json.dumps({"n": len(acc), "fingerprint": fp,
                           "rows_carried": rec.get("rows_carried"),
                           "rows_extracted": rec.get("rows_extracted",
                                                     rec.get("rows_written"))}))
ray.shutdown()
"""


def _child(*args: str) -> dict:
    import subprocess
    p = subprocess.run([sys.executable, "-c", CHILD, *args],
                       cwd=REPO, capture_output=True, text=True)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("REC ")]
    assert p.returncode == 0 and line, p.stderr[-2000:]
    return json.loads(line[0][4:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=25)
    ap.add_argument("--change-pct", type=int, default=2)
    args = ap.parse_args()

    import __ray_entry__ as em
    v1 = em._fixture_dir("t2", multiplier=args.multiplier,
                         rows_per_file=2000)
    work = tempfile.mkdtemp(prefix="inc_soak_")
    try:
        v2 = os.path.join(work, "v2")
        planted = _perturb(v1, v2, args.change_pct)

        t = time.time()
        _child("full", v1, os.path.join(work, "out_v1"))
        t_full_v1 = round(time.time() - t, 1)

        t = time.time()
        inc = _child("incremental", v2, os.path.join(work, "out_v2"),
                     os.path.join(work, "out_v1"))
        t_inc = round(time.time() - t, 1)

        t = time.time()
        full = _child("full", v2, os.path.join(work, "out_v2_full"))
        t_full_v2 = round(time.time() - t, 1)

        ok = (inc["fingerprint"] == full["fingerprint"]
              and inc["n"] == full["n"] and inc["n"] > 0
              and inc["rows_extracted"] == planted)
        print(json.dumps({
            "soak": "PASS" if ok else "FAIL",
            "docs": inc["n"], "planted_changes": planted,
            "rows_extracted": inc["rows_extracted"],
            "rows_carried": inc["rows_carried"],
            "fingerprint_equal": inc["fingerprint"] == full["fingerprint"],
            "sec_full_v1": t_full_v1, "sec_incremental": t_inc,
            "sec_full_v2": t_full_v2}))
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
