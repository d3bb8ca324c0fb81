"""Machine-ceiling probe: run the EXACT per-document extraction work
under plain multiprocessing (no Ray, no data movement) at two process
counts. This bounds what any engine can achieve on this box — the
sandbox's single shared memory bus stops scaling well before 4x for
allocation-heavy parse workloads. Referenced by BASELINE.md.

Usage: python scripts/mp_ceiling.py [replicas=16]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def work(args):
    rows, = args
    from ocr_model_ray.spec import assemble_summary, extract_document
    for r in rows:
        assemble_summary(r["url"], extract_document(r["html"], layout=False))


def main() -> None:
    import os
    sys.path.insert(0, ".")
    from ocr_model_ray.fixtures import generate_rows
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    rows = generate_rows(0, "t2") * replicas
    out = {"docs": len(rows)}
    for n in (lo, hi):
        chunks = [(rows[i::n],) for i in range(n)]
        with mp.Pool(n) as p:
            p.map(work, [(rows[:50],)] * n)  # warm forks
            t0 = time.time()
            p.map(work, chunks)
            wall = time.time() - t0
        out[f"docs_per_sec_{n}"] = round(len(rows) / wall, 1)
    # bench.py reads the 8/32-named keys regardless of lo/hi
    out["docs_per_sec_8"] = out[f"docs_per_sec_{lo}"]
    out["docs_per_sec_32"] = out[f"docs_per_sec_{hi}"]
    out["ceiling_efficiency"] = round(
        out["docs_per_sec_32"] / out["docs_per_sec_8"] / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
