"""Generate the committed golden tables (FIXTURES.md §2) — run ONCE.

Pure-Python path (no Ray): fixtures.pages_table -> derive_batch ->
extract_batch, sorted by url. The pytest suite re-runs the same corpus
through the Ray pipeline at multiple parallelism levels and asserts
full-table equality (byte-identical extracted_text per url included).

Usage: python scripts/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_model_ray.fixtures import pages_table  # noqa: E402
from ocr_model_ray.stages.derive import derive_batch  # noqa: E402
from ocr_model_ray.stages.extract import extract_batch  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "goldens")


def canonical(table: pa.Table) -> pa.Table:
    idx = pc.sort_indices(table["url"])
    return table.take(idx).combine_chunks()


def main() -> None:
    for tier in ("t1", "t2"):
        pages = pages_table(seed=0, tier=tier)
        extracted = canonical(extract_batch(derive_batch(pages)))
        out_dir = os.path.join(GOLDEN_DIR, tier)
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(extracted, os.path.join(out_dir, "extracted.parquet"))
        print(tier, extracted.num_rows, "rows ->", out_dir)


if __name__ == "__main__":
    main()
