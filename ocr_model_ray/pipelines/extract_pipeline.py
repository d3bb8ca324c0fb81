"""The flagship extraction pipeline (SURVEY.md §3.4):

    read_parquet(pages) -> derive(mime, content_hash, size) map_batches
      -> [optional] exact-dedup groupby(content_hash)
      -> ExtractWorker actor pool (HTML / digital-PDF / OCR branches)
      -> `extracted` Dataset  [-> rows/regions/tables explodes]

Everything streams: no take_all/to_pandas/materialize on the main path;
the raw ``html`` payload column exists only up to the extract stage
(whose output is a brand-new EXTRACTED_SCHEMA table, so multi-MB blobs
never travel further than they must — SURVEY.md §4.2 memory note).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import ray.data as rd

from ..sources.pages import read_pages
from ..stages.derive import derive_batch
from ..stages.dedup import distinct_by_hash
from ..stages.explode import regions_batch, rows_batch, tables_batch
from ..stages.extract import ExtractWorker


@dataclass
class ExtractConfig:
    """Stage knobs (profiles in pipelines.profiles).

    * ``dedup``: run the D1 exact-dedup shuffle before extraction.
    * ``max_pages``: per-doc page cap (0 = unlimited; BASIC mode = 3 in
      the reference, worker/document_processor.py:128-136).
    * ``batch_size``: docs per extract batch. None (default) = whole
      blocks — measured ~8x faster than small batches (Ray's batch
      slicing + output rebundling dominates otherwise); memory stays
      bounded because blocks themselves are capped by
      DataContext.target_max_block_size and oversized rows are isolated
      by dynamic block splitting. Set a small value only for stages
      whose per-row memory is huge (real image OCR).
    * ``concurrency``: extract actor-pool size; None = stateless tasks
      (elastic, fine since the stub OCR has no real weights — a real
      model deployment sets (min, max) actors).
    """
    dedup: bool = False
    max_pages: int = 0
    batch_size: Optional[int] = None
    concurrency: Optional[int | tuple[int, int]] = None
    num_cpus: float = 1.0
    #: "full" materializes the nested regions/rows/tables layout columns;
    #: "summary" emits only text + stats (same values; ~2x less allocator
    #: pressure — use when downstream drops the layout anyway)
    emit: str = "full"
    #: OCR engine: "stub" (deterministic, golden-reproducible default)
    #: or "auto" (Tesseract/Paddle when installed — stages.engines).
    engine: str = "stub"
    #: M10 fast mode: cap scanned-image longest side at 1600 px (area
    #: averaging) before OCR — reference
    #: worker/document_processor.py:406-424. Opt-in; goldens use the
    #: default (off).
    fast: bool = False
    #: override_num_blocks for the read: set to ~4x cluster CPUs so the
    #: read FUSES with derive+extract into one task (payload blocks never
    #: round-trip the object store). None = Ray's default splitting.
    num_blocks: Optional[int] = None


def derived_pages(paths: str | Sequence[str],
                  num_blocks: Optional[int] = None,
                  pages_transform=None) -> rd.Dataset:
    """pages corpus with derived columns (content_hash/mime/size).

    ``pages_transform(ds) -> ds`` runs on the RAW pages dataset, before
    any derived work — resumable runs drop already-done partitions here
    so a resume skips the expensive stages, not just the write."""
    kwargs = {} if num_blocks is None else {"override_num_blocks": num_blocks}
    ds = read_pages(paths, **kwargs)
    if pages_transform is not None:
        ds = pages_transform(ds)
    return ds.map_batches(derive_batch, batch_format="pyarrow")


def extract_pipeline(paths: str | Sequence[str],
                     cfg: ExtractConfig | None = None,
                     pages_transform=None) -> rd.Dataset:
    """Build the lazy `extracted` Dataset for a pages corpus."""
    cfg = cfg or ExtractConfig()
    ds = derived_pages(paths, num_blocks=cfg.num_blocks,
                       pages_transform=pages_transform)
    if cfg.dedup:
        ds = distinct_by_hash(ds)
    kwargs = dict(batch_format="pyarrow", batch_size=cfg.batch_size,
                  num_cpus=cfg.num_cpus)
    ctor = {"max_pages": cfg.max_pages, "emit": cfg.emit,
            "engine": cfg.engine, "fast": cfg.fast}
    if cfg.concurrency is not None:
        # actor pool: class + concurrency
        return ds.map_batches(ExtractWorker, concurrency=cfg.concurrency,
                              fn_constructor_kwargs=ctor, **kwargs)
    worker = ExtractWorker(**ctor)
    return ds.map_batches(worker, **kwargs)


def rows_table(extracted: rd.Dataset) -> rd.Dataset:
    """`extracted` -> flat `rows` output table (M12)."""
    return extracted.map_batches(rows_batch, batch_format="pyarrow")


def regions_table(extracted: rd.Dataset) -> rd.Dataset:
    """`extracted` -> flat regions/char-span table."""
    return extracted.map_batches(regions_batch, batch_format="pyarrow")


def tables_table(extracted: rd.Dataset) -> rd.Dataset:
    """`extracted` -> flat table-structure table."""
    return extracted.map_batches(tables_batch, batch_format="pyarrow")


#: Columns cheap enough to keep when a consumer only wants text + stats.
SUMMARY_COLUMNS = ["url", "content_hash", "mime", "doc_kind", "extracted_text",
                   "n_pages", "confidence", "word_count", "char_count",
                   "table_count", "region_count", "size_bytes", "error"]


def extracted_summary(extracted: rd.Dataset) -> rd.Dataset:
    """Projection of `extracted` without the nested layout columns."""
    return extracted.select_columns(SUMMARY_COLUMNS)
