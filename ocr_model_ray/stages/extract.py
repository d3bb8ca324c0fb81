"""Extraction stage: the actor-pool worker that turns page payloads into
assembled extraction records (SURVEY.md §3.4, reference lifecycle §3.1).

``ExtractWorker`` is a callable class for ``map_batches(ExtractWorker,
concurrency=N, batch_size=B)`` — an actor pool. Setup (spec constants,
compiled parsers, the stub OCR "model") happens once per actor in
``__init__``; ``__call__`` processes one Arrow batch. The per-row body
is inherently per-document Python (DOM/span parse), mirroring the
reference's one-document-at-a-time core (worker/document_processor.py:
261-277) — but batched, schema-stable, and dead-letter-safe: an
exception on one document becomes its ``error`` column, never a lost
block (contrast: the reference swallows processor errors with
``continue``, worker/document_processor.py:275-277).

All three branches (HTML / digital-PDF / scanned+OCR) dispatch inside
one stage so the input is read once; a heavyweight real-OCR deployment
would split the scanned rows into a dedicated GPU actor pool via a
``mime`` filter instead (documented tradeoff, SURVEY.md §7.2).
"""

from __future__ import annotations

import pyarrow as pa

from ..spec import SPEC_VERSION, assemble, assemble_summary, extract_document

_PAGE_STRUCT = pa.struct([
    ("page_num", pa.int32()), ("width", pa.int32()), ("height", pa.int32()),
    ("is_scanned", pa.bool_()), ("n_regions", pa.int32()),
])
_REGION_STRUCT = pa.struct([
    ("region_id", pa.string()), ("type", pa.string()), ("page", pa.int32()),
    ("x1", pa.float64()), ("y1", pa.float64()),
    ("x2", pa.float64()), ("y2", pa.float64()),
    ("text", pa.string()), ("char_start", pa.int64()), ("char_end", pa.int64()),
    ("conf", pa.float64()), ("needs_review", pa.bool_()),
])
_ROW_STRUCT = pa.struct([
    ("row_id", pa.string()), ("page", pa.int32()), ("region_id", pa.string()),
    ("bbox", pa.list_(pa.float64(), 4)), ("text", pa.string()),
    ("min_conf", pa.float64()), ("needs_review", pa.bool_()),
])
_CELL_STRUCT = pa.struct([
    ("r", pa.int32()), ("c", pa.int32()), ("text", pa.string()),
    ("conf", pa.float64()),
])
_TABLE_STRUCT = pa.struct([
    ("table_id", pa.string()), ("page", pa.int32()),
    ("x1", pa.float64()), ("y1", pa.float64()),
    ("x2", pa.float64()), ("y2", pa.float64()),
    ("n_rows", pa.int32()), ("n_cols", pa.int32()),
    ("cells", pa.list_(_CELL_STRUCT)),
    ("conf", pa.float64()), ("needs_review", pa.bool_()),
])

#: The `extracted` table schema (SURVEY.md §1.3). One row per url.
EXTRACTED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("content_hash", pa.string()),
    ("mime", pa.string()),
    ("doc_kind", pa.string()),
    ("extracted_text", pa.string()),
    ("n_pages", pa.int32()),
    ("confidence", pa.float64()),
    ("word_count", pa.int64()),
    ("char_count", pa.int64()),
    ("table_count", pa.int32()),
    ("region_count", pa.int32()),
    ("size_bytes", pa.int64()),
    ("error", pa.string()),
    ("pages", pa.list_(_PAGE_STRUCT)),
    ("regions", pa.list_(_REGION_STRUCT)),
    ("rows", pa.list_(_ROW_STRUCT)),
    ("tables", pa.list_(_TABLE_STRUCT)),
])

#: Summary-only output schema (emit="summary"): same values as the
#: matching EXTRACTED_SCHEMA columns, no nested layout columns.
SUMMARY_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("content_hash", pa.string()),
    ("mime", pa.string()),
    ("doc_kind", pa.string()),
    ("extracted_text", pa.string()),
    ("n_pages", pa.int32()),
    ("confidence", pa.float64()),
    ("word_count", pa.int64()),
    ("char_count", pa.int64()),
    ("table_count", pa.int32()),
    ("region_count", pa.int32()),
    ("size_bytes", pa.int64()),
    ("error", pa.string()),
])


def _result_record(url: str, res: dict, content_hash: str, mime: str,
                   size_bytes: int) -> dict:
    res = dict(res)
    res["content_hash"] = content_hash
    res["mime"] = mime
    res["size_bytes"] = size_bytes
    return res


class ExtractWorker:
    """Actor-pool extraction worker (A1-A4 analogue: model/state loaded once
    per actor; here the "model" is the deterministic stub OCR engine plus
    the compiled HTML parser machinery, all module-level in spec.py).

    Input batch (plain mode): url, html [, content_hash, mime, size_bytes].
    Input batch (dedup mode, after stages.dedup.distinct_by_hash): adds a
    ``urls: list<string>`` column; extraction runs ONCE per row (= per
    distinct content_hash) and assembly fans results out to every url,
    since region/row ids embed the url (deterministic-id rule §2.8.8).
    Output: EXTRACTED_SCHEMA rows.
    """

    def __init__(self, max_pages: int = 0, emit: str = "full",
                 engine: str = "stub", fast: bool = False) -> None:
        assert emit in ("full", "summary")
        assert engine in ("stub", "auto")
        self.max_pages = max_pages
        self.emit = emit
        self.spec_version = SPEC_VERSION
        # OCR engine resolves ONCE PER ACTOR here (A4/A10 lifecycle):
        # "auto" picks Tesseract/Paddle when installed, else the seeded
        # stub; "stub" pins the golden-reproducible default.
        if engine == "auto":
            from .engines import ocr_engine
            self.ocr = ocr_engine()
        else:
            self.ocr = None  # spec default (ocr_stub)
        if fast:
            # M10: 1600px cap before OCR (engines.fast_downscale_ocr);
            # wrap resolves once per actor, like the engine itself
            from .engines import fast_downscale_ocr
            self.ocr = fast_downscale_ocr(self.ocr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = set(batch.schema.names)
        has_meta = "content_hash" in names
        fanout = "urls" in names
        urls = batch["url"].to_pylist()
        # to_pylist on the binary column yields bytes in one C pass —
        # avoids per-row ChunkedArray chunk lookups
        payloads = batch["html"].to_pylist()
        hashes = batch["content_hash"].to_pylist() if has_meta else None
        mimes = batch["mime"].to_pylist() if has_meta else None
        sizes = batch["size_bytes"].to_pylist() if has_meta else None
        url_lists = batch["urls"].to_pylist() if fanout else None
        summary_only = self.emit == "summary"
        assemble_fn = assemble_summary if summary_only else assemble
        out: list[dict] = []
        for i in range(batch.num_rows):
            payload = payloads[i]
            doc = extract_document(payload, max_pages=self.max_pages,
                                   layout=not summary_only, ocr=self.ocr)
            ch = hashes[i] if has_meta else ""
            mime = mimes[i] if has_meta else ""
            size = sizes[i] if has_meta else len(payload)
            targets = url_lists[i] if fanout else [urls[i]]
            for u in targets:
                out.append(_result_record(u, assemble_fn(u, doc), ch, mime, size))
        if summary_only:
            # columnar build: one array per column, no nested conversion
            cols = [pa.array([r[f.name] for r in out], f.type)
                    for f in SUMMARY_SCHEMA]
            return pa.Table.from_arrays(cols, schema=SUMMARY_SCHEMA)
        return pa.Table.from_pylist(out, schema=EXTRACTED_SCHEMA)


def extract_batch(batch: pa.Table, max_pages: int = 0) -> pa.Table:
    """Stateless-function form of the same transform (for task-based stages
    and direct unit-testing)."""
    return ExtractWorker(max_pages=max_pages)(batch)


EMBEDDED_IMAGE_SCHEMA = pa.schema([
    ("url", pa.string()), ("page", pa.int32()), ("img_index", pa.int32()),
    ("filename", pa.string()), ("ext", pa.string()),
    ("width", pa.int32()), ("height", pa.int32()),
    ("image", pa.binary()), ("error", pa.string()),
])


def _png_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from a real PNG IHDR (bytes 16..24), (0,0) when the
    header is absent/short — mirrors the reference's
    ``base_image.get("size", (0, 0))`` fallback."""
    if len(payload) >= 24:
        import struct
        return struct.unpack(">II", payload[16:24])
    return (0, 0)


def embedded_images_batch(batch: pa.Table) -> pa.Table:
    """(url, html) pages batch -> one EMBEDDED_IMAGE_SCHEMA row per
    embedded page image (M6, pdf_processor.py:276-343): the reference
    walks every page's xref images and saves each as
    ``{base}_p{page}_img{idx}.{ext}``; here the decoded bytes become a
    ``binary`` side-table column instead of loose files (partitioned
    parquet is the engine's interchange), same filename/page/index
    fields. Non-PDF payloads are skipped; a malformed PDF dead-letters
    as one row with ``error`` set, like the reference's error dict."""
    import base64
    import json
    import os as _os

    from ..spec import (JPEG_MAGIC, PDF_MAGIC, PSEUDO_PNG_HEADER,
                        parse_pseudo_pdf)
    urls = batch["url"].to_pylist()
    payloads = batch["html"].to_pylist()
    out = []
    for url, payload in zip(urls, payloads):
        if not payload.startswith(PDF_MAGIC):
            continue
        base = _os.path.splitext(_os.path.basename(url.rstrip("/")) or
                                 "document")[0]
        try:
            doc = parse_pseudo_pdf(payload)
        except ValueError as exc:
            out.append({"url": url, "page": 0, "img_index": 0,
                        "filename": None, "ext": None, "width": 0,
                        "height": 0, "image": None,
                        "error": f"Failed to extract images: {exc}"})
            continue
        for page_num, page in enumerate(doc.get("pages") or [], start=1):
            img_b64 = page.get("image")
            if not img_b64:
                continue
            try:
                img = base64.b64decode(img_b64)
            except (ValueError, TypeError):
                continue
            if img.startswith(PSEUDO_PNG_HEADER):
                ext = "png"
                try:
                    body = json.loads(
                        img[len(PSEUDO_PNG_HEADER):].decode("utf-8"))
                    width, height = int(body.get("w", 0)), int(body.get("h", 0))
                except (ValueError, UnicodeDecodeError):
                    width, height = _png_dims(img)
            elif img.startswith(JPEG_MAGIC):
                ext, (width, height) = "jpeg", (0, 0)
            else:
                ext, (width, height) = "bin", (0, 0)
            out.append({
                "url": url, "page": page_num, "img_index": 1,
                "filename": f"{base}_p{page_num}_img1.{ext}",
                "ext": ext, "width": width, "height": height,
                "image": img, "error": None})
    return pa.Table.from_pylist(out, schema=EMBEDDED_IMAGE_SCHEMA)


PDF_META_SCHEMA = pa.schema([
    ("url", pa.string()), ("title", pa.string()), ("author", pa.string()),
    ("page_count", pa.int32()), ("file_size", pa.int64()),
    ("has_toc", pa.bool_()), ("has_links", pa.bool_()),
    ("has_images", pa.bool_()), ("form_fields", pa.bool_()),
    ("error", pa.string()),
])


def pdf_metadata_batch(batch: pa.Table) -> pa.Table:
    """(url, html) pages batch -> PDF_META_SCHEMA rows for the PDF rows
    (M5 projection; non-PDF payloads are skipped). Use after a mime
    filter, e.g. derived_pages(...).filter(mime == application/pdf)."""
    from ..spec import PDF_MAGIC, pdf_metadata
    urls = batch["url"].to_pylist()
    payloads = batch["html"].to_pylist()
    out = []
    for url, payload in zip(urls, payloads):
        if not payload.startswith(PDF_MAGIC):
            continue
        m = pdf_metadata(payload)
        out.append({
            "url": url,
            "title": m.get("title"), "author": m.get("author"),
            "page_count": m.get("page_count", 0),
            "file_size": m.get("file_size", len(payload)),
            "has_toc": bool(m.get("has_toc")),
            "has_links": bool(m.get("has_links")),
            "has_images": bool(m.get("has_images")),
            "form_fields": bool(m.get("form_fields")),
            "error": m.get("error"),
        })
    return pa.Table.from_pylist(out, schema=PDF_META_SCHEMA)
