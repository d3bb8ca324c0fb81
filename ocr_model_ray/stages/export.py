"""Export renderers (S9): the reference's 6-format exporter surface
(worker/pipeline/processors/exporter.py:62-548) re-expressed as
vectorized batch transforms + Dataset sinks.

* parquet  — canonical interchange (`extracted` / `rows` tables).
* csv      — flat rows table, bbox exploded to x1..y2 columns
             (_export_csv:166-230 column shape).
* txt      — markdown-ish rendering per url, mirroring the reference's
             rules (_export_txt:487-548): "=== Page N ===" page headers,
             "## " headings, "* " list items; code/quote blocks fenced.
* json     — one canonical JSON document per url (results-dict shape of
             worker/document_processor.py:847-891, minus wall-clock
             fields — deterministic by construction).
* xml      — per-url <document><page><region .../></page></document>
             (_export_xml:285-367 shape, deterministic attribute order).

The reference's timestamped output filenames (exporter.py:74-75) are
non-deterministic and replaced by content-derived paths. The annotated-
PDF export (_export_pdf:369-485) is a debug-only visualization in the
reference and is intentionally out of engine scope.
"""

from __future__ import annotations

import json


import pyarrow as pa
import ray.data as rd


def rows_to_csv_batch(batch: pa.Table) -> pa.Table:
    """Flat rows batch -> CSV-ready columns (bbox exploded)."""
    import pyarrow.compute as pc
    bbox = batch["bbox"]
    if isinstance(bbox, pa.ChunkedArray):
        bbox = bbox.combine_chunks()
    flat = pc.list_flatten(bbox)
    n = batch.num_rows
    coords = [flat.take(pa.array(range(i, 4 * n, 4))) for i in range(4)]
    out = batch.drop_columns(["bbox"])
    for name, arr in zip(("x1", "y1", "x2", "y2"), coords):
        out = out.append_column(name, arr)
    return out


def regions_csv_batch(batch: pa.Table) -> pa.Table:
    """Reference-shaped CSV rows (_export_csv:166-230): one row per
    region (page_num, region_type, text, x1..y2, confidence) plus one
    per non-empty table cell with region_type
    ``table_cell_<table_id>_r<r>_c<c>``."""
    rows = batch.to_pylist()
    out = {k: [] for k in ("url", "page_num", "region_type", "text",
                           "x1", "y1", "x2", "y2", "confidence")}

    def emit(url, page, rtype, text, x1, y1, x2, y2, conf):
        out["url"].append(url)
        out["page_num"].append(page)
        out["region_type"].append(rtype)
        out["text"].append(text)
        out["x1"].append(float(x1))
        out["y1"].append(float(y1))
        out["x2"].append(float(x2))
        out["y2"].append(float(y2))
        out["confidence"].append(float(conf))

    for rec in rows:
        for r in rec.get("regions") or []:
            emit(rec["url"], r["page"], r["type"], r["text"],
                 r["x1"], r["y1"], r["x2"], r["y2"], r["conf"])
        for t in rec.get("tables") or []:
            for cell in t.get("cells") or []:
                if not cell["text"]:
                    continue
                emit(rec["url"], t["page"],
                     f"table_cell_{t['table_id']}_r{cell['r']}_c{cell['c']}",
                     cell["text"], t["x1"], t["y1"], t["x2"], t["y2"],
                     cell["conf"])
    return pa.table({
        "url": pa.array(out["url"], pa.string()),
        "page_num": pa.array(out["page_num"], pa.int32()),
        "region_type": pa.array(out["region_type"], pa.string()),
        "text": pa.array(out["text"], pa.string()),
        "x1": pa.array(out["x1"], pa.float64()),
        "y1": pa.array(out["y1"], pa.float64()),
        "x2": pa.array(out["x2"], pa.float64()),
        "y2": pa.array(out["y2"], pa.float64()),
        "confidence": pa.array(out["confidence"], pa.float64()),
    })


_HEAD_PREFIX = {"heading": "## ", "list_item": "* "}


def render_txt(extracted_row: dict) -> str:
    """Markdown-ish TXT per url — exporter.py:487-548 rules: "=== Page N
    ===" headers, blank line after every element, "## " headings, "* "
    list items, tables as "Table N:" with pipe-separated, width-aligned
    cells. (code/quote fencing covers region types the reference's HTML-
    less pipeline never produced.)"""
    lines: list[str] = []
    regions_by_page: dict[int, list[dict]] = {}
    for r in extracted_row.get("regions") or []:
        regions_by_page.setdefault(r["page"], []).append(r)
    tables_by_page: dict[int, list[dict]] = {}
    for t in extracted_row.get("tables") or []:
        tables_by_page.setdefault(t["page"], []).append(t)
    for p in extracted_row.get("pages") or []:
        pn = p["page_num"]
        lines.append(f"=== Page {pn} ===")
        lines.append("")
        for r in regions_by_page.get(pn, []):
            t = r["type"]
            if t == "code":
                lines.extend(["```", r["text"], "```"])
            elif t == "quote":
                lines.append("> " + r["text"])
            else:
                lines.append(_HEAD_PREFIX.get(t, "") + r["text"])
            lines.append("")
        for ti, table in enumerate(tables_by_page.get(pn, [])):
            lines.append(f"Table {ti + 1}:")
            n_rows, n_cols = table["n_rows"], table["n_cols"]
            grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
            for cell in table.get("cells") or []:
                if cell["r"] < n_rows and cell["c"] < n_cols:
                    grid[cell["r"]][cell["c"]] = cell["text"]
            widths = [max([len(grid[r][c]) for r in range(n_rows)] or [0])
                      for c in range(n_cols)]
            for row in grid:
                lines.append("|" + "".join(
                    f" {row[c].ljust(widths[c])} |" for c in range(n_cols)))
            lines.append("")
        lines.append("")
    return "\n".join(lines).rstrip("\n")


def render_json(extracted_row: dict) -> str:
    """Canonical per-url JSON (sorted keys, no wall-clock fields)."""
    doc = {
        "url": extracted_row["url"],
        "doc_kind": extracted_row["doc_kind"],
        "extracted_text": extracted_row["extracted_text"],
        "confidence": extracted_row["confidence"],
        "summary": {
            "word_count": extracted_row["word_count"],
            "char_count": extracted_row["char_count"],
            "page_count": extracted_row["n_pages"],
            "table_count": extracted_row["table_count"],
        },
        "pages": extracted_row.get("pages") or [],
        "regions": extracted_row.get("regions") or [],
        "tables": extracted_row.get("tables") or [],
        "error": extracted_row.get("error"),
    }
    return json.dumps(doc, sort_keys=True, ensure_ascii=False)


def render_xml(extracted_row: dict) -> str:
    """Per-url XML in the reference's element structure
    (_export_xml:285-367): Document/Pages/Page/Regions/Region with
    nested BoundingBox + Text, Tables/Table/Rows/Row/Cell. Attribute
    order deterministic; ids are the engine's url-derived ids; char-span
    attributes are kept on Region (engine extension — the reference has
    no span offsets)."""
    import xml.etree.ElementTree as ET

    root = ET.Element("Document")
    root.set("id", extracted_row["url"])
    root.set("kind", extracted_row["doc_kind"])
    regions_by_page: dict[int, list[dict]] = {}
    for r in extracted_row.get("regions") or []:
        regions_by_page.setdefault(r["page"], []).append(r)
    tables_by_page: dict[int, list[dict]] = {}
    for t in extracted_row.get("tables") or []:
        tables_by_page.setdefault(t["page"], []).append(t)

    pages_elem = ET.SubElement(root, "Pages")
    for p in extracted_row.get("pages") or []:
        pn = p["page_num"]
        page_elem = ET.SubElement(pages_elem, "Page")
        page_elem.set("number", str(pn))
        regions_elem = ET.SubElement(page_elem, "Regions")
        for r in regions_by_page.get(pn, []):
            region_elem = ET.SubElement(regions_elem, "Region")
            region_elem.set("type", r["type"])
            region_elem.set("id", r["region_id"])
            region_elem.set("confidence", f"{r['conf']:.6f}")
            region_elem.set("charStart", str(r["char_start"]))
            region_elem.set("charEnd", str(r["char_end"]))
            bbox_elem = ET.SubElement(region_elem, "BoundingBox")
            for k in ("x1", "y1", "x2", "y2"):
                bbox_elem.set(k, str(r[k]))
            ET.SubElement(region_elem, "Text").text = r["text"]
        tables_elem = ET.SubElement(page_elem, "Tables")
        for t in tables_by_page.get(pn, []):
            table_elem = ET.SubElement(tables_elem, "Table")
            table_elem.set("id", t["table_id"])
            rows_elem = ET.SubElement(table_elem, "Rows")
            by_row: dict[int, list[dict]] = {}
            for cell in t.get("cells") or []:
                by_row.setdefault(cell["r"], []).append(cell)
            for r_idx in sorted(by_row):
                row_elem = ET.SubElement(rows_elem, "Row")
                row_elem.set("index", str(r_idx))
                for cell in sorted(by_row[r_idx], key=lambda c: c["c"]):
                    cell_elem = ET.SubElement(row_elem, "Cell")
                    cell_elem.set("col", str(cell["c"]))
                    cell_elem.set("confidence", f"{cell['conf']:.6f}")
                    ET.SubElement(cell_elem, "Text").text = cell["text"]
    return ET.tostring(root, encoding="unicode")


def _render_batch(batch: pa.Table, renderer, col: str) -> pa.Table:
    rows = batch.to_pylist()
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        col: pa.array([renderer(r) for r in rows], pa.string()),
    })


def txt_export(extracted: rd.Dataset) -> rd.Dataset:
    """(url, txt) rendering of the extracted table."""
    return extracted.map_batches(lambda b: _render_batch(b, render_txt, "txt"),
                                 batch_format="pyarrow")


def json_export(extracted: rd.Dataset) -> rd.Dataset:
    return extracted.map_batches(lambda b: _render_batch(b, render_json, "json"),
                                 batch_format="pyarrow")


def xml_export(extracted: rd.Dataset) -> rd.Dataset:
    return extracted.map_batches(lambda b: _render_batch(b, render_xml, "xml"),
                                 batch_format="pyarrow")


def write_all_formats(extracted: rd.Dataset, out_dir: str) -> dict:
    """Write parquet + csv + txt + json + xml renderings under out_dir.
    Returns per-format paths. Each rendering streams; nothing
    materializes on the driver."""
    from ..stages.explode import rows_batch
    paths = {}
    paths["parquet"] = f"{out_dir}/parquet"
    extracted.write_parquet(paths["parquet"])
    rows = extracted.map_batches(rows_batch, batch_format="pyarrow") \
                    .map_batches(rows_to_csv_batch, batch_format="pyarrow")
    paths["csv"] = f"{out_dir}/csv"
    rows.write_csv(paths["csv"])
    paths["csv_regions"] = f"{out_dir}/csv_regions"
    extracted.map_batches(regions_csv_batch, batch_format="pyarrow") \
             .write_csv(paths["csv_regions"])
    for name, fn in (("txt", txt_export), ("json", json_export),
                     ("xml", xml_export)):
        paths[name] = f"{out_dir}/{name}"
        fn(extracted).write_parquet(paths[name])
    from .xlsx import xlsx_export
    paths["xlsx"] = f"{out_dir}/xlsx"
    xlsx_export(extracted).write_parquet(paths["xlsx"])
    from .pdf_export import annotated_pdf_export
    paths["pdf"] = f"{out_dir}/pdf"
    annotated_pdf_export(extracted).write_parquet(paths["pdf"])
    return paths


EXPORT_MEDIA_TYPES = {
    "json": "application/json",
    "csv": "text/csv",
    "xlsx": ("application/vnd.openxmlformats-officedocument"
             ".spreadsheetml.sheet"),
    "txt": "text/plain",
    "xml": "application/xml",
    "pdf": "application/pdf",
}


def export_on_the_fly(out_dir: str, url: str, fmt: str = "json"
                      ) -> tuple[bytes, str, str]:
    """Per-document download with format synthesis (S11,
    api/routers/results.py:29-130): serve the pre-rendered export from
    ``out_dir`` (the write_all_formats layout) when it exists, else
    synthesize the requested format on the fly from the canonical
    extracted parquet. Returns (content, filename, media_type) — the
    engine-side twin of the reference endpoint's FileResponse.

    Driver-side by design: this is a single-document fetch (parquet
    predicate pushdown on ``url``), not a corpus pass. Raises
    ValueError for an unsupported format, LookupError when the url has
    no extracted row (the reference's 400/404 branches)."""
    import os
    import re

    import pyarrow.dataset as pads

    fmt = fmt.lower()
    if fmt not in EXPORT_MEDIA_TYPES:
        raise ValueError(f"Unsupported format: {fmt}. "
                         f"Supported: {', '.join(sorted(EXPORT_MEDIA_TYPES))}")
    slug = re.sub(r"[^A-Za-z0-9._-]+", "_", url).strip("_") or "document"
    filename = f"{slug}_result.{fmt}"
    media = EXPORT_MEDIA_TYPES[fmt]

    def _lookup(dirname: str, col: str):
        path = os.path.join(out_dir, dirname)
        if not os.path.isdir(path):
            return None
        dataset = pads.dataset(path, format="parquet")
        t = dataset.to_table(columns=["url", col],
                             filter=pads.field("url") == url)
        if t.num_rows == 0:
            return None
        return t[col][0].as_py()

    # serve directly from the pre-rendered store if present
    pre = {"json": ("json", "json"), "txt": ("txt", "txt"),
           "xml": ("xml", "xml"), "xlsx": ("xlsx", "xlsx"),
           "pdf": ("pdf", "pdf")}.get(fmt)
    if pre is not None:
        hit = _lookup(*pre)
        if hit is not None:
            content = hit if isinstance(hit, bytes) else hit.encode("utf-8")
            return content, filename, media

    # synthesize from the canonical extracted parquet
    canon = os.path.join(out_dir, "parquet")
    if not os.path.isdir(canon):
        canon = out_dir  # out_dir IS the extracted parquet
    dataset = pads.dataset(canon, format="parquet")
    t = dataset.to_table(filter=pads.field("url") == url)
    if t.num_rows == 0:
        raise LookupError(f"No results found for {url}")
    row = t.to_pylist()[0]
    if fmt == "json":
        return render_json(row).encode("utf-8"), filename, media
    if fmt == "txt":
        return render_txt(row).encode("utf-8"), filename, media
    if fmt == "xml":
        return render_xml(row).encode("utf-8"), filename, media
    if fmt == "xlsx":
        from .xlsx import render_xlsx
        return render_xlsx(row), filename, media
    if fmt == "pdf":
        from .pdf_export import render_annotated_pdf
        return render_annotated_pdf(row), filename, media
    # csv: the reference's _results_to_csv_bytes row layout == our
    # regions_csv_batch columns
    import io as _io

    import pyarrow.csv as pacsv
    table = regions_csv_batch(pa.Table.from_pylist([row]))
    buf = _io.BytesIO()
    pacsv.write_csv(table, buf)
    return buf.getvalue(), filename, media
