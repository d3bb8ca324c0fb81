"""Annotated-PDF export (S9) — pure-stdlib PDF writer.

The reference draws region/table overlay boxes onto PDF pages with
PyMuPDF (worker/pipeline/processors/exporter.py:369-485: one output
page per document page, rectangles per region colored by type, dashed
table frames, small type/confidence labels). fitz/reportlab aren't in
this container, so this module writes the PDF file format directly —
a PDF page of vector rectangles and Helvetica labels is a short
uncompressed content stream plus a cross-reference table, the same
way stages/xlsx.py writes the XLSX container directly.

Layout per extracted row: one page object per ``pages`` entry
(MediaBox = page pixel size), region boxes stroked in the type color
with a "<type> <conf>" label above, row boxes stroked thin by
confidence, table boxes stroked dashed — the same overlay semantics as
stages/debug_export.render_debug_svg, so the two sinks stay visually
interchangeable. Output is deterministic bytes (no timestamps, no ids;
object offsets are a pure function of content), viewable in any PDF
reader.
"""

from __future__ import annotations

from .debug_export import REGION_COLORS, _FALLBACK_SIZE

#: label font size (pt) — matches the SVG overlay's 8px labels
_FONT_SIZE = 8


def _conf_rgb(c: float) -> tuple[float, float, float]:
    """Red (0.0) -> green (1.0) confidence ramp (exporter.py:380-385),
    as a 0-1 triple (the SVG sink's conf_color emits CSS rgb() text)."""
    c = max(0.0, min(1.0, float(c)))
    return (1.0 - c, c, 0.0)


def _esc(s: str) -> str:
    """PDF literal-string escape; non-Latin-1 chars degrade to '?'
    (labels are type names + numbers, so this is effectively a no-op)."""
    s = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return s.encode("latin-1", "replace").decode("latin-1")


def _rgb_ops(color: tuple[float, float, float]) -> str:
    """Stroke + fill color operators from a (r, g, b) 0-1 triple."""
    r, g, b = (round(c, 4) for c in color)
    return f"{r} {g} {b} RG {r} {g} {b} rg"


def _rect(x1: float, y1: float, x2: float, y2: float, h: int) -> str:
    """'re' operator with the y axis flipped (PDF origin is bottom-left;
    token/region boxes are top-left pixel coordinates)."""
    return (f"{round(x1, 2)} {round(h - y2, 2)} "
            f"{round(x2 - x1, 2)} {round(y2 - y1, 2)} re S")


def _label(x: float, y: float, text: str, h: int) -> str:
    ty = min(h - 2.0, h - y + 2.0)  # just above the box, clamped
    return (f"BT /F1 {_FONT_SIZE} Tf {round(x, 2)} {round(ty, 2)} Td "
            f"({_esc(text)}) Tj ET")


def _page_stream(pn: int, w: int, h: int, regions, rows, tables) -> bytes:
    ops = ["0.75 w"]
    for r in regions:
        color = REGION_COLORS.get(r["type"], REGION_COLORS["region"])
        ops.append(_rgb_ops(color))
        ops.append("1.5 w")
        ops.append(_rect(r["x1"], r["y1"], r["x2"], r["y2"], h))
        ops.append(_label(r["x1"], r["y1"],
                          f'{r["type"]} {r["conf"]:.2f}', h))
    for row in rows:
        x1, y1, x2, y2 = row["bbox"]
        ops.append(_rgb_ops(_conf_rgb(row["min_conf"])))
        ops.append("0.5 w")
        ops.append(_rect(x1, y1, x2, y2, h))
    if tables:
        ops.append(_rgb_ops(REGION_COLORS["table"]))
        ops.append("2 w [4 2] 0 d")
        for t in tables:
            ops.append(_rect(t["x1"], t["y1"], t["x2"], t["y2"], h))
        ops.append("[] 0 d")
    return "\n".join(ops).encode("latin-1")


def render_annotated_pdf(extracted_row: dict) -> bytes:
    """One deterministic PDF for one `extracted` row: a page per
    ``pages`` entry with the overlay boxes drawn as vector strokes."""
    def _items(key):
        v = extracted_row.get(key)
        return [] if v is None else list(v)

    pages = _items("pages")
    by_page = {}
    for kind in ("regions", "rows", "tables"):
        for item in _items(kind):
            pn = item["page"]
            by_page.setdefault(pn, {"regions": [], "rows": [],
                                    "tables": []})[kind].append(item)

    # objects: 1 Catalog, 2 Pages, 3 Font, then (page, content) pairs
    n_pages = max(len(pages), 1)
    page_meta = []
    for i in range(n_pages):
        p = pages[i] if i < len(pages) else {"page_num": 1}
        w = int(p.get("width") or 0) or _FALLBACK_SIZE[0]
        h = int(p.get("height") or 0) or _FALLBACK_SIZE[1]
        page_meta.append((p.get("page_num", i + 1), w, h))

    objs: list[bytes] = []
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] "
                f"/Count {n_pages} >>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>")
    for i, (pn, w, h) in enumerate(page_meta):
        d = by_page.get(pn, {"regions": [], "rows": [], "tables": []})
        stream = _page_stream(pn, w, h, d["regions"], d["rows"],
                              d["tables"])
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode())
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(stream), stream))

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def annotated_pdf_export(extracted):
    """Dataset stage: full-emit `extracted` -> (url, pdf:binary) rows —
    the PDF twin of debug_export.debug_svg_export."""
    import pyarrow as pa

    def batch_fn(batch: pa.Table) -> pa.Table:
        urls, pdfs = [], []
        for row in batch.to_pylist():
            urls.append(row["url"])
            pdfs.append(render_annotated_pdf(row))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "pdf": pa.array(pdfs, pa.binary())})

    return extracted.map_batches(batch_fn, batch_format="pyarrow")
