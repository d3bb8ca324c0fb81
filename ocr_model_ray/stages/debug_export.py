"""Annotated debug export (reference exporter.py:369-485).

The reference draws region/table boxes onto PDF pages with PyMuPDF;
fitz isn't in this container, so the annotation layer renders as SVG —
one overlay per page, region boxes colored per type (the reference's
REGION_COLORS map), confidence shown as a red->green stroke on token
rows, table boxes dashed. SVG is stdlib-writable, viewable anywhere,
and structurally testable; when fitz exists the same geometry could be
stamped onto real pages (documented boundary).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

#: reference REGION_COLORS (exporter.py:387-398), as CSS rgb() strings
REGION_COLORS = {
    "header": (0.0, 0.55, 0.8),
    "footer": (0.0, 0.4, 0.6),
    "paragraph": (0.2, 0.8, 0.2),
    "title": (0.8, 0.2, 0.8),
    "subheading": (0.6, 0.3, 0.8),
    "list": (0.8, 0.5, 0.2),
    "table": (0.8, 0.2, 0.2),
    "figure": (0.6, 0.6, 0.2),
    "image": (0.2, 0.6, 0.8),
    "region": (0.2, 0.2, 0.2),
}
_FALLBACK_SIZE = (595, 842)  # A4 points, exporter.py:423


def _rgb(c: tuple[float, float, float]) -> str:
    return "rgb({},{},{})".format(*(int(round(v * 255)) for v in c))


def conf_color(c: float) -> str:
    """Red (0.0) -> green (1.0) confidence ramp (exporter.py:380-385)."""
    c = max(0.0, min(1.0, float(c)))
    return _rgb((1.0 - c, c, 0.0))


def render_debug_svg(extracted_row: dict) -> list[tuple[int, str]]:
    """One (page_num, svg) overlay per page: region boxes colored by
    type with a type label, row boxes stroked by confidence, table
    boxes dashed red."""
    regions_by_page: dict[int, list[dict]] = {}
    for r in extracted_row.get("regions") or []:
        regions_by_page.setdefault(r["page"], []).append(r)
    rows_by_page: dict[int, list[dict]] = {}
    for r in extracted_row.get("rows") or []:
        rows_by_page.setdefault(r["page"], []).append(r)
    tables_by_page: dict[int, list[dict]] = {}
    for t in extracted_row.get("tables") or []:
        tables_by_page.setdefault(t["page"], []).append(t)

    out = []
    for p in extracted_row.get("pages") or []:
        pn = p["page_num"]
        w = int(p.get("width") or 0) or _FALLBACK_SIZE[0]
        h = int(p.get("height") or 0) or _FALLBACK_SIZE[1]
        parts = [f'<svg xmlns="http://www.w3.org/2000/svg" '
                 f'width="{w}" height="{h}" viewBox="0 0 {w} {h}">']
        for r in regions_by_page.get(pn, []):
            color = _rgb(REGION_COLORS.get(r["type"],
                                           REGION_COLORS["region"]))
            parts.append(
                f'<rect class="region" x="{r["x1"]}" y="{r["y1"]}" '
                f'width="{r["x2"] - r["x1"]}" height="{r["y2"] - r["y1"]}" '
                f'fill="none" stroke="{color}" stroke-width="1.5"/>')
            parts.append(
                f'<text x="{r["x1"]}" y="{max(r["y1"] - 2, 8)}" '
                f'font-size="8" fill="{color}">'
                f'{escape(r["type"])} {r["conf"]:.2f}</text>')
        for row in rows_by_page.get(pn, []):
            x1, y1, x2, y2 = row["bbox"]
            parts.append(
                f'<rect class="row" x="{x1}" y="{y1}" '
                f'width="{x2 - x1}" height="{y2 - y1}" fill="none" '
                f'stroke="{conf_color(row["min_conf"])}" '
                f'stroke-width="0.5"/>')
        for t in tables_by_page.get(pn, []):
            parts.append(
                f'<rect class="table" x="{t["x1"]}" y="{t["y1"]}" '
                f'width="{t["x2"] - t["x1"]}" height="{t["y2"] - t["y1"]}" '
                f'fill="none" stroke="{_rgb(REGION_COLORS["table"])}" '
                f'stroke-width="2" stroke-dasharray="4 2"/>')
        parts.append("</svg>")
        out.append((pn, "\n".join(parts)))
    return out


def debug_svg_export(extracted):
    """Dataset stage: full-emit `extracted` -> (url, page, svg) rows."""
    import pyarrow as pa

    def batch_fn(batch: pa.Table) -> pa.Table:
        urls, pages, svgs = [], [], []
        for row in batch.to_pylist():
            for pn, svg in render_debug_svg(row):
                urls.append(row["url"])
                pages.append(pn)
                svgs.append(svg)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "page": pa.array(pages, pa.int32()),
                         "svg": pa.array(svgs, pa.string())})

    return extracted.map_batches(batch_fn, batch_format="pyarrow")
