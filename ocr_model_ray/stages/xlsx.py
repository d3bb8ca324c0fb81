"""Minimal stdlib XLSX writer + the per-document Excel export (S9).

The reference exports one workbook per document via pandas/openpyxl
(exporter.py:232-283): sheet "Extracted", one row per region with
columns page_num / region_type / text [/ x1 y1 x2 y2] [/ confidence],
plus one row per non-empty table cell typed ``table_cell_<id>_r<r>_c<c>``.
openpyxl isn't in this container, so the workbook is built directly:
an .xlsx file is a zip of five XML parts, strings go inline
(t="inlineStr" — no sharedStrings table needed), numbers as plain
``<v>``. Readable by Excel/LibreOffice/openpyxl/pandas.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


_XML_ILLEGAL = dict.fromkeys(
    [c for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)])


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # non-finite floats have no OOXML number form — emit an empty
        # cell (what openpyxl does) instead of an unparseable <v>nan</v>
        if isinstance(value, float) and value != value or value in (
                float("inf"), float("-inf")):
            return ""
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    # strip control chars that are illegal in XML 1.0 (a binary-ish
    # payload sniffed as HTML can leak them into extracted text and
    # would make the whole sheet unparseable)
    text = escape(str(value).translate(_XML_ILLEGAL))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def workbook_bytes(headers: list[str], rows: list[list],
                   sheet_name: str = "Extracted") -> bytes:
    """Build a single-sheet .xlsx as bytes."""
    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    for rn, row in enumerate([headers] + rows, start=1):
        cells = "".join(_cell_xml(f"{_col_letter(ci)}{rn}", v)
                        for ci, v in enumerate(row))
        lines.append(f'<row r="{rn}">{cells}</row>')
    lines.append("</sheetData></worksheet>")
    sheet = "\n".join(lines)

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        parts = [("[Content_Types].xml", _CONTENT_TYPES),
                 ("_rels/.rels", _RELS),
                 ("xl/workbook.xml",
                  _WORKBOOK.format(name=escape(sheet_name))),
                 ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
                 ("xl/worksheets/sheet1.xml", sheet)]
        for name, data in parts:
            # fixed timestamp: zip local headers embed mtime, and a
            # workbook rendered twice must be byte-identical (the
            # engine-wide no-wall-clock rule; measured as a one-second
            # flake in the serve-equals-synthesize test)
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o600 << 16
            z.writestr(info, data)
    return buf.getvalue()


HEADERS = ["page_num", "region_type", "text", "x1", "y1", "x2", "y2",
           "confidence"]


def render_xlsx(extracted_row: dict) -> bytes:
    """Per-document workbook with the reference's row layout
    (exporter.py:244-269): one row per region, then one row per
    non-empty table cell typed table_cell_<table>_r<r>_c<c>."""
    rows: list[list] = []
    for r in extracted_row.get("regions") or []:
        rows.append([r["page"], r["type"], r["text"],
                     r["x1"], r["y1"], r["x2"], r["y2"], r["conf"]])
    for t in extracted_row.get("tables") or []:
        for cell in t.get("cells") or []:
            if not cell.get("text"):
                continue
            rows.append([t["page"],
                         f"table_cell_{t['table_id']}_r{cell['r']}_c{cell['c']}",
                         cell["text"], t["x1"], t["y1"], t["x2"], t["y2"],
                         cell["conf"]])
    return workbook_bytes(HEADERS, rows)


def xlsx_export(extracted):
    """Dataset stage: `extracted` (full emit) -> (url, xlsx:binary)."""
    import pyarrow as pa

    def batch_fn(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "xlsx": pa.array([render_xlsx(r) for r in rows], pa.binary()),
        })

    return extracted.map_batches(batch_fn, batch_format="pyarrow")
