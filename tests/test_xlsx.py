"""XLSX export tests (S9): structural validation of the stdlib-built
workbook (no openpyxl in this container, so the zip + XML parts are
checked directly) and the reference row layout over the golden corpus."""

import io
import xml.etree.ElementTree as ET
import zipfile

import pytest

from ocr_model_ray.stages.xlsx import (
    HEADERS, _col_letter, render_xlsx, workbook_bytes, xlsx_export)

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _sheet_rows(xlsx: bytes) -> list[list]:
    with zipfile.ZipFile(io.BytesIO(xlsx)) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels",
                "xl/worksheets/sheet1.xml"} <= names
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        ET.fromstring(z.read("xl/workbook.xml"))  # well-formed
    out = []
    for row in sheet.iter(f"{NS}row"):
        vals = []
        for c in row.iter(f"{NS}c"):
            if c.get("t") == "inlineStr":
                vals.append(c.find(f"{NS}is/{NS}t").text or "")
            else:
                v = c.find(f"{NS}v")
                vals.append(float(v.text) if v is not None else None)
        out.append(vals)
    return out


def test_col_letters():
    assert [_col_letter(i) for i in (0, 1, 25, 26, 27, 701, 702)] == \
        ["A", "B", "Z", "AA", "AB", "ZZ", "AAA"]


def test_workbook_roundtrip_values_and_escaping():
    rows = [[1, "heading", "a<b>&\"c\"", 0.0, 1.5, 10.0, 2.5, 0.987],
            [2, "line", "  spaces kept  ", 0, 0, 1, 1, 1.0]]
    got = _sheet_rows(workbook_bytes(HEADERS, rows))
    assert got[0] == HEADERS
    assert got[1][1] == "heading"
    assert got[1][2] == 'a<b>&"c"'          # XML-escaped then recovered
    assert got[1][7] == pytest.approx(0.987)
    assert got[2][2] == "  spaces kept  "   # xml:space=preserve


def test_render_xlsx_reference_row_layout():
    row = {
        "url": "u", "regions": [
            {"page": 1, "type": "line", "text": "hello", "x1": 0.0,
             "y1": 0.0, "x2": 5.0, "y2": 1.0, "conf": 0.9}],
        "tables": [
            {"table_id": "t0", "page": 1, "x1": 0.0, "y1": 2.0,
             "x2": 9.0, "y2": 8.0,
             "cells": [{"r": 0, "c": 0, "text": "A", "conf": 1.0},
                       {"r": 0, "c": 1, "text": "", "conf": 1.0},
                       {"r": 1, "c": 0, "text": "B", "conf": 0.5}]}],
    }
    got = _sheet_rows(render_xlsx(row))
    assert got[1][:3] == [1.0, "line", "hello"]
    # empty table cell skipped; typed per reference exporter.py:263
    assert [r[1] for r in got[2:]] == ["table_cell_t0_r0_c0",
                                      "table_cell_t0_r1_c0"]


@pytest.mark.usefixtures("ray_session")
def test_xlsx_export_over_golden_corpus(t1_pages_dir):
    from ocr_model_ray.pipelines.extract_pipeline import extract_pipeline
    out = xlsx_export(extract_pipeline(t1_pages_dir)).to_pandas()
    assert len(out) == 69
    # every workbook parses and carries that doc's region rows
    sample = out.sort_values("url").iloc[0]
    rows = _sheet_rows(sample["xlsx"])
    assert rows[0] == HEADERS
    assert len(rows) > 1


def test_workbook_sanitizes_nan_and_control_chars():
    """Round-2 code-review regression: NaN/inf confidences and XML-1.0
    illegal control chars must not produce an unparseable sheet."""
    rows = [[1, "line", "bad\x08ctl\x00chars", 0.0, 0.0, 1.0, 1.0,
             float("nan")],
            [2, "line", "ok", 0.0, 0.0, 1.0, 1.0, float("inf")]]
    got = _sheet_rows(workbook_bytes(HEADERS, rows))  # parses cleanly
    assert got[1][2] == "badctlchars"       # control chars stripped
    assert len(got[1]) == 7                 # NaN cell omitted entirely
