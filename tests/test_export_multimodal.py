"""Tests for export renderers (S9) and the multimodal actor stages."""


import json
import os

import pyarrow as pa
import pytest

from ocr_model_ray.spec import PSEUDO_PNG_HEADER, extract_and_assemble
from ocr_model_ray.stages.export import (
    render_json, render_txt, render_xml, rows_to_csv_batch, write_all_formats,
)
from ocr_model_ray.stages.multimodal import (
    EMBED_DIM, FrameSampleWorker, ImageDecodeWorker, ImageFeatureWorker,
)

HTML = (b"<html><body><h1>Title Here</h1>"
        b"<p>First paragraph body long enough to be kept by the scorer.</p>"
        b"<ul><li>List item one long enough to be kept by the scorer ok.</li></ul>"
        b"<pre>code block content here kept as preformatted text block</pre>"
        b"</body></html>")


def _rec():
    return extract_and_assemble("https://e.test/x", HTML)


def test_render_txt_rules():
    txt = render_txt(_rec())
    assert txt.startswith("=== Page 1 ===\n\n")
    assert "## Title Here\n" in txt
    assert "* List item one" in txt
    assert "```" in txt


def test_render_txt_table_grid():
    html = (b"<html><body><p>Intro paragraph long enough to be kept here ok.</p>"
            b"<table><tr><td>a</td><td>bb</td></tr>"
            b"<tr><td>ccc</td><td>d</td></tr></table></body></html>")
    txt = render_txt(extract_and_assemble("https://e.test/t", html))
    assert "Table 1:" in txt
    assert "| a   | bb |" in txt
    assert "| ccc | d  |" in txt


def test_render_json_canonical():
    s = render_json(_rec())
    doc = json.loads(s)
    assert doc["url"] == "https://e.test/x"
    assert doc["summary"]["page_count"] == 1
    assert render_json(_rec()) == s  # deterministic


def test_render_xml_shape():
    import xml.etree.ElementTree as ET
    x = render_xml(_rec())
    root = ET.fromstring(x)
    assert root.tag == "Document" and root.get("id") == "https://e.test/x"
    regions = root.findall("./Pages/Page/Regions/Region")
    assert regions and regions[0].get("type") == "heading"
    assert regions[0].find("Text").text == "Title Here"
    assert regions[0].find("BoundingBox") is not None
    assert render_xml(_rec()) == x  # deterministic


def test_regions_csv_reference_shape():
    from ocr_model_ray.stages.export import regions_csv_batch
    import pyarrow as pa
    rec = _rec()
    out = regions_csv_batch(pa.Table.from_pylist([rec])).to_pylist()
    types = [r["region_type"] for r in out]
    assert "heading" in types and "paragraph" in types
    assert all(set(r) == {"url", "page_num", "region_type", "text",
                          "x1", "y1", "x2", "y2", "confidence"} for r in out)


def test_rows_to_csv_flattens_bbox():
    rec = _rec()
    batch = pa.table({
        "url": [rec["url"]] * len(rec["rows"]),
        "row_id": [r["row_id"] for r in rec["rows"]],
        "bbox": pa.array([r["bbox"] for r in rec["rows"]],
                         pa.list_(pa.float64(), 4)),
        "text": [r["text"] for r in rec["rows"]],
    })
    out = rows_to_csv_batch(batch)
    assert {"x1", "y1", "x2", "y2"} <= set(out.schema.names)
    assert "bbox" not in out.schema.names
    assert out.num_rows == batch.num_rows


@pytest.mark.usefixtures("ray_session")
def test_write_all_formats(t1_pages_dir, tmp_path):
    from ocr_model_ray.pipelines.extract_pipeline import extract_pipeline
    out = str(tmp_path / "exports")
    paths = write_all_formats(extract_pipeline(t1_pages_dir), out)
    assert set(paths) == {"parquet", "csv", "csv_regions", "txt", "json",
                          "xml", "xlsx", "pdf"}
    for p in paths.values():
        assert os.path.isdir(p) and os.listdir(p)
    import pyarrow.dataset as pads
    txt = pads.dataset(paths["txt"]).to_table()
    assert txt.num_rows == 69


def _pseudo_png(words):
    return PSEUDO_PNG_HEADER + json.dumps(
        {"w": 640, "h": 480, "words": words}).encode()


def test_image_decode_worker():
    batch = pa.table({
        "id": ["a", "b", "c"],
        "image": pa.array([
            _pseudo_png([["hi", 0, 0, 10, 10, 0.9]]),
            b"\x89PNG\r\n\x1a\n real png without pillow",
            b"garbage bytes",
        ], pa.large_binary()),
    })
    out = ImageDecodeWorker()(batch).to_pylist()
    assert out[0]["width"] == 640 and out[0]["n_objects"] == 1
    assert out[0]["error"] is None
    assert "NotImplementedError" in out[1]["error"]  # stub boundary
    assert "ValueError" in out[2]["error"]


def test_image_feature_worker_deterministic_unit_norm():
    import numpy as np
    batch = pa.table({"id": ["a", "b"],
                      "image": pa.array([b"img-one", b"img-two"],
                                        pa.large_binary())})
    w = ImageFeatureWorker()
    out1, out2 = w(batch), w(batch)
    assert out1.equals(out2)
    v = np.array(out1["embedding"].to_pylist()[0])
    assert len(v) == EMBED_DIM
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert out1["embedding"].to_pylist()[0] != out1["embedding"].to_pylist()[1]


def test_frame_sample_worker():
    batch = pa.table({"id": ["v1", "v2"],
                      "n_frames": pa.array([25, 5], pa.int32())})
    out = FrameSampleWorker(stride=10)(batch)
    assert out.to_pylist() == [
        {"id": "v1", "frame_index": 0}, {"id": "v1", "frame_index": 10},
        {"id": "v1", "frame_index": 20}, {"id": "v2", "frame_index": 0}]


@pytest.mark.usefixtures("ray_session")
def test_multimodal_actor_pool_pipeline():
    import ray.data as rd
    from ocr_model_ray.stages.multimodal import decode_images, embed_images
    items = [{"id": f"img{i}", "image": _pseudo_png([["w", 0, 0, 5, 5, 1.0]] * i)}
             for i in range(20)]
    ds = rd.from_arrow(pa.Table.from_pylist(items, schema=pa.schema(
        [("id", pa.string()), ("image", pa.large_binary())])))
    meta = decode_images(ds, concurrency=2, batch_size=8).to_pandas()
    assert meta["n_objects"].tolist() == list(range(20))
    emb = embed_images(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(emb) == 20 and len(emb["embedding"].iloc[0]) == EMBED_DIM


@pytest.mark.usefixtures("ray_session")
def test_debug_svg_export(t1_pages_dir):
    import xml.etree.ElementTree as ET
    from ocr_model_ray.pipelines.extract_pipeline import extract_pipeline
    from ocr_model_ray.stages.debug_export import debug_svg_export
    out = debug_svg_export(extract_pipeline(t1_pages_dir)).to_pandas()
    assert len(out) > 0
    sample = out.sort_values(["url", "page"]).iloc[0]
    svg = ET.fromstring(sample["svg"])  # well-formed XML
    ns = "{http://www.w3.org/2000/svg}"
    rects = svg.findall(f"{ns}rect")
    assert rects, "no annotation boxes drawn"
    classes = {r.get("class") for r in rects}
    assert "region" in classes
    # every drawn box has finite geometry inside the page
    w, h = float(svg.get("width")), float(svg.get("height"))
    for r in rects:
        assert 0 <= float(r.get("x")) <= w
        assert float(r.get("width")) >= 0


def test_conf_color_ramp():
    from ocr_model_ray.stages.debug_export import conf_color
    assert conf_color(0.0) == "rgb(255,0,0)"
    assert conf_color(1.0) == "rgb(0,255,0)"
    assert conf_color(2.0) == "rgb(0,255,0)"  # clamped


@pytest.mark.usefixtures("ray_session")
def test_export_on_the_fly(t1_pages_dir, tmp_path):
    """S11 (results.py:29-130): pre-rendered formats serve from the
    write_all_formats store; missing formats synthesize from the
    canonical parquet and equal the pre-rendered bytes; unknown format
    / unknown url raise the reference's 400/404 analogues."""
    import pyarrow.dataset as pads
    from ocr_model_ray.pipelines.extract_pipeline import extract_pipeline
    from ocr_model_ray.stages.export import export_on_the_fly

    full = str(tmp_path / "exports")
    write_all_formats(extract_pipeline(t1_pages_dir), full)
    canon = pads.dataset(os.path.join(full, "parquet")).to_table(
        columns=["url", "extracted_text", "error"]).to_pylist()
    # deterministic pick: the smallest url with a non-empty extraction
    # (file listing order varies run-to-run; error rows render empty)
    url = min(r["url"] for r in canon
              if r["extracted_text"] and not r["error"])

    served = {}
    for fmt in ("json", "txt", "xml", "xlsx", "csv", "pdf"):
        content, filename, media = export_on_the_fly(full, url, fmt)
        assert content and filename.endswith(f"_result.{fmt}")
        assert "/" not in filename
        served[fmt] = content
    doc = json.loads(served["json"].decode("utf-8"))
    assert doc["url"] == url
    assert served["xlsx"].startswith(b"PK")  # zip container
    assert served["pdf"].startswith(b"%PDF-1.4")
    assert b"page_num" in served["csv"]

    # canonical-parquet-only store (no pre-rendered dirs): synthesis
    # must produce the same bytes the pre-rendered store served
    canon_only = str(tmp_path / "canon")
    os.makedirs(canon_only)
    os.symlink(os.path.join(full, "parquet"),
               os.path.join(canon_only, "parquet"))
    for fmt in ("json", "txt", "xml", "xlsx", "pdf"):
        content, _, _ = export_on_the_fly(canon_only, url, fmt)
        assert content == served[fmt], (
            f"synthesized {fmt} differs from pre-rendered for {url}: "
            f"synth[:200]={content[:200]!r} served[:200]={served[fmt][:200]!r}")

    with pytest.raises(ValueError, match="Unsupported format"):
        export_on_the_fly(full, url, "docx")
    with pytest.raises(LookupError, match="No results"):
        export_on_the_fly(full, "https://nope.test/x", "json")


@pytest.mark.usefixtures("ray_session")
def test_annotated_pdf_export(t1_pages_dir):
    """Pure-stdlib annotated-PDF sink (S9 PDF twin of the SVG overlay):
    well-formed xref (every offset points at its 'N 0 obj' header), one
    page object per document page, region strokes present, and byte
    determinism."""
    import re
    from ocr_model_ray.pipelines.extract_pipeline import extract_pipeline
    from ocr_model_ray.stages.pdf_export import (annotated_pdf_export,
                                                 render_annotated_pdf)

    out = annotated_pdf_export(extract_pipeline(t1_pages_dir)).to_pandas()
    assert len(out) > 0
    sample = out.sort_values("url").iloc[0]
    pdf = bytes(sample["pdf"])
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")

    # xref integrity: each entry's offset lands exactly on "i 0 obj"
    xref_at = int(pdf.rsplit(b"startxref", 1)[1].split()[0])
    lines = pdf[xref_at:].split(b"\n")
    assert lines[0] == b"xref"
    n_objs = int(lines[1].split()[1]) - 1
    for i in range(1, n_objs + 1):
        off = int(lines[2 + i].split()[0])
        assert pdf[off:].startswith(b"%d 0 obj" % i), f"bad offset obj {i}"

    # one page object per /Count, region boxes stroked, labels present
    count = int(re.search(rb"/Count (\d+)", pdf).group(1))
    assert pdf.count(b"/Type /Page ") == count >= 1
    assert b" re S" in pdf and b"Tj ET" in pdf

    # /Length of each content stream is exact
    for m in re.finditer(rb"<< /Length (\d+) >>\nstream\n", pdf):
        ln = int(m.group(1))
        assert pdf[m.end() + ln:m.end() + ln + 10] == b"\nendstream"

    # determinism: a pure function of the row
    row = extract_pipeline(t1_pages_dir).to_pandas().sort_values(
        "url").iloc[0].to_dict()
    assert render_annotated_pdf(row) == render_annotated_pdf(row)
