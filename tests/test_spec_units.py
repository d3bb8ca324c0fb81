"""Unit tests for the frozen determinism spec (SURVEY.md §2.8), including
the reference's own threshold boundary cases."""

import base64
import json

import pytest


from ocr_model_ray.spec import (
    PSEUDO_PDF_HEADER, PSEUDO_PNG_HEADER, decode_text,
    ensemble_merge, extract_and_assemble, extract_html,
    group_tokens_into_lines, ocr_stub, sniff_mime, table_from_tokens, token,
)


# --- S3: mime sniff (io_conversion.py:14-26 semantics) ----------------------
@pytest.mark.parametrize("payload,mime", [
    (b"%PDF-1.4 junk", "application/pdf"),
    (b"\xff\xd8\xff\xe0rest", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (b"PKzipfile", "application/zip"),
    (b"  \n <html><body>x</body></html>", "text/html"),
    (b"plain old text", "text/plain"),
    (b"", "text/plain"),
])
def test_sniff_mime(payload, mime):
    assert sniff_mime(payload) == mime


# --- encoding fallback chain (document_processor.py:526-549) ----------------
def test_decode_text_fallback():
    assert decode_text("héllo".encode("utf-8")) == "héllo"
    # invalid utf-8 -> latin-1
    raw = "café".encode("latin-1")
    assert decode_text(raw) == "café"
    assert decode_text(b"\xff\xfe\x00") == b"\xff\xfe\x00".decode("latin-1")


# --- A3: ensemble dedup + sort (ocr_models.py:174-183) ----------------------
def test_ensemble_merge_dedup_and_sort():
    a = [token("hi", 0, 10, 5, 20, 0.5), token("lo", 0, 0, 5, 10, 0.9)]
    b = [token("hi", 0, 10, 5, 20, 0.8)]  # same (text,bbox) higher conf
    merged = ensemble_merge([a, b])
    assert [t["text"] for t in merged] == ["lo", "hi"]  # sorted (y1,x1)
    assert merged[1]["conf"] == 0.8  # max conf kept


# --- M11: region split at the 12px boundary (text_regions.py:9-28) ----------
def test_region_split_boundary():
    t0 = token("a", 0, 0, 10, 10, 1.0)       # yc = 5
    t_same = token("b", 20, 7, 30, 17, 1.0)  # yc = 12 -> |12-5|=7  <= 12: same
    t_edge = token("c", 0, 12, 10, 22, 1.0)  # yc = 17 -> exactly 12 from 5: same (strict >)
    t_far = token("d", 0, 12.1, 10, 22.1, 1.0)  # yc = 17.1 -> 12.1 > 12: split
    assert len(group_tokens_into_lines([t0, t_same])) == 1
    assert len(group_tokens_into_lines([t0, t_edge])) == 1
    assert len(group_tokens_into_lines([t0, t_far])) == 2


def test_region_anchor_is_first_token_of_region():
    # drifting tokens yc = 5, 13, 21: steps of 8 (< 12) but the ANCHOR
    # stays at the region's first token (text_regions.py:16-24), so the
    # third token (|21-5| > 12) starts a new region
    toks = [token("a", 0, 0, 10, 10, 1.0),    # yc 5
            token("b", 20, 8, 30, 18, 1.0),   # yc 13 -> |13-5|=8: same
            token("c", 40, 16, 50, 26, 1.0)]  # yc 21 -> |21-5|=16: split
    regions = group_tokens_into_lines(toks)
    assert [[t["text"] for t in r.tokens] for r in regions] == [["a", "b"], ["c"]]


def test_region_grouping_sorts_reading_order():
    toks = [token("second", 0, 30, 10, 40, 1.0), token("first", 0, 0, 10, 10, 1.0)]
    regions = group_tokens_into_lines(toks)
    assert [r.text for r in regions] == ["first", "second"]


# --- T2: table grid thresholds (tables.py:63-65,125,157) --------------------
def test_table_from_tokens_grid():
    toks = []
    for r in range(3):
        for c in range(2):
            toks.append(token(f"v{r}{c}", 100.0 * c, 20.0 * r, 100.0 * c + 30, 20.0 * r + 10,
                              1.0 if (r, c) != (2, 1) else 0.5))
    t = table_from_tokens(toks, (-5, -5, 300, 100), page_num=1)
    assert t.n_rows == 3 and t.n_cols == 2
    assert t.needs_review  # one cell conf 0.5 < 0.8
    cells = {(r, c): tx for (r, c, tx, _cf) in t.cells}
    assert cells[(0, 0)] == "v00" and cells[(2, 1)] == "v21"


def test_table_row_threshold_uses_median_height():
    # token height 10 -> row threshold max(8, 6) = 8; y gap 9 > 8 splits
    toks = [token("a", 0, 0, 30, 10, 1.0), token("b", 0, 19, 30, 29, 1.0)]
    t = table_from_tokens(toks, (-1, -1, 100, 100), page_num=1)
    assert t.n_rows == 2


def test_ward_cluster_1d_groups_by_gap():
    from ocr_model_ray.spec import _ward_cluster_1d
    centers = [0.0, 1.0, 2.0, 100.0, 101.0, 102.0, 200.0, 201.0]
    out = _ward_cluster_1d(centers, t=20.0)
    assert out == [1.0, 101.0, 200.5]
    assert _ward_cluster_1d([5.0]) == [5.0]
    # permutation invariant (sorted internally)
    assert _ward_cluster_1d(list(reversed(centers)), t=20.0) == out


def test_table_ward_path_with_many_centers():
    # 3 rows x 3 cols = 9 tokens >= 8 centers -> ward clustering path
    toks = []
    for r in range(3):
        for c in range(3):
            toks.append(token(f"v{r}{c}", 120.0 * c, 30.0 * r,
                              120.0 * c + 40, 30.0 * r + 12, 1.0))
    t = table_from_tokens(toks, (-5, -5, 500, 200), page_num=1)
    assert t.n_rows == 3 and t.n_cols == 3
    cells = {(r, c): tx for (r, c, tx, _cf) in t.cells}
    assert cells[(0, 0)] == "v00" and cells[(2, 2)] == "v22"


# --- OCR stub: deterministic + container passthrough ------------------------
def test_ocr_stub_deterministic():
    img = PSEUDO_PNG_HEADER + json.dumps(
        {"w": 100, "h": 100, "words": [["hello", 1, 2, 40, 12, 0.9]]}).encode()
    assert ocr_stub(img) == ocr_stub(img)
    assert ocr_stub(img)[0]["text"] == "hello"
    arbitrary = b"\x89PNG....not json"
    out1, out2 = ocr_stub(arbitrary), ocr_stub(arbitrary)
    assert out1 == out2 and len(out1) >= 1


def test_rotation_sweep_mechanism():
    from ocr_model_ray.spec import ocr_rotation_sweep, rotate_tokens
    img = PSEUDO_PNG_HEADER + json.dumps(
        {"w": 100, "h": 50, "words": [["hi", 10, 10, 30, 20, 0.9]]}).encode()
    rot, toks = ocr_rotation_sweep(img, width=100, height=50)
    assert rot == 0 and toks[0]["text"] == "hi"  # tie -> smallest rotation
    # geometry: 180-deg rotation is its own inverse
    t = token("x", 10, 10, 30, 20, 1.0)
    twice = rotate_tokens(rotate_tokens([t], 180, 100, 50), 180, 100, 50)
    assert twice == [t]


# --- HTML branch: boilerplate stripping + link density ----------------------
def test_html_boilerplate_stripped():
    html = (b"<html><head><script>x()</script></head><body>"
            b"<nav><a href='/a'>one</a><a href='/b'>two</a></nav>"
            b"<p>This paragraph has plenty of real content to keep around here.</p>"
            b"<footer><a href='/c'>contact us via this link</a></footer>"
            b"</body></html>")
    doc = extract_html(html)
    texts = [r.text for r in doc.pages[0].regions]
    assert texts == ["This paragraph has plenty of real content to keep around here."]


def test_html_link_density_drops_linkfarm():
    linky = (b"<html><body><p>"
             b"<a href='/1'>click here for more great deals</a> "
             b"<a href='/2'>and here for even better ones</a></p>"
             b"<p>Genuine long-form article text continues in this block here.</p>"
             b"</body></html>")
    doc = extract_html(linky)
    texts = [r.text for r in doc.pages[0].regions]
    assert texts == ["Genuine long-form article text continues in this block here."]


def test_html_heading_kept_short():
    html = b"<html><body><h1>Title</h1><p>Body text long enough to pass the threshold.</p></body></html>"
    doc = extract_html(html)
    assert [r.rtype for r in doc.pages[0].regions] == ["heading", "paragraph"]


def test_html_table_cells_with_colspan():
    html = (b"<html><body><table>"
            b"<tr><th>h1</th><th>h2</th><th>h3</th></tr>"
            b"<tr><td colspan='2'>wide</td><td>x</td></tr>"
            b"</table></body></html>")
    doc = extract_html(html)
    t = doc.tables[0]
    assert t.n_rows == 2 and t.n_cols == 3
    cells = {(r, c): tx for (r, c, tx, _cf) in t.cells}
    assert cells[(1, 0)] == "wide" and cells[(1, 2)] == "x"


def test_html_nested_tables_flatten_deterministically():
    # Frozen behavior: inner-table rows flatten into the outer table
    # (one grid row per <tr> regardless of nesting). Pinned so a future
    # parser change cannot silently alter goldens.
    html = (b"<html><body><table>"
            b"<tr><td>outer1</td><td><table><tr><td>inner1</td></tr></table></td></tr>"
            b"<tr><td>outer2</td></tr></table></body></html>")
    doc = extract_html(html)
    assert len(doc.tables) == 1
    t = doc.tables[0]
    assert t.n_rows == 3
    texts = [tx for (_r, _c, tx, _cf) in t.cells]
    assert "outer1" in texts and "inner1" in texts and "outer2" in texts


# --- assembly: spans, page joins, rows (document_processor.py:474-488) ------
def test_pdf_page_join_and_spans():
    pages = [{"width": 100, "height": 100,
              "spans": [["hello", 0, 0, 30, 10, 11, False],
                        ["world", 35, 0, 60, 10, 11, False],
                        ["  ", 0, 40, 10, 50, 11, False],      # whitespace-only skipped
                        ["below", 0, 40, 30, 50, 11, False]]},
             {"width": 100, "height": 100,
              "spans": [["page2", 0, 0, 30, 10, 11, False]]}]
    payload = PSEUDO_PDF_HEADER + json.dumps({"pages": pages}).encode()
    res = extract_and_assemble("u://x", payload)
    assert res["extracted_text"] == "hello world below\n\npage2"
    assert res["n_pages"] == 2 and res["doc_kind"] == "digital_pdf"
    for reg in res["regions"]:
        assert res["extracted_text"][reg["char_start"]:reg["char_end"]] == reg["text"]
    assert [r["row_id"] for r in res["rows"]] == ["row_1", "row_2", "row_3"]
    assert res["word_count"] == 4 and res["confidence"] == 1.0


def test_scanned_page_routes_to_ocr():
    img = PSEUDO_PNG_HEADER + json.dumps(
        {"w": 10, "h": 10, "words": [["scan", 0, 0, 20, 10, 0.75]]}).encode()
    pages = [{"width": 10, "height": 10, "spans": [],
              "image": base64.b64encode(img).decode()}]
    payload = PSEUDO_PDF_HEADER + json.dumps({"pages": pages}).encode()
    res = extract_and_assemble("u://s", payload)
    assert res["doc_kind"] == "scanned_pdf"
    assert res["extracted_text"] == "scan"
    assert res["pages"][0]["is_scanned"] is True
    assert res["rows"][0]["needs_review"] is True  # 0.75 < 0.8
    assert res["confidence"] == 0.75


def test_max_pages_cap():
    pages = [{"width": 1, "height": 1, "spans": [[f"p{i}", 0, 0, 5, 5, 1, False]]}
             for i in range(5)]
    payload = PSEUDO_PDF_HEADER + json.dumps({"pages": pages}).encode()
    res = extract_and_assemble("u://m", payload, max_pages=3)
    assert res["n_pages"] == 3 and res["extracted_text"] == "p0\n\np1\n\np2"


def test_malformed_pdf_dead_letter():
    res = extract_and_assemble("u://bad", PSEUDO_PDF_HEADER + b"{broken")
    assert res["error"] is not None and res["confidence"] == 0.0
    assert res["extracted_text"] == ""


def test_plain_text_paragraphs_and_latin1():
    raw = "café one two\n\n\nsecond  para here".encode("latin-1")
    res = extract_and_assemble("u://t", raw)
    assert res["extracted_text"] == "café one two\n\nsecond para here"
    assert res["doc_kind"] == "text"
    assert [r["text"] for r in res["regions"]] == ["café one two", "second para here"]


def test_deterministic_ids_embed_url():
    html = b"<html><body><p>Deterministic identifier check paragraph body.</p></body></html>"
    res = extract_and_assemble("https://e.test/a", html)
    assert res["regions"][0]["region_id"] == "https://e.test/a#p1:r0"


def _pdf_container(body: dict) -> bytes:
    import json as _json
    return b"%PDF-1.7\n%CURIO1\n" + _json.dumps(body).encode("utf-8")


def test_pdf_metadata_projection_flags():
    from ocr_model_ray.spec import pdf_metadata
    payload = _pdf_container({
        "meta": {"title": "T", "author": "A"},
        "toc": [["1", "Intro", 1]],
        "form_fields": True,
        "pages": [
            {"width": 100, "height": 200, "spans": [["hi", 0, 0, 9, 9, 10, 0]],
             "links": ["https://x.test"], "image": None},
            {"width": 100, "height": 200, "spans": [], "image": "aW1n"},
        ],
    })
    m = pdf_metadata(payload)
    assert m["title"] == "T" and m["author"] == "A"
    assert m["page_count"] == 2 and m["file_size"] == len(payload)
    assert m["has_toc"] and m["has_links"] and m["has_images"]
    assert m["form_fields"] is True
    assert "error" not in m


def test_pdf_metadata_defaults_and_error():
    from ocr_model_ray.spec import pdf_metadata
    plain = _pdf_container({"pages": [
        {"width": 10, "height": 10, "spans": [["a", 0, 0, 1, 1, 10, 0]]}]})
    m = pdf_metadata(plain)
    assert (m["has_toc"], m["has_links"], m["has_images"],
            m["form_fields"]) == (False, False, False, False)
    bad = pdf_metadata(b"%PDF-1.7\nnot-a-container")
    assert "error" in bad and "Failed to extract metadata" in bad["error"]


def test_pdf_metadata_batch_skips_non_pdf():
    import pyarrow as pa
    from ocr_model_ray.stages.extract import PDF_META_SCHEMA, pdf_metadata_batch
    payload = _pdf_container({"pages": [{"width": 1, "height": 1,
                                         "spans": [], "image": "aW1n"}]})
    batch = pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "html": pa.array([payload, b"<html><body>x</body></html>"],
                         pa.binary()),
    })
    out = pdf_metadata_batch(batch)
    assert out.schema == PDF_META_SCHEMA
    assert out.num_rows == 1
    assert out["has_images"][0].as_py() is True


def test_embedded_images_batch_side_table():
    """M6 (pdf_processor.py:276-343): one row per embedded page image
    with the reference's {base}_p{page}_img{idx}.{ext} filename, decoded
    bytes in a binary column; pages without images skip; malformed PDFs
    dead-letter one error row; non-PDF payloads are skipped."""
    import base64
    import json as _json

    import pyarrow as pa
    from ocr_model_ray.spec import PSEUDO_PNG_HEADER
    from ocr_model_ray.stages.extract import (
        EMBEDDED_IMAGE_SCHEMA, embedded_images_batch)

    png = PSEUDO_PNG_HEADER + _json.dumps(
        {"w": 640, "h": 480, "words": [["hi", 1, 2, 3, 4, 0.9]]}).encode()
    payload = _pdf_container({"pages": [
        {"width": 100, "height": 100, "spans": [],
         "image": base64.b64encode(png).decode()},
        {"width": 100, "height": 100, "spans": [["t", 1, 1, 2, 2, 10, 0]]},
    ]})
    batch = pa.table({
        "url": pa.array(["http://x/report.pdf", "u2", "u3"], pa.string()),
        "html": pa.array([payload, b"<html><body>x</body></html>",
                          b"%PDF-1.7\nnot-a-container"], pa.binary()),
    })
    out = embedded_images_batch(batch)
    assert out.schema == EMBEDDED_IMAGE_SCHEMA
    rows = out.to_pylist()
    assert len(rows) == 2
    img_row = rows[0]
    assert img_row["filename"] == "report_p1_img1.png"
    assert (img_row["page"], img_row["img_index"]) == (1, 1)
    assert (img_row["width"], img_row["height"]) == (640, 480)
    assert img_row["image"] == png and img_row["error"] is None
    err_row = rows[1]
    assert err_row["url"] == "u3"
    assert "Failed to extract images" in err_row["error"]
    assert err_row["image"] is None
