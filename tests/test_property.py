"""Property-based tests (hypothesis): the spec must be total (never
raise), deterministic, and self-consistent on ARBITRARY byte payloads —
the dead-letter guarantee at the row level — and the geometric operators
must be permutation-invariant."""

import random

from hypothesis import given, settings, strategies as st

from ocr_model_ray.spec import (
    assemble, assemble_summary, decode_text, extract_and_assemble,
    extract_document, group_tokens_into_lines, sniff_mime, table_from_tokens,
    token,
)

from ocr_model_ray.spec import PSEUDO_PDF_HEADER, PSEUDO_PNG_HEADER

_raw = st.binary(min_size=0, max_size=2048)
#: bias the fuzz toward every branch parser's magic prefix so the
#: pdf/docx/html/image paths all see malformed payloads, not just text
payloads = st.one_of(
    _raw,
    _raw.map(lambda b: b"PK" + b),
    _raw.map(lambda b: PSEUDO_PDF_HEADER + b),
    _raw.map(lambda b: b"%PDF-1.4\n" + b),
    _raw.map(lambda b: PSEUDO_PNG_HEADER + b),
    _raw.map(lambda b: b"<html><body>" + b),
)


@settings(max_examples=150, deadline=None)
@given(payloads)
def test_extract_total_and_deterministic(payload):
    r1 = extract_and_assemble("u://p", payload)
    r2 = extract_and_assemble("u://p", payload)
    assert r1 == r2
    assert r1["word_count"] == len(r1["extracted_text"].split())
    assert r1["char_count"] == len(r1["extracted_text"])
    for reg in r1["regions"]:
        assert r1["extracted_text"][reg["char_start"]:reg["char_end"]] == reg["text"]


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_summary_equals_full_projection(payload):
    full = assemble("u://p", extract_document(payload))
    summ = assemble_summary("u://p", extract_document(payload, layout=False))
    for k in ("url", "extracted_text", "doc_kind", "n_pages", "confidence",
              "word_count", "char_count", "table_count", "region_count",
              "error"):
        assert summ[k] == full[k], k


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_decode_and_sniff_total(payload):
    assert isinstance(decode_text(payload), str)
    assert sniff_mime(payload) in {"application/pdf", "image/jpeg", "image/png",
                                   "application/zip", "text/html", "text/plain"}


tokens_strategy = st.lists(
    st.tuples(st.text(alphabet="abcxyz", min_size=1, max_size=5),
              st.floats(0, 500, allow_nan=False),
              st.floats(0, 500, allow_nan=False),
              st.floats(1, 50, allow_nan=False),
              st.floats(1, 20, allow_nan=False),
              st.floats(0, 1, allow_nan=False)),
    min_size=0, max_size=40)


def _mk_tokens(specs):
    return [token(t, x, y, x + w, y + h, c) for (t, x, y, w, h, c) in specs]


@settings(max_examples=100, deadline=None)
@given(tokens_strategy, st.integers(0, 2 ** 32 - 1))
def test_region_grouping_permutation_invariant(specs, seed):
    toks = _mk_tokens(specs)
    shuffled = list(toks)
    random.Random(seed).shuffle(shuffled)
    r1 = group_tokens_into_lines(toks)
    r2 = group_tokens_into_lines(shuffled)
    assert [[t["text"] for t in r.tokens] for r in r1] == \
           [[t["text"] for t in r.tokens] for r in r2]
    # partition: every token lands in exactly one region
    assert sum(len(r.tokens) for r in r1) == len(toks)


@settings(max_examples=100, deadline=None)
@given(tokens_strategy)
def test_table_grid_covers_included_tokens(specs):
    toks = _mk_tokens(specs)
    bbox = (0.0, 0.0, 600.0, 600.0)
    t = table_from_tokens(toks, bbox, page_num=1)
    if t is None:
        return
    cell_words = []
    for (_r, _c, text, _cf) in t.cells:
        cell_words.extend(text.split())
    from ocr_model_ray.spec import _tokens_in_bbox
    included = _tokens_in_bbox(toks, bbox)
    assert sorted(cell_words) == sorted(tk["text"] for tk in included)
    assert t.n_rows >= 1 and t.n_cols >= 1
