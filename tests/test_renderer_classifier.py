"""A9 renderer-kind classifier: model path agrees with the M16
heuristic dispatch, checkpoint lifecycle behaves like the reference's
ModelManager (load -> warn -> pretrained fallback)."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_model_ray.stages.renderer import (
    CLASSES, FEATURES, RendererClassifierWorker, classify_renderers,
)


def _batch(rows):
    return pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "html": pa.array([p for _, p in rows], pa.binary()),
    })


def test_pretrained_weights_match_heuristic_kinds():
    """Curated one-per-class batch: model label == spec doc_kind."""
    import json

    from ocr_model_ray.spec import PSEUDO_PNG_HEADER, extract_document
    png = PSEUDO_PNG_HEADER + json.dumps(
        {"w": 64, "h": 64, "words": [["hi", 1, 1, 9, 9, 0.9]]}).encode()
    import base64
    digital = (b"%PDF-1.7\n%CURIO1\n" + json.dumps({"pages": [
        {"width": 100, "height": 100,
         "spans": [["t", 1, 1, 9, 9, 10, 0]]}]}).encode())
    scanned = (b"%PDF-1.7\n%CURIO1\n" + json.dumps({"pages": [
        {"width": 100, "height": 100, "spans": [],
         "image": base64.b64encode(png).decode()}]}).encode())
    import random

    from ocr_model_ray.fixtures import _docx_payload
    rows = [
        ("h", b"<html><body><p>hello paragraph here</p></body></html>"),
        ("d", digital),
        ("s", scanned),
        ("i", png),
        ("t", b"plain text content with words"),
        ("z", _docx_payload(random.Random(0))),
    ]
    out = RendererClassifierWorker()(_batch(rows)).to_pylist()
    got = {r["url"]: r["renderer_kind"] for r in out}
    want = {u: extract_document(p).doc_kind for u, p in rows}
    assert got == want
    assert all(r["renderer_conf"] > 0.5 for r in out)


def test_agreement_with_heuristic_on_fixture_corpus(t1_pages_dir):
    """>=95% agreement with the heuristic dispatch over the seeded
    fixture corpus (mixed digital/scanned pages are the known gap: the
    byte-level features can't see per-page span structure)."""
    import os

    import pyarrow.parquet as pq
    from ocr_model_ray.spec import extract_document
    files = [os.path.join(t1_pages_dir, f)
             for f in sorted(os.listdir(t1_pages_dir))
             if f.endswith(".parquet")]
    t = pq.read_table(files[0], columns=["url", "html"])
    out = RendererClassifierWorker()(t).to_pylist()
    agree = total = 0
    for r, payload in zip(out, t["html"].to_pylist()):
        kind = extract_document(payload).doc_kind
        if kind == "unknown":
            continue  # malformed rows: the heuristic itself errored
        total += 1
        agree += r["renderer_kind"] == kind
    assert total > 0
    assert agree / total >= 0.95, f"{agree}/{total}"


def test_checkpoint_npz_roundtrip_and_fallbacks(tmp_path):
    rng = np.random.RandomState(0)
    w = rng.randn(len(CLASSES), len(FEATURES))
    b = rng.randn(len(CLASSES))
    path = str(tmp_path / "ck.npz")
    np.savez(path, weight=w, bias=b)
    worker = RendererClassifierWorker(checkpoint=path)
    assert np.array_equal(worker.w, w) and np.array_equal(worker.b, b)

    # missing npz -> pretrained fallback, no raise
    w2 = RendererClassifierWorker(checkpoint=str(tmp_path / "nope.npz"))
    assert w2.w.shape == (len(CLASSES), len(FEATURES))
    # .pth without torch in this container -> pretrained fallback
    w3 = RendererClassifierWorker(checkpoint=str(tmp_path / "m.pth"))
    assert np.array_equal(w3.w, w2.w)
    # wrong-shape checkpoint -> rejected
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, weight=np.ones((2, 2)), bias=np.ones(2))
    w4 = RendererClassifierWorker(checkpoint=bad)
    assert np.array_equal(w4.w, w2.w)
    # corrupt npz (not a zip) and wrong-keyed npz -> warn + fallback,
    # never a dead actor, never half-loaded weights
    corrupt = str(tmp_path / "corrupt.npz")
    with open(corrupt, "wb") as f:
        f.write(b"not an npz at all")
    w5 = RendererClassifierWorker(checkpoint=corrupt)
    assert np.array_equal(w5.w, w2.w) and np.array_equal(w5.b, w2.b)
    wrongkeys = str(tmp_path / "wrongkeys.npz")
    np.savez(wrongkeys, W=w, bias=b)  # "weight" key missing
    w6 = RendererClassifierWorker(checkpoint=wrongkeys)
    assert np.array_equal(w6.w, w2.w) and np.array_equal(w6.b, w2.b)


@pytest.mark.usefixtures("ray_session")
def test_classify_renderers_actor_pool(t1_pages_dir):
    """Dataset helper runs as an actor pool and returns one row per
    input page with the output schema."""
    from ocr_model_ray.sources.pages import read_pages
    pages = read_pages(t1_pages_dir)
    n = pages.count()
    out = classify_renderers(pages, concurrency=2)
    got = out.take_all()
    assert len(got) == n
    assert set(got[0]) == {"url", "renderer_kind", "renderer_conf"}
    assert set(r["renderer_kind"] for r in got) <= set(CLASSES)
