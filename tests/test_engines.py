"""Adapter-normalization + line-table-detection tests (A1/A2 + T1).

The real engines aren't installed in this container, so the adapters'
mapping logic is tested against RECORDED engine outputs (the dict
shapes pytesseract/paddleocr produce, reference models/ocr_models.py),
and the availability guards are asserted to fail cleanly. The line
detector is pure numpy and tests for real on synthetic grids.
"""

import numpy as np
import pytest

from ocr_model_ray.stages.engines import (
    PaddleAdapter, TesseractAdapter, detect_table_regions_lines,
    ocr_engine)
from ocr_model_ray.spec import ocr_stub


# recorded pytesseract.image_to_data(..., output_type=Output.DICT) shape
TESS_DATA = {
    "text": ["", "Hello", "world", "  ", "42", "x"],
    "conf": ["-1", "96.33", "88", "95", "oops", "12"],
    "left": [0, 10, 64, 0, 120, 200],
    "top": [0, 20, 20, 0, 22, 21],
    "width": [640, 50, 52, 10, 18, 9],
    "height": [480, 12, 12, 10, 11, 10],
}


def test_tesseract_mapping_matches_reference_semantics():
    toks = TesseractAdapter.tokens_from_data(TESS_DATA)
    # empty + whitespace-only rows skipped
    assert [t["text"] for t in toks] == ["Hello", "world", "42", "x"]
    # conf is /100; unparseable -> 0.0
    assert toks[0]["conf"] == pytest.approx(0.9633)
    assert toks[2]["conf"] == 0.0
    # bbox = left, top, left+width, top+height
    assert (toks[0]["x1"], toks[0]["y1"], toks[0]["x2"], toks[0]["y2"]) == \
        (10, 20, 60, 32)


def test_tesseract_guard_raises_without_engine():
    if TesseractAdapter.available():
        pytest.skip("pytesseract installed in this environment")
    with pytest.raises(RuntimeError, match="pytesseract"):
        TesseractAdapter()


# recorded NEW paddle predict() shape
PADDLE_NEW = [{
    "rec_texts": ["alpha", "beta"],
    "rec_scores": [0.98, 0.76],
    "rec_polys": [
        [(10, 10), (60, 12), (60, 25), (10, 23)],
        [(70, 10), (120, 10), (120, 24), (70, 24)],
    ],
}]
# recorded OLD paddle ocr() shape
PADDLE_OLD = [[
    [[(10, 10), (60, 12), (60, 25), (10, 23)], ("alpha", 0.98)],
    [[(70, 10), (120, 10), (120, 24), (70, 24)], ("beta", 0.76)],
    "garbage-item",
]]


@pytest.mark.parametrize("result", [PADDLE_NEW, PADDLE_OLD])
def test_paddle_mapping_polygon_to_bbox(result):
    toks = PaddleAdapter.tokens_from_result(result)
    assert [t["text"] for t in toks] == ["alpha", "beta"]
    # polygon -> min/max bbox
    assert (toks[0]["x1"], toks[0]["y1"], toks[0]["x2"], toks[0]["y2"]) == \
        (10, 10, 60, 25)
    assert toks[1]["conf"] == pytest.approx(0.76)


def test_paddle_guard_raises_without_engine():
    if PaddleAdapter.available():
        pytest.skip("paddleocr installed in this environment")
    with pytest.raises(RuntimeError, match="paddleocr"):
        PaddleAdapter()


def test_ocr_engine_falls_back_to_stub():
    eng = ocr_engine()
    if not (TesseractAdapter.available() or PaddleAdapter.available()):
        assert eng is ocr_stub
    payload = b"any-bytes-at-all"
    assert eng(payload) == eng(payload)  # deterministic either way


def _grid_image(w=300, h=200, x0=30, y0=40, x1=270, y1=160,
                rows=3, cols=4) -> np.ndarray:
    img = np.full((h, w), 255, dtype=np.uint8)
    for i in range(rows + 1):
        y = y0 + (y1 - y0) * i // rows
        img[y, x0:x1] = 0
    for j in range(cols + 1):
        x = x0 + (x1 - x0) * j // cols
        img[y0:y1 + 1, x] = 0
    return img


def test_line_table_detect_finds_grid():
    img = _grid_image()
    out = detect_table_regions_lines(img)
    assert len(out) == 1
    x0, y0, x1, y1 = out[0]["bbox"]
    # the grid extent, within the morphology's half-kernel tolerance
    assert abs(x0 - 30) <= 6 and abs(y0 - 40) <= 5
    assert abs(x1 - 271) <= 6 and abs(y1 - 161) <= 5
    assert out[0]["confidence"] == 0.8


def test_line_table_detect_ignores_text_noise():
    img = np.full((200, 300), 255, dtype=np.uint8)
    rng = np.random.RandomState(0)
    # short dark strokes (text-like marks, all shorter than width//30)
    for _ in range(150):
        y, x = rng.randint(0, 200), rng.randint(0, 292)
        img[y, x:x + rng.randint(1, 8)] = 0
    assert detect_table_regions_lines(img) == []


def test_line_table_detect_two_separate_tables():
    img = np.full((220, 320), 255, dtype=np.uint8)
    img[20:80, 20:140] = _grid_image(120, 60, 5, 5, 115, 55, 2, 2)[0:60, 0:120]
    img[120:200, 180:300] = _grid_image(120, 80, 5, 5, 115, 75, 2, 2)[0:80, 0:120]
    out = detect_table_regions_lines(img)
    assert len(out) == 2


def test_table_transformer_mapping():
    from ocr_model_ray.stages.engines import TableTransformerAdapter
    # recorded post_process_object_detection shape (.tolist()'d)
    result = {"boxes": [[10.4, 20.6, 200.2, 150.9], [5.0, 5.0, 50.0, 40.0]],
              "scores": [0.97, 0.91], "labels": [0, 0]}
    out = TableTransformerAdapter.tables_from_detection(result)
    assert out[0]["bbox"] == [5, 5, 50, 40]
    assert out[1]["bbox"] == [10, 21, 200, 151]   # rounded, sorted
    assert out[1]["confidence"] == pytest.approx(0.97)


def test_table_transformer_guard():
    from ocr_model_ray.stages.engines import TableTransformerAdapter
    if TableTransformerAdapter.available():
        pytest.skip("transformers installed")
    with pytest.raises(RuntimeError, match="transformers"):
        TableTransformerAdapter()


def test_trocr_text_mapping_and_guard():
    from ocr_model_ray.stages.engines import TrOCRAdapter
    toks = TrOCRAdapter.tokens_from_text("  hello world  ")
    assert len(toks) == 1 and toks[0]["text"] == "hello world"
    assert toks[0]["conf"] == 1.0
    assert TrOCRAdapter.tokens_from_text("   ") == []
    if not TrOCRAdapter.available():
        with pytest.raises(RuntimeError, match="TrOCR"):
            TrOCRAdapter()


def test_ppstructure_adapter_normalization_and_guard():
    """A7: unavailable in this container -> clean RuntimeError; the
    region normalizer keeps only table regions with int bboxes and
    res.score confidence, sorted."""
    import pytest as _pytest

    from ocr_model_ray.stages.engines import PPStructureAdapter
    assert PPStructureAdapter.available() is False
    with _pytest.raises(RuntimeError, match="PPStructure not available"):
        PPStructureAdapter()
    regions = [
        {"type": "text", "bbox": [0, 0, 10, 10], "res": {}},
        {"type": "table", "bbox": [10.6, 2.2, 99.4, 50.0],
         "res": {"score": 0.75}},
        {"type": "table", "bbox": [1, 1, 5, 5], "res": []},  # list res
    ]
    got = PPStructureAdapter.tables_from_regions(regions)
    assert got == [{"bbox": [1, 1, 5, 5], "confidence": 1.0},
                   {"bbox": [11, 2, 99, 50], "confidence": 0.75}]


def test_onnx_table_detector_guard_and_output_mapping():
    """A5: onnxruntime absent in this container -> clean RuntimeError;
    the output mapper applies threshold > 0.5 and denormalizes against
    the ORIGINAL page size with int() truncation
    (table_detector.py:146-158)."""
    import numpy as np
    import pytest as _pytest

    from ocr_model_ray.stages.engines import OnnxTableDetectorAdapter
    assert OnnxTableDetectorAdapter.available() is False
    with _pytest.raises(RuntimeError, match="onnxruntime not available"):
        OnnxTableDetectorAdapter("/tmp/none.onnx")
    dets = np.array([
        [0.10, 0.20, 0.55, 0.80, 0.90],   # kept
        [0.00, 0.00, 1.00, 1.00, 0.40],   # below threshold
        [0.50, 0.10, 0.90, 0.30, 0.51],   # kept
    ])
    got = OnnxTableDetectorAdapter.tables_from_output(dets, width=1000,
                                                      height=500)
    assert got == [
        {"bbox": [100, 100, 550, 400], "confidence": 0.9},
        {"bbox": [500, 50, 900, 150], "confidence": 0.51}]


def test_onnx_preprocess_shape_and_range():
    import numpy as np

    from ocr_model_ray.stages.engines import OnnxTableDetectorAdapter
    img = np.random.RandomState(1).randint(
        0, 255, (1200, 900, 3), dtype=np.uint8)
    x = OnnxTableDetectorAdapter.preprocess(img)
    assert x.shape == (1, 3, 800, 800) and x.dtype == np.float32
    assert 0.0 <= float(x.min()) and float(x.max()) <= 1.0
