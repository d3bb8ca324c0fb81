"""Real OCR-engine adapters + line-based table detection (A1/A2 + T1).

The container this repo is developed in has no pytesseract / paddleocr /
cv2 / PIL, so:

* ``TesseractAdapter`` / ``PaddleAdapter`` are IMPORT-GUARDED: they
  raise a clear RuntimeError when the engine is absent, and their
  output-normalization logic (the part the reference implements in
  models/ocr_models.py:39-152 — conf/100 scaling, empty-text skip,
  left/top/width/height -> x1y1x2y2, polygon -> bbox) lives in pure
  static methods unit-tested against recorded engine outputs.
* ``ocr_engine()`` picks the best available engine and falls back to
  the deterministic seeded stub (spec.ocr_stub), so the extraction
  pipeline runs unchanged with or without the real libraries.
* ``detect_table_regions_lines`` reimplements the reference's OpenCV
  morphological line detector (table_detector.py:162-199: threshold at
  150, erode+dilate with width//30 x 1 and 1 x height//30 kernels,
  combine, external contours, area > 1% filter) in PURE NUMPY — no cv2
  needed, so line-based table detection is a real code path here, not
  a stub.

All tokens are spec.token dicts, so adapter output feeds directly into
spec.ensemble_merge / group_tokens_into_lines.
"""

from __future__ import annotations

import numpy as np

from ..spec import ocr_stub, token


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# Tesseract (reference models/ocr_models.py:39-71)
# ---------------------------------------------------------------------------
class TesseractAdapter:
    """Word-level tokens via pytesseract image_to_data."""

    @staticmethod
    def available() -> bool:
        return _try_import("pytesseract") is not None \
            and _try_import("PIL") is not None

    def __init__(self, lang: str = "eng",
                 config: str = "--oem 1 --psm 6") -> None:
        if not self.available():
            raise RuntimeError(
                "pytesseract/PIL not available; use spec.ocr_stub or "
                "install pytesseract to use TesseractAdapter")
        self.lang = lang
        self.config = config

    @staticmethod
    def tokens_from_data(data: dict) -> list[dict]:
        """Normalize an image_to_data DICT result — the reference's
        mapping (ocr_models.py:50-69): skip empty text, conf is 0-100
        (-> /100, unparseable -> 0.0), bbox = [left, top, left+width,
        top+height]."""
        out: list[dict] = []
        n = len(data.get("text", []))
        for i in range(n):
            text = (data["text"][i] or "").strip()
            if not text:
                continue
            try:
                conf = float(data.get("conf", [0])[i]) / 100.0
            except (TypeError, ValueError, IndexError):
                conf = 0.0
            x = int(data.get("left", [0])[i])
            y = int(data.get("top", [0])[i])
            w = int(data.get("width", [0])[i])
            h = int(data.get("height", [0])[i])
            out.append(token(text, x, y, x + w, y + h, conf))
        return out

    def __call__(self, image_bytes: bytes) -> list[dict]:
        import io

        import pytesseract
        from PIL import Image
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        data = pytesseract.image_to_data(
            img, lang=self.lang, config=self.config,
            output_type=pytesseract.Output.DICT)
        return self.tokens_from_data(data)


# ---------------------------------------------------------------------------
# PaddleOCR (reference models/ocr_models.py:74-152)
# ---------------------------------------------------------------------------
class PaddleAdapter:
    """Normalizes PaddleOCR predict()/ocr() outputs to token dicts."""

    @staticmethod
    def available() -> bool:
        return _try_import("paddleocr") is not None

    def __init__(self, lang: str = "en") -> None:
        if not self.available():
            raise RuntimeError(
                "paddleocr not available; use spec.ocr_stub or install "
                "paddleocr to use PaddleAdapter")
        from paddleocr import PaddleOCR
        self._ocr = PaddleOCR(use_textline_orientation=True, lang=lang)

    @staticmethod
    def tokens_from_result(result) -> list[dict]:
        """Both Paddle formats (ocr_models.py:103-144): new dict
        (rec_texts/rec_scores/rec_polys) and old list [[box, (text,
        conf)], ...]; polygon -> min/max bbox; malformed items skip."""
        if not result or not isinstance(result, list):
            return []
        batch = result[0]
        out: list[dict] = []
        if isinstance(batch, dict):
            texts = batch.get("rec_texts", [])
            scores = batch.get("rec_scores", [])
            polys = batch.get("rec_polys", [])
            for i, text in enumerate(texts):
                try:
                    conf = float(scores[i]) if i < len(scores) else 0.0
                    poly = polys[i] if i < len(polys) else None
                    if poly is not None:
                        xs = [p[0] for p in poly]
                        ys = [p[1] for p in poly]
                        bbox = (int(min(xs)), int(min(ys)),
                                int(max(xs)), int(max(ys)))
                    else:
                        bbox = (0, 0, 0, 0)
                    out.append(token(text, *bbox, conf))
                except (TypeError, ValueError, IndexError):
                    continue
        else:
            for item in batch:
                try:
                    box, (text, conf) = item[0], item[1]
                    xs = [p[0] for p in box]
                    ys = [p[1] for p in box]
                    out.append(token(text, int(min(xs)), int(min(ys)),
                                     int(max(xs)), int(max(ys)),
                                     float(conf)))
                except (TypeError, ValueError, IndexError):
                    continue
        return out

    def __call__(self, image_bytes: bytes) -> list[dict]:
        import io

        import numpy as _np
        from PIL import Image
        img = _np.array(Image.open(io.BytesIO(image_bytes)).convert("RGB"))
        try:
            result = self._ocr.predict(img)
        except Exception:  # noqa: BLE001 — old-API fallback per reference
            try:
                result = self._ocr.ocr(img)
            except Exception:  # noqa: BLE001
                return []
        return self.tokens_from_result(result)


# ---------------------------------------------------------------------------
# TableTransformer table detector (A6, reference models/table_detector.py)
# ---------------------------------------------------------------------------
class TableTransformerAdapter:
    """HF table-transformer detection normalized to the engine's table
    bbox dicts. The reference (models/table_detector.py:5-23) runs DETR
    post-processing at threshold 0.9 against the page size and returns
    raw box lists; here those become the same {'bbox', 'confidence'}
    records detect_table_regions_lines emits, so either detector slots
    into the table stage."""

    THRESHOLD = 0.9

    @staticmethod
    def available() -> bool:
        return _try_import("transformers") is not None \
            and _try_import("torch") is not None \
            and _try_import("PIL") is not None

    def __init__(self, model_name: str = "microsoft/table-transformer-detection") -> None:
        if not self.available():
            raise RuntimeError(
                "transformers/torch not available; use "
                "detect_table_regions_lines or install transformers to "
                "use TableTransformerAdapter")
        from transformers import (AutoFeatureExtractor,
                                  TableTransformerForObjectDetection)
        self.model = TableTransformerForObjectDetection.from_pretrained(model_name)
        self.feature_extractor = AutoFeatureExtractor.from_pretrained(model_name)

    @staticmethod
    def tables_from_detection(result: dict) -> list[dict]:
        """Normalize one post_process_object_detection record: float box
        tensors/lists -> int bboxes + float confidence, sorted."""
        out = []
        boxes = result.get("boxes", [])
        scores = result.get("scores", [])
        for i, box in enumerate(boxes):
            vals = [int(round(float(v))) for v in box]
            conf = float(scores[i]) if i < len(scores) else 0.0
            out.append({"bbox": vals, "confidence": conf})
        return sorted(out, key=lambda t: tuple(t["bbox"]))

    def __call__(self, image_bytes: bytes) -> list[dict]:
        import io

        import torch
        from PIL import Image
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        encoding = self.feature_extractor(img, return_tensors="pt")
        with torch.no_grad():
            outputs = self.model(**encoding)
        result = self.feature_extractor.post_process_object_detection(
            outputs, threshold=self.THRESHOLD,
            target_sizes=[(img.height, img.width)])[0]
        return self.tables_from_detection(
            {k: v.tolist() for k, v in result.items()})


# ---------------------------------------------------------------------------
# TrOCR long-form recognizer (A8, reference models/ocr_models.py:186-204)
# ---------------------------------------------------------------------------
class OnnxTableDetectorAdapter:
    """A5: the reference's default table-detection path — an ONNX
    Runtime session over an 800x800 CHW float input (reference
    worker/pipeline/processors/table_detector.py:103-158: graph
    optimization ORT_ENABLE_ALL, CPU/CUDA providers, input normalized
    /255, output rows [x1, y1, x2, y2, confidence, ...] with
    normalized coords denormalized against the ORIGINAL page size,
    confidence > threshold). Import-guarded like the other adapters:
    onnxruntime is absent in this container, so the session branch
    raises a clear error, while the output-mapping logic is a pure
    static method unit-tested on recorded-shape arrays."""

    CONFIDENCE_THRESHOLD = 0.5
    INPUT_SHAPE = (800, 800)

    @staticmethod
    def available() -> bool:
        return _try_import("onnxruntime") is not None

    def __init__(self, model_path: str, use_gpu: bool = False) -> None:
        if not self.available():
            raise RuntimeError(
                "onnxruntime not available; use TableTransformerAdapter "
                "or detect_table_regions_lines, or install onnxruntime "
                "to use OnnxTableDetectorAdapter")
        import onnxruntime as ort
        opts = ort.SessionOptions()
        opts.graph_optimization_level = \
            ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        providers = (["CUDAExecutionProvider", "CPUExecutionProvider"]
                     if use_gpu else ["CPUExecutionProvider"])
        self.session = ort.InferenceSession(model_path, opts,
                                            providers=providers)

    @classmethod
    def preprocess(cls, image: np.ndarray) -> np.ndarray:
        """HxWx3 uint8 -> (1, 3, 800, 800) float32 in [0, 1] (the
        reference's cv2.resize + transpose(2,0,1) + /255)."""
        from .image_preproc import area_resize
        h, w = cls.INPUT_SHAPE
        chans = [area_resize(image[:, :, c], h, w) for c in range(3)]
        chw = np.stack(chans, axis=0).astype(np.float32) / 255.0
        return chw[None, ...]

    @classmethod
    def tables_from_output(cls, detections: np.ndarray, width: int,
                           height: int,
                           threshold: float | None = None) -> list[dict]:
        """Map one output batch's detection rows ([x1, y1, x2, y2,
        conf, ...], coords normalized) to the engine's
        {'bbox', 'confidence'} records against the original page size
        — the exact loop at table_detector.py:146-158."""
        thr = cls.CONFIDENCE_THRESHOLD if threshold is None else threshold
        out = []
        for det in np.asarray(detections, dtype=np.float64):
            conf = float(det[4])
            if conf <= thr:
                continue
            x1, y1, x2, y2 = det[:4]
            out.append({"bbox": [int(x1 * width), int(y1 * height),
                                 int(x2 * width), int(y2 * height)],
                        "confidence": conf})
        return sorted(out, key=lambda t: tuple(t["bbox"]))

    def __call__(self, image: np.ndarray) -> list[dict]:
        height, width = image.shape[:2]
        outputs = self.session.run(None, {"input": self.preprocess(image)})
        return self.tables_from_output(outputs[0], width, height)


class TrOCRAdapter:
    """VisionEncoderDecoder TrOCR: whole-image generated text, emitted
    as one page-level token (the reference returns (text, []) with no
    boxes — conf 1.0, zero bbox, empty text -> no tokens)."""

    @staticmethod
    def available() -> bool:
        return _try_import("transformers") is not None \
            and _try_import("torch") is not None \
            and _try_import("PIL") is not None

    def __init__(self, model_name: str = "microsoft/trocr-base-handwritten") -> None:
        if not self.available():
            raise RuntimeError(
                "transformers/torch not available for TrOCR; use "
                "spec.ocr_stub or install transformers")
        from transformers import TrOCRProcessor, VisionEncoderDecoderModel
        self.processor = TrOCRProcessor.from_pretrained(model_name)
        self.model = VisionEncoderDecoderModel.from_pretrained(model_name)

    @staticmethod
    def tokens_from_text(text: str) -> list[dict]:
        text = (text or "").strip()
        if not text:
            return []
        return [token(text, 0, 0, 0, 0, 1.0)]

    def __call__(self, image_bytes: bytes) -> list[dict]:
        import io

        from PIL import Image
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        pixel_values = self.processor(images=img,
                                      return_tensors="pt").pixel_values
        generated_ids = self.model.generate(pixel_values)
        text = self.processor.batch_decode(generated_ids,
                                           skip_special_tokens=True)[0]
        return self.tokens_from_text(text)


class PPStructureAdapter:
    """PaddleOCR PP-Structure layout engine (A7). The reference only
    ever INITIALIZES this engine (table_detector.py:66-75 — pp_engine
    is created and then never invoked), so the adapter both mirrors
    that init-with-fallback lifecycle and supplies the missing call
    path: PP-Structure region dicts normalize to the same
    {'bbox', 'confidence'} table records the line detector emits."""

    @staticmethod
    def available() -> bool:
        mod = _try_import("paddleocr")
        return mod is not None and hasattr(mod, "PPStructure")

    def __init__(self) -> None:
        if not self.available():
            raise RuntimeError(
                "paddleocr.PPStructure not available; use "
                "detect_table_regions_lines instead")
        from paddleocr import PPStructure
        self.engine = PPStructure(show_log=False)

    @staticmethod
    def tables_from_regions(regions: list[dict]) -> list[dict]:
        """Normalize PP-Structure output: keep type=='table' regions,
        bbox ints, res.score (or 1.0) as confidence, sorted by bbox."""
        out = []
        for r in regions:
            if r.get("type") != "table":
                continue
            bbox = [int(round(float(v))) for v in r.get("bbox", (0, 0, 0, 0))]
            res = r.get("res") or {}
            conf = float(res.get("score", 1.0)) if isinstance(res, dict) \
                else 1.0
            out.append({"bbox": bbox, "confidence": conf})
        return sorted(out, key=lambda t: tuple(t["bbox"]))

    def __call__(self, image: "np.ndarray") -> list[dict]:
        return self.tables_from_regions(self.engine(image))


def ocr_engine():
    """Best available engine as a ``bytes -> list[token]`` callable:
    Tesseract > Paddle > deterministic seeded stub. Call once per actor
    in __init__ (engine/model load), not per batch."""
    if TesseractAdapter.available():
        return TesseractAdapter()
    if PaddleAdapter.available():
        return PaddleAdapter()
    return ocr_stub


def fast_downscale_ocr(ocr, target: int = 1600):
    """M10 fast-mode wrapper (reference
    worker/document_processor.py:406-424): cap the longest image side
    at ``target`` px with area averaging before OCR. Decode/encode
    needs PIL; when it's absent (this container) the payload passes
    through untouched — same fallback as the reference's
    ``except Exception: ocr_input_path = image_path``. The resize
    kernel itself is pure numpy (image_preproc.downscale_max_dim) and
    unit-tested without PIL."""
    base = ocr or ocr_stub

    def wrapped(image_bytes: bytes):
        try:
            import io

            from PIL import Image

            from .image_preproc import downscale_max_dim
            img = Image.open(io.BytesIO(image_bytes))
            arr = np.asarray(img.convert("L"))
            small = downscale_max_dim(arr, target=target)
            if small.shape == arr.shape:
                return base(image_bytes)
            buf = io.BytesIO()
            Image.fromarray(small).save(buf, format="PNG")
            return base(buf.getvalue())
        except Exception:
            return base(image_bytes)

    return wrapped


# ---------------------------------------------------------------------------
# Line-based table detection, cv2-free (reference table_detector.py:162-199)
# ---------------------------------------------------------------------------
def _erode_1d(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Binary erosion with a 1-D structuring element of length k along
    ``axis`` (zero-padded borders, matching cv2's constant border for
    binary masks)."""
    if k <= 1:
        return mask
    pad = [(0, 0), (0, 0)]
    pad[axis] = (k // 2, k - 1 - k // 2)
    padded = np.pad(mask, pad, mode="constant", constant_values=False)
    win = np.lib.stride_tricks.sliding_window_view(padded, k, axis=axis)
    return win.all(axis=-1)


def _dilate_1d(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    if k <= 1:
        return mask
    pad = [(0, 0), (0, 0)]
    pad[axis] = (k // 2, k - 1 - k // 2)
    padded = np.pad(mask, pad, mode="constant", constant_values=False)
    win = np.lib.stride_tricks.sliding_window_view(padded, k, axis=axis)
    return win.any(axis=-1)


def _connected_bboxes(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Bounding boxes of 4-connected components — run-length rows +
    union-find across adjacent rows (no cv2/scipy)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    next_label = 0
    prev_runs: list[tuple[int, int, int]] = []  # (x0, x1, label)
    boxes: dict[int, list[int]] = {}
    for y in range(mask.shape[0]):
        row = mask[y]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = list(np.flatnonzero(d == 1) + 1)
        ends = list(np.flatnonzero(d == -1) + 1)
        if row[0]:
            starts.insert(0, 0)
        if row[-1]:
            ends.append(len(row))
        runs = []
        for x0, x1 in zip(starts, ends):
            label = None
            for px0, px1, pl in prev_runs:
                if px0 < x1 and x0 < px1:  # overlap -> same component
                    if label is None:
                        label = find(pl)
                    else:
                        union(label, pl)
            if label is None:
                label = next_label
                parent[label] = label
                next_label += 1
            runs.append((x0, x1, label))
            b = boxes.setdefault(label, [x0, y, x1, y + 1])
            b[0] = min(b[0], x0)
            b[2] = max(b[2], x1)
            b[3] = y + 1
        prev_runs = runs
    merged: dict[int, list[int]] = {}
    for label, b in boxes.items():
        root = find(label)
        m = merged.setdefault(root, list(b))
        m[0] = min(m[0], b[0])
        m[1] = min(m[1], b[1])
        m[2] = max(m[2], b[2])
        m[3] = max(m[3], b[3])
    return [tuple(b) for b in merged.values()]


def detect_table_regions_lines(gray: np.ndarray,
                               threshold: int = 150,
                               min_area_frac: float = 0.01) -> list[dict]:
    """The reference's cv2 fallback detector, numpy-only: binary-invert
    threshold, keep pixels that survive erosion+dilation with a
    (width//30 x 1) horizontal and (1 x height//30) vertical line
    kernel, OR the two line masks, and emit external component bboxes
    covering > ``min_area_frac`` of the image at confidence 0.8."""
    if gray.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    height, width = gray.shape
    thresh = gray < threshold  # THRESH_BINARY_INV
    k_h = max(2, width // 30)
    k_v = max(2, height // 30)
    horizontal = _dilate_1d(_erode_1d(thresh, k_h, axis=1), k_h, axis=1)
    vertical = _dilate_1d(_erode_1d(thresh, k_v, axis=0), k_v, axis=0)
    table_mask = horizontal | vertical
    min_area = width * height * min_area_frac
    out = []
    for x0, y0, x1, y1 in _connected_bboxes(table_mask):
        if (x1 - x0) * (y1 - y0) > min_area:
            out.append({"bbox": [int(x0), int(y0), int(x1), int(y1)],
                        "confidence": 0.8})
    return sorted(out, key=lambda t: tuple(t["bbox"]))
