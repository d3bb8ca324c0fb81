"""Renderer-kind classifier stage (A9, model_manager.py:128-151).

The reference wires a ``RendererClassifier`` torch checkpoint
(``renderer_classifier.pth``) through its ModelManager with a
warning-and-fallback path when the checkpoint is missing — and in
practice always falls back (the ``models/renderer_classifier.py``
module the import names does not exist in the repo), so the heuristic
dispatch (M16, spec.detect_kind) is what runs. This module implements
the MODEL path with the same lifecycle semantics, Ray-idiomatically:

* ``RendererClassifierWorker`` is an actor-pool ``map_batches`` class:
  the checkpoint resolves ONCE per actor in ``__init__`` (A10's
  ModelManager dissolves into actor state), batches classify in
  ``__call__``.
* Checkpoint loading is import-guarded exactly like the reference: a
  ``.pth`` path tries torch (absent in this container -> the documented
  warning + fallback), a ``.npz`` path loads numpy weights, no path
  uses the frozen pretrained weights below.
* The frozen weights are a linear softmax model over cheap byte-level
  features, distilled from the M16 heuristic's decisions (the
  reference's training data layout — data/renderer_classifier/
  {digital_pdf,scanned_image}/ — labels classes the same way); a test
  pins agreement with spec-level dispatch on the fixture corpus.

Features never require parsing the document: magic numbers + container
markers only, so classification is O(head bytes) per doc and the stage
is safe to run on malformed payloads.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

log = logging.getLogger("ocr_model_ray.renderer")

CLASSES = ["html", "digital_pdf", "scanned_pdf", "scanned_image",
           "text", "docx"]

#: byte-level feature vector (see _featurize): order is frozen — a
#: checkpoint trained against it stays valid across versions
FEATURES = ["is_pdf", "is_image", "is_zip", "head_is_markup",
            "has_span_marker", "has_image_marker", "log10_size"]

#: pretrained weights (n_classes x n_features) + bias: a distillation
#: of the M16 dispatch onto the feature space; kept in code (not a data
#: file) so the default model is reproducible from source alone
_W = np.array([
    #  pdf   img   zip  markup span  image  size
    [-4.0, -4.0, -4.0,  6.0,  0.0,  0.0,  0.0],   # html
    [ 6.0, -4.0, -4.0, -4.0,  4.0, -1.0,  0.0],   # digital_pdf
    [ 6.0, -4.0, -4.0, -4.0, -4.0,  4.0,  0.0],   # scanned_pdf
    [-4.0,  6.0, -4.0, -4.0,  0.0,  0.0,  0.0],   # scanned_image
    [-2.0, -2.0, -4.0, -2.0,  0.0,  0.0,  0.0],   # text
    [-4.0, -4.0,  6.0, -4.0,  0.0,  0.0,  0.0],   # docx
], dtype=np.float64)
_B = np.array([0.0, -3.0, -3.0, 0.0, 2.0, 0.0], dtype=np.float64)


def _featurize(payload: bytes) -> np.ndarray:
    """Byte-level features for one payload (no parsing)."""
    from ..spec import JPEG_MAGIC, PDF_MAGIC, PNG_MAGIC, ZIP_MAGIC
    head = payload[:512].lstrip()
    return np.array([
        1.0 if payload.startswith(PDF_MAGIC) else 0.0,
        1.0 if payload.startswith(PNG_MAGIC)
        or payload.startswith(JPEG_MAGIC) else 0.0,
        1.0 if payload.startswith(ZIP_MAGIC) else 0.0,
        1.0 if head[:1] == b"<" else 0.0,
        1.0 if b'"spans": [[' in payload or b'"spans":[[' in payload
        else 0.0,
        1.0 if b'"image":' in payload else 0.0,
        float(np.log10(max(len(payload), 1))),
    ], dtype=np.float64)


class RendererClassifierWorker:
    """Actor-pool stage: (url, html) pages batch -> (url, renderer_kind,
    renderer_conf). Pass to ``map_batches(RendererClassifierWorker,
    concurrency=N, batch_format="pyarrow")``."""

    def __init__(self, checkpoint: str | None = None) -> None:
        self.w, self.b = _W, _B
        if checkpoint is None:
            return
        if checkpoint.endswith(".pth"):
            # the reference's torch path (model_manager.py:136-146):
            # load when torch exists, else warn + pretrained fallback
            try:
                import torch
                state = torch.load(checkpoint, map_location="cpu")
                w = state["weight"].numpy().astype(np.float64)
                b = state["bias"].numpy().astype(np.float64)
                self.w, self.b = w, b
            except ImportError:
                log.warning("torch not available; renderer classifier "
                            "using pretrained weights")
            except Exception as exc:  # corrupt/missing/wrong-keyed .pth:
                # the contract is warn-and-fallback, never a dead actor
                log.warning("renderer checkpoint %s not loadable (%s); "
                            "using pretrained weights", checkpoint, exc)
        else:
            try:
                with np.load(checkpoint) as z:
                    w = z["weight"].astype(np.float64)
                    b = z["bias"].astype(np.float64)
                self.w, self.b = w, b
            except Exception as exc:  # missing file is OSError, corrupt
                # npz is ValueError, wrong keys KeyError — all fall back
                log.warning("renderer checkpoint %s not loadable (%s); "
                            "using pretrained weights", checkpoint, exc)
        if self.w.shape != (len(CLASSES), len(FEATURES)) or \
                self.b.shape != (len(CLASSES),):
            log.warning("renderer checkpoint shape mismatch; using "
                        "pretrained weights")
            self.w, self.b = _W, _B

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["html"].to_pylist()
        feats = np.stack([_featurize(p) for p in payloads]) if payloads \
            else np.empty((0, len(FEATURES)))
        logits = feats @ self.w.T + self.b
        # softmax (stable)
        logits -= logits.max(axis=1, keepdims=True)
        ex = np.exp(logits)
        probs = ex / ex.sum(axis=1, keepdims=True)
        idx = probs.argmax(axis=1)
        return pa.table({
            "url": batch["url"],
            "renderer_kind": pa.array([CLASSES[i] for i in idx],
                                      pa.string()),
            "renderer_conf": pa.array(probs[np.arange(len(idx)), idx],
                                      pa.float64()),
        })


def classify_renderers(pages, checkpoint: str | None = None,
                       concurrency=None):
    """Dataset helper: pages -> (url, renderer_kind, renderer_conf)."""
    kwargs = {"batch_format": "pyarrow"}
    if concurrency is not None:
        return pages.map_batches(RendererClassifierWorker,
                                 fn_constructor_kwargs={
                                     "checkpoint": checkpoint},
                                 concurrency=concurrency, **kwargs)
    return pages.map_batches(RendererClassifierWorker(checkpoint), **kwargs)
