"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages (training-data-pipeline additions; the decode kernels are
STUBBED — no image/audio libs in this container — but the Ray-side
plumbing (schemas, batch shapes, actor signatures, output layout) is
real and tested).

Decode behavior per payload:
* pseudo-PNG container (spec.PSEUDO_PNG_HEADER + JSON) -> real parse,
  deterministic metadata + features.
* real PNG/JPEG magic -> tries PIL; absent PIL raises
  NotImplementedError("image decode requires pillow") — the clearly
  marked stub boundary. Rows that fail decode dead-letter into the
  ``error`` column, never poison the batch.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from ..spec import JPEG_MAGIC, PNG_MAGIC, PSEUDO_PNG_HEADER

IMAGE_META_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_objects", pa.int32()),   # words/boxes found in the container
    ("format", pa.string()),
    ("error", pa.string()),
])

EMBED_DIM = 32


def _decode_meta(payload: bytes) -> dict:
    if payload.startswith(PSEUDO_PNG_HEADER):
        try:
            body = json.loads(payload[len(PSEUDO_PNG_HEADER):].decode("utf-8"))
            return {"width": int(body.get("w", 0)), "height": int(body.get("h", 0)),
                    "n_objects": len(body.get("words", [])),
                    "format": "pseudo-png", "error": None}
        except (ValueError, UnicodeDecodeError):
            pass  # PNG magic but not our container -> real decoder path
    if payload.startswith(PNG_MAGIC) or payload.startswith(JPEG_MAGIC):
        try:
            from PIL import Image  # noqa: F401 — not in this container
        except ImportError as exc:
            raise NotImplementedError(
                "image decode requires pillow (stubbed in this environment)"
            ) from exc
        import io
        from PIL import Image
        im = Image.open(io.BytesIO(payload))
        return {"width": im.width, "height": im.height, "n_objects": 0,
                "format": im.format.lower() if im.format else "unknown",
                "error": None}
    raise ValueError("unrecognized image container")


class ImageDecodeWorker:
    """Actor-pool stage: (id, image:binary) -> IMAGE_META_SCHEMA rows.
    Batch sizes for binary media stay SMALL (the caller sets batch_size;
    a 1080p frame is ~6 MB decoded — size batch x concurrency to heap)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        payloads = batch["image"].to_pylist()
        out = []
        for i, payload in zip(ids, payloads):
            try:
                m = _decode_meta(payload)
            except Exception as exc:  # noqa: BLE001 — dead-letter per row
                m = {"width": 0, "height": 0, "n_objects": 0,
                     "format": "unknown", "error": f"{type(exc).__name__}: {exc}"}
            m["id"] = i
            out.append(m)
        return pa.Table.from_pylist(out, schema=IMAGE_META_SCHEMA)


class ImageFeatureWorker:
    """Actor-pool stage: deterministic fake feature extractor — a stand-in
    for a vision model with the REAL actor lifecycle ("model" built once
    per actor in __init__, batched inference in __call__). Features are
    a unit-norm EMBED_DIM vector seeded by sha256(payload): stable
    across runs/workers, so pipelines downstream (ANN, dedup) test
    end-to-end."""

    def __init__(self, dim: int = EMBED_DIM) -> None:
        self.dim = dim  # "model load" happens here, once per actor

    def _embed(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        seed = int.from_bytes(h[:8], "big") % (2 ** 32)
        rng = np.random.RandomState(seed)
        v = rng.normal(size=self.dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        payloads = batch["image"].to_pylist()
        vecs = [self._embed(p) for p in payloads]
        return pa.table({
            "id": pa.array(ids, pa.string()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32(), self.dim)),
        })


class FrameSampleWorker:
    """Actor-pool stage for video-like payloads: deterministic frame-index
    sampling (every ``stride``-th of ``n_frames`` declared in the pseudo
    container's metadata; real codec decode is the stubbed boundary).
    Emits one row per sampled frame — a flat_map-shaped batch op."""

    def __init__(self, stride: int = 10) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        metas = batch["n_frames"].to_pylist()
        out_id, out_frame = [], []
        for i, n in zip(ids, metas):
            for f in range(0, int(n), self.stride):
                out_id.append(i)
                out_frame.append(f)
        return pa.table({"id": pa.array(out_id, pa.string()),
                         "frame_index": pa.array(out_frame, pa.int32())})


def decode_images(ds, concurrency: int | tuple = 2, batch_size: int = 32):
    """Wire the decode actor pool (small batches: payloads are wide)."""
    return ds.map_batches(ImageDecodeWorker, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def embed_images(ds, concurrency: int | tuple = 2, batch_size: int = 32):
    return ds.map_batches(ImageFeatureWorker, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
