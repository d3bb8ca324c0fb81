"""Derived-column stage: mime sniff, content hash, size metrics (S2/S3/M16).

One stateless ``map_batches`` over Arrow batches. Sizes and skew
buckets come straight from the Arrow offsets buffer (vectorized, no
payload touch); hashing walks ZERO-COPY memoryview slices of the data
buffer — multi-MB payloads are never materialized as Python bytes
objects here (hashlib's C sha256 accepts buffer views). The mime sniff
reads only the first bytes of each slice. Everything stays fused with
the read.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..spec import sniff_mime


def _chunk_views(chunk: pa.Array):
    """(offsets ndarray, memoryview) for a binary/large_binary chunk —
    the zero-copy access path to each value's bytes."""
    dtype = np.int64 if pa.types.is_large_binary(chunk.type) else np.int32
    bufs = chunk.buffers()
    offs = np.frombuffer(bufs[1], dtype=dtype)
    lo = chunk.offset
    return offs[lo:lo + len(chunk) + 1], memoryview(bufs[2])


def derive_batch(batch: pa.Table) -> pa.Table:
    """Append content_hash / mime / size_bytes / size_bucket.

    size_bucket = ceil(log2(size_bytes)) — the skew-repartition key
    (SURVEY.md §4.2): giant blobs land in their own buckets so a later
    ``repartition``/sort can isolate them into small blocks.
    """
    col = batch["html"]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    hashes: list[str] = []
    mimes: list[str] = []
    size_parts: list[np.ndarray] = []
    for chunk in chunks:
        offs, mv = _chunk_views(chunk)
        size_parts.append((offs[1:] - offs[:-1]).astype(np.int64))
        for i in range(len(chunk)):
            view = mv[offs[i]:offs[i + 1]]
            hashes.append(hashlib.sha256(view).hexdigest())
            mimes.append(sniff_mime(bytes(view[:512])))
    sizes = np.concatenate(size_parts) if size_parts else \
        np.empty(0, dtype=np.int64)
    with np.errstate(divide="ignore"):
        buckets = np.where(sizes > 1,
                           np.ceil(np.log2(np.maximum(sizes, 1))), 0) \
            .astype(np.int8)
    return (batch
            .append_column("content_hash", pa.array(hashes, pa.string()))
            .append_column("mime", pa.array(mimes, pa.string()))
            .append_column("size_bytes", pa.array(sizes, pa.int64()))
            .append_column("size_bucket", pa.array(buckets, pa.int8())))
