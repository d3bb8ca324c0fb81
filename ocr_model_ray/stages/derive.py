"""Derived-column stage: mime sniff, content hash, size metrics (S2/S3/M16).

One stateless ``map_batches`` over Arrow batches. Hashing uses
hashlib's C sha256 over buffer slices; the mime sniff inspects only the
first bytes of each payload. Both are cheap relative to payload I/O, so
this stage stays fused with the read.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa

from ..spec import sniff_mime


def derive_batch(batch: pa.Table) -> pa.Table:
    """Append content_hash / mime / size_bytes / size_bucket.

    size_bucket = ceil(log2(size_bytes)) — the skew-repartition key
    (SURVEY.md §4.2): giant blobs land in their own buckets so a later
    ``repartition``/sort can isolate them into small blocks.
    """
    payloads = batch["html"].to_pylist()
    hashes, mimes, sizes, buckets = [], [], [], []
    for b in payloads:
        hashes.append(hashlib.sha256(b).hexdigest())
        mimes.append(sniff_mime(b[:512]))
        n = len(b)
        sizes.append(n)
        buckets.append(int(math.ceil(math.log2(n))) if n > 1 else 0)
    return (batch
            .append_column("content_hash", pa.array(hashes, pa.string()))
            .append_column("mime", pa.array(mimes, pa.string()))
            .append_column("size_bytes", pa.array(sizes, pa.int64()))
            .append_column("size_bucket", pa.array(buckets, pa.int8())))
