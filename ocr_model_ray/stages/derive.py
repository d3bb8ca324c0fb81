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


# ---------------------------------------------------------------------------
# HTML <title> extraction (frozen byte-regex spec, oracle-exact)
# ---------------------------------------------------------------------------
#: DuckDB 1.0's BLOB->VARCHAR printable escape, byte for byte: 0x20-0x7E
#: print raw EXCEPT 0x22 ") 0x27 ') 0x5C \) which join every other byte
#: as uppercase \xHH. Injective (the backslash itself is escaped), so a
#: title compared in this transport form is compared at full fidelity.
#: Enumerated against DuckDB over all 256 single-byte blobs.
_DUCK_RAW = frozenset(range(0x20, 0x7F)) - {0x22, 0x27, 0x5C}
_DUCK_ESC = [chr(b) if b in _DUCK_RAW else f"\\x{b:02X}"
             for b in range(256)]

#: frozen title scan (shared with the oracle's RE2 pattern, applied
#: there to the escaped text — '<' can only appear in the escape of
#: byte 0x3C and escape sequences contain none, so the byte-level and
#: escaped-text matches are the same match): first case-insensitive
#: <title>...</title>, title = the bytes up to the next '<'
_TITLE_RE = __import__("re").compile(rb"(?i)<title>([^<]*)</title>")


def duckdb_escape(raw: bytes) -> str:
    """DuckDB's blob printable-escape of ``raw`` (rule above)."""
    if not raw:
        return ""
    arr = np.frombuffer(raw, dtype=np.uint8)
    # fast path: all-printable bytes print raw (titles almost always)
    if ((arr >= 0x20) & (arr <= 0x7E)).all() \
            and not np.isin(arr, (0x22, 0x27, 0x5C)).any():
        return raw.decode("ascii")
    esc = _DUCK_ESC
    return "".join(esc[b] for b in arr)


def html_title_batch(batch: pa.Table, url_col: str = "url",
                     html_col: str = "html") -> pa.Table:
    """(url, title) per HTML page — the page-title column a web index
    (e.g. Common Crawl's columnar index) carries next to each capture.

    Frozen panel spec (every rule mirrored exactly by the SQL twin,
    which runs the same RE2 pattern over DuckDB's escaped blob text):

    * a row is HTML iff its FIRST byte is ``<`` (strict prefix; the
      lstrip-512 sniff for whitespace-led documents lives in
      ``spec.sniff_mime`` — the panel freezes the strict form because
      the escaped-text twin cannot replay a byte-level lstrip exactly);
    * ``title`` = first case-insensitive ``<title>([^<]*)</title>``
      match ON THE RAW BYTES (encoding-agnostic — no decode step, so
      mojibake/latin-1/truncated-UTF-8 pages still yield their exact
      title bytes), transported in ``duckdb_escape`` form; ``''`` when
      the page has no title.

    Per-row work is one C byte-regex scan (the md5/simhash doctrine:
    per-document string work where the C call is the vectorization);
    payloads are read as zero-copy memoryview slices and die at this
    stage boundary.
    """
    col = batch[html_col]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    keep = np.zeros(len(batch), dtype=bool)
    titles: list[str] = []
    row = 0
    for chunk in chunks:
        offs, mv = _chunk_views(chunk)
        valid = chunk.is_valid().to_numpy(zero_copy_only=False)
        for i in range(len(chunk)):
            lo, hi = offs[i], offs[i + 1]
            if not valid[i] or hi == lo or mv[lo] != 0x3C:
                row += 1
                continue
            keep[row] = True
            m = _TITLE_RE.search(mv[lo:hi])
            titles.append(duckdb_escape(bytes(m.group(1))) if m else "")
            row += 1
    urls = batch[url_col].combine_chunks() if isinstance(
        batch[url_col], pa.ChunkedArray) else batch[url_col]
    return pa.table({
        "url": urls.filter(pa.array(keep)),
        "title": pa.array(titles, pa.string())})
