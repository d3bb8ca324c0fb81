"""WARC source/sink: the Common-Crawl container for the pages corpus.

The engine's canonical input is the Parquet pages table
(url, warc_ts, html — BASELINE.json input_hint), but the raw crawl
itself is served as WARC (ISO 28500): a sequence of records, each a
header block (``WARC/1.0`` + name:value lines), a CRLF blank line, a
``Content-Length``-delimited body, and a CRLF CRLF terminator.
Common Crawl compresses each record as its OWN gzip member and
concatenates the members into one ``.warc.gz`` — so a reader can
stream the file start-to-finish with an ordinary multi-member gzip
decoder, and a writer can parallelize record compression freely.

This module closes the loop from raw crawl to pages table:

- ``read_warc(paths)`` — a streaming ``FileBasedDatasource``: one read
  task per WARC file (the CC shard layout: ~1 GB files, thousands per
  crawl), records parsed incrementally off the decompressed stream
  (never the whole file in memory), yielded as Arrow batches with the
  pages-table schema ``url:string, warc_ts:timestamp[us],
  html:large_binary``. Ray's streaming executor pipelines the parse
  into downstream ``map_batches`` with backpressure, so
  ``read_warc -> extraction`` runs end-to-end without a staging copy.
- ``warc_bytes(batch)`` / ``write_warc(path, rows)`` — deterministic
  writer (fixed gzip mtime, record ids derived from url+date, LF-free
  header layout): byte-identical output for identical input, which is
  what the round-trip tests pin.
- ``write_warc_dir(ds, out_dir)`` — the distributed sink: each block
  becomes one ``.warc.gz`` part named by the md5 of its record ids,
  so a re-run of the same partitioning overwrites parts in place
  instead of duplicating them.

Reference note: the reference ingests loose local files through its
storage manager (worker/storage_manager.py:64-69) and has no crawl
container; WARC is the web-corpus equivalent surface for this
engine's input shape, built from the public spec only.
"""

from __future__ import annotations

import gzip
import hashlib
from datetime import datetime, timezone
from typing import Iterator, List, Sequence, Union

import numpy as np
import pyarrow as pa

CRLF = b"\r\n"

#: record batching for the reader: flush a batch at either bound
_BATCH_RECORDS = 512
_BATCH_BYTES = 32 << 20

#: WARC-Types whose payload is a page body we ingest
_PAGE_TYPES = (b"response", b"resource", b"conversion")

_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
])


# ---------------------------------------------------------------- writer

def _iso(ts) -> str:
    """WARC-Date (UTC, second precision — the CC convention)."""
    if isinstance(ts, (int, np.integer)):
        dt = datetime.fromtimestamp(int(ts), tz=timezone.utc)
    elif isinstance(ts, datetime):
        dt = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
    else:  # numpy datetime64 / pandas Timestamp
        dt = datetime.fromtimestamp(
            int(np.datetime64(ts, "s").astype("int64")), tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def record_bytes(url: str, ts, payload: bytes,
                 warc_type: str = "response") -> bytes:
    """One uncompressed WARC record, deterministic: the record id is
    the md5 of (url, date) formatted as a urn:uuid. ``response``
    records wrap the payload in a fixed 200/text-html HTTP envelope
    (the crawl shape); ``conversion`` records carry the bare payload
    as text/plain (the WET extracted-text shape)."""
    date = _iso(ts)
    h = hashlib.md5(f"{url}\x00{date}".encode()).hexdigest()
    rid = f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}>"
    if warc_type == "response":
        http_head = (b"HTTP/1.1 200 OK" + CRLF +
                     b"Content-Type: text/html; charset=utf-8" + CRLF +
                     b"Content-Length: " + str(len(payload)).encode() +
                     CRLF + CRLF)
        block = http_head + payload
        ctype = b"application/http; msgtype=response"
    else:
        block = payload
        ctype = b"text/plain"
    head = (b"WARC/1.0" + CRLF +
            b"WARC-Type: " + warc_type.encode() + CRLF +
            b"WARC-Record-ID: " + rid.encode() + CRLF +
            b"WARC-Date: " + date.encode() + CRLF +
            b"WARC-Target-URI: " + url.encode() + CRLF +
            b"Content-Type: " + ctype + CRLF +
            b"Content-Length: " + str(len(block)).encode() + CRLF +
            CRLF)
    return head + block + CRLF + CRLF


def warc_bytes(urls: Sequence[str], tss: Sequence, payloads: Sequence[bytes],
               per_record_gzip: bool = True,
               warc_type: str = "response") -> bytes:
    """The ``.warc.gz`` bytes for a batch of pages: one gzip member per
    record (mtime pinned to 0 so identical input is byte-identical
    output), concatenated — the CC layout."""
    parts = []
    for url, ts, payload in zip(urls, tss, payloads):
        rec = record_bytes(url, ts,
                           payload if payload is not None else b"",
                           warc_type=warc_type)
        parts.append(gzip.compress(rec, mtime=0) if per_record_gzip else rec)
    return b"".join(parts)


def write_warc(path: str, urls: Sequence[str], tss: Sequence,
               payloads: Sequence[bytes]) -> int:
    """Write one ``.warc.gz`` (or plain ``.warc`` if the path has no
    .gz suffix) locally; returns the record count."""
    data = warc_bytes(urls, tss, payloads,
                      per_record_gzip=path.endswith(".gz"))
    with open(path, "wb") as f:
        f.write(data)
    return len(urls)


def write_warc_dir(ds, out_dir: str,
                   url_col: str = "url", ts_col: str = "warc_ts",
                   payload_col: str = "html",
                   warc_type: str = "response"):
    """Distributed WARC sink: one ``.warc.gz`` part per block, named
    ``part-<md5 of the block's record ids>.warc.gz`` — content-derived,
    so re-running the same partitioning overwrites rather than
    duplicates (the export-store convention). Returns a Dataset of
    (path, n_records) receipts."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def per_block(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        # streams without a capture time (e.g. extraction output) get
        # the epoch — WARC-Date is mandatory in the record header
        tss = (t[ts_col].to_pylist() if ts_col in t.column_names
               else [0] * t.num_rows)
        payloads = [p if isinstance(p, bytes) else
                    ("" if p is None else p).encode()
                    for p in t[payload_col].to_pylist()]
        data = warc_bytes(urls, tss, payloads, warc_type=warc_type)
        # name by the md5 of the part's FULL bytes: two blocks collide
        # only when their content is identical (overwrite harmless);
        # blocks sharing a url list but differing in payload (dup
        # captures split across blocks) keep distinct parts
        tag = hashlib.md5(data).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{tag}.warc.gz")
        with open(path, "wb") as f:
            f.write(data)
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(urls)], pa.int64())})

    return ds.map_batches(per_block, batch_format="pyarrow",
                          batch_size=None)


def write_wet_dir(extracted, out_dir: str,
                  url_col: str = "url", ts_col: str = "warc_ts",
                  text_col: str = "extracted_text"):
    """WET-style sink: the extraction output's text as ``conversion``
    records (text/plain) — the Common-Crawl extracted-text companion
    format. ``read_warc`` ingests conversion records too, so
    extraction output round-trips: extract -> WET -> read_warc yields
    (url, warc_ts, html=text-bytes)."""
    return write_warc_dir(extracted, out_dir, url_col=url_col,
                          ts_col=ts_col, payload_col=text_col,
                          warc_type="conversion")


# ---------------------------------------------------------------- reader

def _iter_records(read, path: str):
    """Incremental record iterator over a decompressed WARC stream:
    (headers dict, body bytes) pairs. Never holds more than one record
    plus one read chunk in memory."""
    buf = bytearray()

    def fill() -> bool:
        chunk = read(1 << 20)
        if not chunk:
            return False
        buf.extend(chunk)
        return True

    def read_line() -> bytes:
        while True:
            i = buf.find(b"\n")
            if i >= 0:
                line = bytes(buf[:i + 1])
                del buf[:i + 1]
                return line
            if not fill():
                line = bytes(buf)
                del buf[:]
                return line

    while True:
        line = read_line()
        while line and line.strip() == b"":  # inter-record blank lines
            line = read_line()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"{path}: expected a WARC/ version line, got "
                f"{line[:40]!r}")
        headers: dict = {}
        last_key = None
        while True:
            line = read_line()
            if line in (CRLF, b"\n"):
                break
            if not line:
                raise ValueError(f"{path}: truncated record header")
            if line[:1] in (b" ", b"\t") and last_key is not None:
                # ISO 28500 header folding: continuation lines start
                # with whitespace and extend the previous value
                headers[last_key] += b" " + line.strip()
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(
                    f"{path}: malformed header line {line[:60]!r}")
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        try:
            n = int(headers[b"content-length"])
        except KeyError:
            raise ValueError(f"{path}: record without Content-Length")
        while len(buf) < n:
            if not fill():
                raise ValueError(
                    f"{path}: truncated record body "
                    f"({len(buf)}/{n} bytes)")
        body = bytes(buf[:n])
        del buf[:n]
        yield headers, body


def _http_payload(body: bytes) -> bytes:
    """Split the HTTP envelope off an application/http block."""
    i = body.find(b"\r\n\r\n")
    return body[i + 4:] if i >= 0 else body


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _parse_date(raw: bytes) -> int:
    """WARC-Date -> int64 epoch microseconds (the pages-table
    timestamp unit). Integer calendar arithmetic — ``timestamp()``
    goes through float64, which is ~0.24 us granular at current
    epochs and can come back 1 us low."""
    s = raw.decode("ascii", "replace").strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    td = dt - _EPOCH
    return ((td.days * 86400 + td.seconds) * 1_000_000
            + td.microseconds)


try:  # pragma: no cover - import guard exercised by tests
    from ray.data.datasource.file_based_datasource import FileBasedDatasource
except ImportError:  # pragma: no cover
    FileBasedDatasource = object


class WarcDatasource(FileBasedDatasource):
    """Streaming WARC reader: one task per file; Ray decompresses the
    ``.gz`` transparently (arrow's gzip stream handles CC's
    concatenated members); records batch into the pages-table schema.

    Only page-bearing records (response / resource / conversion) are
    emitted; request/metadata/warcinfo records are skipped.

    ``errors``: ``"fail"`` (default) — a malformed or truncated file
    fails ITS read task with the path in the error, the standard Ray
    Data retry/visibility path. ``"skip"`` — the damaged TAIL of the
    file is dropped with a loud warning (real crawls contain damaged
    shards); records parsed before the fault are kept. Framing cannot
    resync past a corrupt header inside a decompressed stream, so the
    skip unit is the file remainder, never a silent partial record."""

    # NOT bare "gz": a stray logs.tar.gz in a crawl directory must be
    # excluded by the extension filter, not crash the format check
    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, errors: str = "fail", **kwargs):
        if errors not in ("fail", "skip"):
            raise ValueError(f"errors must be fail|skip, got {errors!r}")
        self._errors = errors
        super().__init__(paths, **kwargs)

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        urls: List[str] = []
        tss: List[int] = []
        payloads: List[bytes] = []
        nbytes = 0

        def flush() -> pa.Table:
            nonlocal urls, tss, payloads, nbytes
            t = pa.table({
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.large_binary())})
            urls, tss, payloads, nbytes = [], [], [], 0
            return t

        records = _iter_records(f.read, path)
        while True:
            try:
                headers, body = next(records)
            except StopIteration:
                break
            except ValueError:
                if self._errors == "fail":
                    raise
                import logging
                logging.getLogger(__name__).warning(
                    "read_warc(errors='skip'): dropping damaged tail "
                    "of %s", path, exc_info=True)
                break
            if headers.get(b"warc-type", b"") not in _PAGE_TYPES:
                continue
            url = headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace").strip("<>")
            ctype = headers.get(b"content-type", b"")
            payload = (_http_payload(body)
                       if ctype.startswith(b"application/http") else body)
            urls.append(url)
            tss.append(_parse_date(headers.get(b"warc-date", b"1970-01-01T00:00:00Z")))
            payloads.append(payload)
            nbytes += len(payload)
            if len(urls) >= _BATCH_RECORDS or nbytes >= _BATCH_BYTES:
                yield flush()
        if urls:
            yield flush()


def read_warc(paths: Union[str, Sequence[str]], errors: str = "fail",
              **kwargs):
    """Read WARC shard(s) into the pages-table shape
    (url, warc_ts, html). ``paths`` is a file, a list of files, or a
    directory of ``.warc[.gz]`` shards; pass ``override_num_blocks``
    etc. through ``kwargs`` like any Ray read. ``errors="skip"``
    drops a damaged file tail with a warning instead of failing the
    read task (see WarcDatasource)."""
    import ray.data as rd

    return rd.read_datasource(WarcDatasource(paths, errors=errors),
                              **kwargs)
