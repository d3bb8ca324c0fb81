"""WARC source/sink: round-trip, CC-layout compatibility, error
surfaces, and the read_warc -> extraction integration."""

import gzip
import os

import pyarrow as pa
import pytest
import ray.data as rd

from ocr_model_ray.sources.warc import (
    _iter_records, read_warc, record_bytes, warc_bytes, write_warc,
    write_warc_dir)


def _pages(n=7):
    urls = [f"https://example.com/doc/{i}" for i in range(n)]
    tss = [1700000000 + i * 3600 for i in range(n)]
    payloads = [f"<html><body><p>doc {i} body</p></body></html>"
                .encode() for i in range(n)]
    return urls, tss, payloads


def test_roundtrip_gz(tmp_path):
    urls, tss, payloads = _pages()
    path = str(tmp_path / "shard.warc.gz")
    assert write_warc(path, urls, tss, payloads) == len(urls)
    out = read_warc(path).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(out.columns) == ["url", "warc_ts", "html"]
    assert out["url"].tolist() == sorted(urls)
    got = dict(zip(out["url"], out["html"]))
    for u, p in zip(urls, payloads):
        assert got[u] == p
    # timestamps land in epoch-us as timestamp[us]
    ts = dict(zip(out["url"], out["warc_ts"]))
    import pandas as pd
    for u, t in zip(urls, tss):
        assert ts[u] == pd.Timestamp(t, unit="s")


def test_roundtrip_plain_warc(tmp_path):
    urls, tss, payloads = _pages(3)
    path = str(tmp_path / "shard.warc")
    write_warc(path, urls, tss, payloads)
    out = read_warc(path).to_pandas()
    assert len(out) == 3


def test_writer_deterministic():
    urls, tss, payloads = _pages(4)
    assert warc_bytes(urls, tss, payloads) == warc_bytes(urls, tss, payloads)


def test_per_record_gzip_members(tmp_path):
    """CC layout: each record its own gzip member — a decoder that
    stops at the first member sees exactly one record."""
    urls, tss, payloads = _pages(3)
    data = warc_bytes(urls, tss, payloads)
    f = gzip.GzipFile(fileobj=__import__("io").BytesIO(data))
    first = f.read()  # python gzip reads ALL members; check framing
    assert first.count(b"WARC/1.0") == 3
    # member boundaries: the raw stream has 3 gzip magic headers
    assert data.count(b"\x1f\x8b\x08") == 3


def test_non_page_records_skipped(tmp_path):
    urls, tss, payloads = _pages(2)
    rec = record_bytes(urls[0], tss[0], payloads[0])
    warcinfo = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    request = (b"WARC/1.0\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: " + urls[1].encode() + b"\r\n"
               b"Content-Length: 0\r\n\r\n\r\n\r\n")
    path = str(tmp_path / "mixed.warc")
    with open(path, "wb") as f:
        f.write(warcinfo + rec + request)
    out = read_warc(path).to_pandas()
    assert out["url"].tolist() == [urls[0]]


def test_truncated_body_raises(tmp_path):
    urls, tss, payloads = _pages(1)
    rec = record_bytes(urls[0], tss[0], payloads[0])
    path = str(tmp_path / "trunc.warc")
    with open(path, "wb") as f:
        f.write(rec[:len(rec) - 30])
    with pytest.raises(Exception, match="truncated|trunc.warc"):
        read_warc(path).materialize()


def test_garbage_header_raises(tmp_path):
    path = str(tmp_path / "bad.warc")
    with open(path, "wb") as f:
        f.write(b"NOT-A-WARC\r\n\r\n")
    with pytest.raises(Exception, match="WARC"):
        read_warc(path).materialize()


def test_iter_records_incremental():
    """Parser behaves with a 1-byte read function (stream framing
    never depends on chunk boundaries)."""
    urls, tss, payloads = _pages(2)
    data = record_bytes(urls[0], tss[0], payloads[0]) + \
        record_bytes(urls[1], tss[1], payloads[1])
    pos = [0]

    def read1(_n):
        if pos[0] >= len(data):
            return b""
        b = data[pos[0]:pos[0] + 1]
        pos[0] += 1
        return b

    recs = list(_iter_records(read1, "mem"))
    assert len(recs) == 2
    assert recs[0][0][b"warc-target-uri"].decode() == urls[0]


def test_write_warc_dir_sink(tmp_path):
    urls, tss, payloads = _pages(6)
    import pandas as pd
    ds = rd.from_pandas(pd.DataFrame({
        "url": urls,
        "warc_ts": pd.to_datetime(tss, unit="s"),
        "html": payloads})).repartition(2)
    out_dir = str(tmp_path / "warcs")
    receipts = write_warc_dir(ds, out_dir).to_pandas()
    assert receipts["n_records"].sum() == 6
    assert len(receipts) == 2
    back = read_warc(out_dir).to_pandas()
    assert sorted(back["url"]) == sorted(urls)
    # content-derived part names: re-running the same blocks overwrites
    receipts2 = write_warc_dir(ds, out_dir).to_pandas()
    assert sorted(receipts2["path"]) == sorted(receipts["path"])
    assert len(os.listdir(out_dir)) == 2


def test_warc_to_extraction_matches_parquet_path(tmp_path):
    """read_warc feeds the extraction pipeline with byte-identical
    html -> identical extracted text vs the parquet pages path."""
    from ocr_model_ray.stages.extract import ExtractWorker

    urls, tss, _ = _pages(4)
    payloads = [
        (f"<html><head><title>t{i}</title></head><body>"
         f"<div><p>Main content paragraph {i} with enough words to "
         f"score as body text in the block classifier.</p></div>"
         f"<div><a href='/x'>nav</a></div></body></html>").encode()
        for i in range(4)]
    path = str(tmp_path / "pages.warc.gz")
    write_warc(path, urls, tss, payloads)

    via_warc = (read_warc(path)
                .map_batches(ExtractWorker, concurrency=1,
                             batch_format="pyarrow")
                .to_pandas().sort_values("url").reset_index(drop=True))

    import pandas as pd
    pq = str(tmp_path / "pages.parquet")
    pa_tbl = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array(
            pd.to_datetime(tss, unit="s"), pa.timestamp("us")),
        "html": pa.array(payloads, pa.large_binary())})
    import pyarrow.parquet as pqw
    pqw.write_table(pa_tbl, pq)
    via_pq = (rd.read_parquet(pq)
              .map_batches(ExtractWorker, concurrency=1,
                           batch_format="pyarrow")
              .to_pandas().sort_values("url").reset_index(drop=True))

    assert via_warc["extracted_text"].tolist() == \
        via_pq["extracted_text"].tolist()
    assert (via_warc["extracted_text"].str.len() > 0).all()


def test_wet_sink_roundtrip(tmp_path):
    """extract -> WET (conversion records) -> read_warc recovers the
    extracted text bytes per url."""
    from ocr_model_ray.sources.warc import write_wet_dir
    import pandas as pd
    texts = [f"extracted body {i}" for i in range(5)]
    ds = rd.from_pandas(pd.DataFrame({
        "url": [f"https://e.com/{i}" for i in range(5)],
        "extracted_text": texts}))
    out_dir = str(tmp_path / "wet")
    receipts = write_wet_dir(ds, out_dir).to_pandas()
    assert receipts["n_records"].sum() == 5
    back = read_warc(out_dir).to_pandas().sort_values("url")
    assert [b.decode() for b in back["html"]] == texts
    # conversion records: payload is bare text, no HTTP envelope
    raw = gzip.decompress(
        open(os.path.join(out_dir, os.listdir(out_dir)[0]), "rb")
        .read().split(b"\x1f\x8b")[1].join([b"\x1f\x8b", b""]))
    assert b"WARC-Type: conversion" in raw
    assert b"HTTP/1.1" not in raw


def test_read_pages_dispatches_warc(tmp_path):
    """read_pages detects a WARC directory and yields the pages-table
    schema, so the whole extraction pipeline ingests a crawl dir."""
    from ocr_model_ray.sources.pages import read_pages
    urls, tss, payloads = _pages(4)
    d = tmp_path / "crawl"
    d.mkdir()
    write_warc(str(d / "shard-0.warc.gz"), urls[:2], tss[:2], payloads[:2])
    write_warc(str(d / "shard-1.warc.gz"), urls[2:], tss[2:], payloads[2:])
    out = read_pages(str(d)).to_pandas().sort_values("url")
    assert list(out.columns) == ["url", "html"]
    assert out["url"].tolist() == sorted(urls)
    # full column set on request
    out3 = read_pages(str(d), columns=["url", "warc_ts", "html"]).to_pandas()
    assert list(out3.columns) == ["url", "warc_ts", "html"]


def test_run_resumable_over_warc_matches_parquet(tmp_path):
    """The job driver's pipeline over a WARC crawl directory equals the
    same corpus via parquet — per-url byte-identical extracted text."""
    import pandas as pd
    import pyarrow.parquet as pqw
    from ocr_model_ray.pipelines.checkpoint import run_resumable
    from ocr_model_ray.pipelines.extract_pipeline import ExtractConfig

    urls, tss, _ = _pages(6)
    payloads = [
        (f"<html><body><p>Body paragraph {i} long enough to be kept "
         f"as main content by the scorer.</p></body></html>").encode()
        for i in range(6)]
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    write_warc(str(crawl / "shard.warc.gz"), urls, tss, payloads)

    pq_dir = tmp_path / "pages_pq"
    pq_dir.mkdir()
    pqw.write_table(pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array(pd.to_datetime(tss, unit="s"),
                            pa.timestamp("us")),
        "html": pa.array(payloads, pa.large_binary())}),
        str(pq_dir / "pages-0.parquet"))

    cfg = ExtractConfig(emit="summary")
    run_resumable(str(crawl), str(tmp_path / "out_warc"), cfg,
                  num_partitions=2)
    run_resumable(str(pq_dir), str(tmp_path / "out_pq"), cfg,
                  num_partitions=2)

    def load(d):
        import glob
        fs = glob.glob(str(tmp_path / d / "data" / "**" / "*.parquet"),
                       recursive=True)
        return (pd.concat([pqw.read_table(f).to_pandas() for f in fs])
                .sort_values("url").reset_index(drop=True))

    a, b = load("out_warc"), load("out_pq")
    assert a["url"].tolist() == b["url"].tolist() == sorted(urls)
    assert a["extracted_text"].tolist() == b["extracted_text"].tolist()


def test_errors_skip_keeps_good_prefix(tmp_path):
    """errors='skip' keeps records parsed before a damaged tail and
    logs instead of failing; the default still raises."""
    urls, tss, payloads = _pages(3)
    good = b"".join(record_bytes(u, t, p)
                    for u, t, p in zip(urls[:2], tss[:2], payloads[:2]))
    path = str(tmp_path / "damaged.warc")
    with open(path, "wb") as f:
        f.write(good + b"GARBAGE-NOT-A-RECORD\r\nmore junk")
    with pytest.raises(Exception, match="WARC"):
        read_warc(path).materialize()
    out = read_warc(path, errors="skip").to_pandas()
    assert sorted(out["url"]) == sorted(urls[:2])


def test_header_folding_continuation():
    """ISO 28500 header folding: continuation lines extend the prior
    value instead of raising or becoming bogus headers."""
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: https://example.com/very/\r\n"
           b" long-path\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           b"Content-Length: 4\r\n\r\nbody\r\n\r\n")
    out = list(_iter_records(
        lambda n, d=[rec]: d.pop() if d else b"", "mem"))
    assert len(out) == 1
    assert out[0][0][b"warc-target-uri"] == \
        b"https://example.com/very/ long-path"


def test_parse_date_fractional_exact():
    from ocr_model_ray.sources.warc import _parse_date
    assert _parse_date(b"2023-11-14T22:13:20.123456Z") == \
        1700000000_123456
    assert _parse_date(b"2023-11-14T22:13:20.999999Z") == \
        1700000000_999999
    assert _parse_date(b"1970-01-01T00:00:00Z") == 0


def test_write_warc_dir_distinct_payload_blocks_no_clobber(tmp_path):
    """Two blocks with the SAME url list but different payloads (dup
    captures split across blocks) must write distinct parts."""
    import pandas as pd
    ds = rd.from_pandas([
        pd.DataFrame({"url": ["https://e.com/x"],
                      "warc_ts": pd.to_datetime([1700000000], unit="s"),
                      "html": [b"capture one"]}),
        pd.DataFrame({"url": ["https://e.com/x"],
                      "warc_ts": pd.to_datetime([1700000000], unit="s"),
                      "html": [b"capture TWO differs"]})])
    out_dir = str(tmp_path / "w")
    receipts = write_warc_dir(ds, out_dir).to_pandas()
    assert receipts["n_records"].sum() == 2
    assert len(os.listdir(out_dir)) == 2
    back = read_warc(out_dir).to_pandas()
    assert sorted(back["html"]) == [b"capture TWO differs",
                                    b"capture one"]


def test_read_pages_mixed_list_raises(tmp_path):
    from ocr_model_ray.sources.pages import read_pages
    with pytest.raises(ValueError, match="mixed"):
        read_pages([str(tmp_path / "a.warc.gz"),
                    str(tmp_path / "b.parquet")])


def test_run_sharded_over_warc_appends(tmp_path):
    """run_sharded ingests a WARC crawl directory shard-aligned: the
    first run processes shard 0; after shard 1 lands, a rerun
    processes ONLY the new shard (append semantics + lineage)."""
    from ocr_model_ray.pipelines.checkpoint import run_sharded
    from ocr_model_ray.pipelines.extract_pipeline import ExtractConfig

    urls, tss, _ = _pages(6)
    payloads = [
        (f"<html><body><p>Shard doc {i} long enough to be kept as "
         f"main content by the scorer.</p></body></html>").encode()
        for i in range(6)]
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    write_warc(str(crawl / "shard-0.warc.gz"),
               urls[:3], tss[:3], payloads[:3])
    out = str(tmp_path / "out")
    cfg = ExtractConfig(emit="summary")
    rec1 = run_sharded(str(crawl), out, cfg)
    assert rec1["rows_written"] == 3

    write_warc(str(crawl / "shard-1.warc.gz"),
               urls[3:], tss[3:], payloads[3:])
    rec2 = run_sharded(str(crawl), out, cfg)
    assert rec2["rows_written"] == 3  # only the new shard
    assert len(rec2.get("shards_skipped",
                        rec2.get("partitions_done_before", []))) >= 1 \
        or rec2["rows_written"] == 3

    import glob as g
    import pyarrow.parquet as pqr
    import pandas as pd
    fs = g.glob(os.path.join(out, "data", "**", "*.parquet"),
                recursive=True)
    all_rows = pd.concat([pqr.read_table(f).to_pandas() for f in fs])
    assert sorted(all_rows["url"]) == sorted(urls)


def test_framing_survives_adversarial_payloads():
    """Content-Length framing: payloads containing CRLF runs, fake
    'WARC/1.0' headers, gzip magic, and blank lines round-trip
    byte-exactly (hypothesis-style sweep, fixed seed)."""
    import random

    rng = random.Random(42)
    tricky = [b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n",
              b"\x1f\x8b\x08" * 5, b"", b"\r\n" * 10,
              b"Content-Length: 99999\r\n\r\n",
              bytes(rng.randrange(256) for _ in range(1000))]
    urls = [f"https://t.example/{i}" for i in range(len(tricky))]
    tss = [1700000000 + i for i in range(len(tricky))]
    data = b"".join(record_bytes(u, t, p)
                    for u, t, p in zip(urls, tss, tricky))
    pos = [0]

    def read(n):
        b = data[pos[0]:pos[0] + n]
        pos[0] += n
        return b

    recs = list(_iter_records(read, "mem"))
    assert len(recs) == len(tricky)
    got = {}
    for headers, body in recs:
        url = headers[b"warc-target-uri"].decode()
        i = body.find(b"\r\n\r\n")
        got[url] = body[i + 4:]
    for u, p in zip(urls, tricky):
        assert got[u] == p, u
