"""Incremental snapshot extraction: carries unchanged rows, re-extracts
changed/new ones, output equals a full re-extraction."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_model_ray.pipelines.checkpoint import run_resumable
from ocr_model_ray.pipelines.extract_pipeline import ExtractConfig
from ocr_model_ray.pipelines.incremental import run_incremental


def _html(i, rev=0):
    return (f"<html><body><p>Document {i} revision {rev} with a body "
            f"paragraph long enough to be kept as main content by the "
            f"block scorer in every revision.</p></body></html>"
            ).encode()


def _write_pages(path, rows):
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array(
            pd.to_datetime([1700000000 + i for i in range(len(rows))],
                           unit="s"), pa.timestamp("us")),
        "html": pa.array([r[1] for r in rows], pa.large_binary())}),
        path)


def _load(out_dir):
    fs = glob.glob(os.path.join(out_dir, "data", "**", "*.parquet"),
                   recursive=True)
    return (pd.concat([pq.read_table(f).to_pandas() for f in fs])
            .drop(columns=["part_id"], errors="ignore")
            .sort_values("url").reset_index(drop=True))


def test_incremental_equals_full_reextraction(tmp_path):
    urls = [f"https://inc.example/{i}" for i in range(12)]
    v1 = [(u, _html(i)) for i, u in enumerate(urls)]
    # v2: drop 2 urls, change 3 docs, add 2 new urls, keep 7
    v2 = ([(u, _html(i, rev=1)) for i, u in enumerate(urls[:3])] +
          [(u, _html(i)) for i, u in enumerate(urls) if 3 <= i < 10] +
          [(f"https://inc.example/new{j}", _html(100 + j))
           for j in range(2)])

    d1 = tmp_path / "pages_v1"
    d2 = tmp_path / "pages_v2"
    d1.mkdir(), d2.mkdir()
    _write_pages(str(d1 / "pages.parquet"), v1)
    _write_pages(str(d2 / "pages.parquet"), v2)

    cfg = ExtractConfig(emit="summary")
    run_resumable(str(d1), str(tmp_path / "out_v1"), cfg,
                  num_partitions=4)

    rec = run_incremental(str(d2), str(tmp_path / "out_v1"),
                          str(tmp_path / "out_v2"), cfg,
                          num_partitions=4)
    # verdict split: 7 unchanged carried; 3 changed + 2 new extracted
    assert rec["rows_written"] == 12
    assert rec["rows_carried"] == 7
    assert rec["rows_extracted"] == 5

    run_resumable(str(d2), str(tmp_path / "out_full"), cfg,
                  num_partitions=4)

    inc, full = _load(str(tmp_path / "out_v2")), \
        _load(str(tmp_path / "out_full"))
    assert inc["url"].tolist() == full["url"].tolist()
    for col in full.columns:
        assert inc[col].tolist() == full[col].tolist(), col
    # dropped urls are gone, new urls present
    assert urls[10] not in set(inc["url"])
    assert "https://inc.example/new0" in set(inc["url"])


def test_incremental_all_unchanged_extracts_nothing(tmp_path):
    rows = [(f"https://inc.example/{i}", _html(i)) for i in range(5)]
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(str(d / "pages.parquet"), rows)
    cfg = ExtractConfig(emit="summary")
    run_resumable(str(d), str(tmp_path / "o1"), cfg, num_partitions=2)
    rec = run_incremental(str(d), str(tmp_path / "o1"),
                          str(tmp_path / "o2"), cfg, num_partitions=2)
    assert rec["rows_carried"] == 5
    assert rec["rows_extracted"] == 0
    assert _load(str(tmp_path / "o1")).equals(_load(str(tmp_path / "o2")))


def test_incremental_schema_contract(tmp_path):
    """The prior's schema is the output contract: a summary prior
    accepts any emit (fresh side projects down, values identical); a
    full-layout prior demands emit='full'."""
    import pytest
    rows = [(f"https://inc.example/{i}", _html(i)) for i in range(3)]
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(str(d / "pages.parquet"), rows)
    # summary prior + emit='full' cfg -> fresh projects to summary
    run_resumable(str(d), str(tmp_path / "o1"),
                  ExtractConfig(emit="summary"), num_partitions=2)
    rec = run_incremental(str(d), str(tmp_path / "o1"),
                          str(tmp_path / "o2"),
                          ExtractConfig(emit="full"), num_partitions=2)
    assert rec["rows_carried"] == 3
    assert _load(str(tmp_path / "o1")).equals(_load(str(tmp_path / "o2")))
    # full-layout prior + summary emit -> error naming the fix
    run_resumable(str(d), str(tmp_path / "of"),
                  ExtractConfig(emit="full"), num_partitions=2,
                  drop_nested=False)
    with pytest.raises(ValueError, match="emit='full'"):
        run_incremental(str(d), str(tmp_path / "of"),
                        str(tmp_path / "o3"),
                        ExtractConfig(emit="summary"), num_partitions=2)


def test_hash_bucket_semi_exact_and_nested():
    """hash_bucket_semi: exact membership, anti mode, nested payload
    columns pass through, right-side duplicates don't multiply rows."""
    import ray.data as rd
    from ocr_model_ray.functions.joins import hash_bucket_semi

    left = rd.from_arrow(pa.table({
        "url": [f"u{i}" for i in range(10)],
        "pages": pa.array([[{"n": i}] for i in range(10)],
                          pa.list_(pa.struct([("n", pa.int32())]))),
        "x": list(range(10))}))
    right = rd.from_arrow(pa.table({
        "url": ["u1", "u3", "u3", "u3", "u7", "unknown"]}))

    kept = hash_bucket_semi(left, right, on="url").to_pandas()
    assert sorted(kept["url"]) == ["u1", "u3", "u7"]
    assert kept.loc[kept["url"] == "u3", "pages"].iloc[0][0]["n"] == 3

    anti = hash_bucket_semi(left, right, on="url", anti=True).to_pandas()
    assert sorted(anti["url"]) == sorted(
        f"u{i}" for i in range(10) if i not in (1, 3, 7))

    # empty right: semi keeps nothing, anti keeps everything
    empty = rd.from_arrow(pa.table({"url": pa.array([], pa.string())}))
    assert len(hash_bucket_semi(left, empty, on="url").to_pandas()) == 0
    assert len(hash_bucket_semi(left, empty, on="url",
                                anti=True).to_pandas()) == 10


def test_incremental_full_emit_nested_columns(tmp_path):
    """The carry path handles the full nested layout (the schema the
    default profile writes)."""
    rows = [(f"https://inc.example/{i}", _html(i)) for i in range(4)]
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(str(d / "pages.parquet"), rows)
    cfg = ExtractConfig(emit="full")
    run_resumable(str(d), str(tmp_path / "o1"), cfg, num_partitions=2,
                  drop_nested=False)
    rec = run_incremental(str(d), str(tmp_path / "o1"),
                          str(tmp_path / "o2"), cfg, num_partitions=2)
    assert rec["rows_carried"] == 4 and rec["rows_extracted"] == 0
    a, b = _load(str(tmp_path / "o1")), _load(str(tmp_path / "o2"))
    assert a["url"].tolist() == b["url"].tolist()
    assert a["extracted_text"].tolist() == b["extracted_text"].tolist()


def test_incremental_bucketed_fallback_paths(tmp_path, monkeypatch):
    """BROADCAST_CUT=0 forces both exchange fallbacks (hash_bucket_semi
    for the changed pages AND the carried prior rows); output still
    equals the full re-extraction."""
    import ocr_model_ray.pipelines.incremental as inc
    monkeypatch.setattr(inc, "BROADCAST_CUT", 0)

    urls = [f"https://inc.example/{i}" for i in range(8)]
    v1 = [(u, _html(i)) for i, u in enumerate(urls)]
    v2 = ([(u, _html(i, rev=1)) for i, u in enumerate(urls[:2])] +
          [(u, _html(i)) for i, u in enumerate(urls) if i >= 2])
    d1, d2 = tmp_path / "p1", tmp_path / "p2"
    d1.mkdir(), d2.mkdir()
    _write_pages(str(d1 / "pages.parquet"), v1)
    _write_pages(str(d2 / "pages.parquet"), v2)
    cfg = ExtractConfig(emit="summary")
    run_resumable(str(d1), str(tmp_path / "o1"), cfg, num_partitions=2)
    rec = run_incremental(str(d2), str(tmp_path / "o1"),
                          str(tmp_path / "o2"), cfg, num_partitions=2)
    assert rec["rows_carried"] == 6 and rec["rows_extracted"] == 2
    run_resumable(str(d2), str(tmp_path / "of"), cfg, num_partitions=2)
    a, b = _load(str(tmp_path / "o2")), _load(str(tmp_path / "of"))
    assert a["url"].tolist() == b["url"].tolist()
    assert a["extracted_text"].tolist() == b["extracted_text"].tolist()


def test_incremental_duplicate_captures_match_full(tmp_path):
    """Real crawls carry duplicate captures of a url: any multiplicity
    makes the url non-carryable, so incremental == full still holds
    and the carry/extract accounting stays exact."""
    base = [(f"https://inc.example/{i}", _html(i)) for i in range(6)]
    # v1: url 0 captured twice (identical payload)
    v1 = base + [base[0]]
    # v2: url 0 twice again (unchanged content, but 2x2 capture ->
    # extract), url 1 twice with one changed capture, rest unchanged
    v2 = (base + [base[0]] +
          [("https://inc.example/1", _html(1, rev=1))])
    d1, d2 = tmp_path / "p1", tmp_path / "p2"
    d1.mkdir(), d2.mkdir()
    _write_pages(str(d1 / "pages.parquet"), v1)
    _write_pages(str(d2 / "pages.parquet"), v2)
    cfg = ExtractConfig(emit="summary")
    run_resumable(str(d1), str(tmp_path / "o1"), cfg, num_partitions=2)
    rec = run_incremental(str(d2), str(tmp_path / "o1"),
                          str(tmp_path / "o2"), cfg, num_partitions=2)
    run_resumable(str(d2), str(tmp_path / "of"), cfg, num_partitions=2)
    a, b = _load(str(tmp_path / "o2")), _load(str(tmp_path / "of"))
    a = a.sort_values(["url", "extracted_text"]).reset_index(drop=True)
    b = b.sort_values(["url", "extracted_text"]).reset_index(drop=True)
    assert a["url"].tolist() == b["url"].tolist()
    assert a["extracted_text"].tolist() == b["extracted_text"].tolist()
    # urls 2..5 carried (1x1 equal); urls 0 (2x2) and 1 (2 captures,
    # one changed) re-extracted in every capture
    assert rec["rows_carried"] == 4
    assert rec["rows_extracted"] == len(b) - 4


def test_incremental_over_warc_snapshots(tmp_path):
    """Composition: two WARC crawl directories processed as
    full-then-incremental equal a full run of the second — the
    format dispatch and the verdict plan compose."""
    from ocr_model_ray.sources.warc import write_warc

    def html(i, rev=0):
        return (f"<html><body><p>Warc snapshot doc {i} rev {rev} "
                f"kept as main content by the scorer for sure."
                f"</p></body></html>").encode()

    urls = [f"https://w.example/{i}" for i in range(6)]
    tss = [1700000000 + i for i in range(6)]
    c1, c2 = tmp_path / "crawl1", tmp_path / "crawl2"
    c1.mkdir(), c2.mkdir()
    write_warc(str(c1 / "s.warc.gz"), urls, tss,
               [html(i) for i in range(6)])
    write_warc(str(c2 / "s.warc.gz"), urls, tss,
               [html(i, rev=1 if i < 2 else 0) for i in range(6)])

    cfg = ExtractConfig(emit="summary")
    run_resumable(str(c1), str(tmp_path / "o1"), cfg, num_partitions=2)
    rec = run_incremental(str(c2), str(tmp_path / "o1"),
                          str(tmp_path / "o2"), cfg, num_partitions=2)
    assert rec["rows_extracted"] == 2 and rec["rows_carried"] == 4
    run_resumable(str(c2), str(tmp_path / "of"), cfg, num_partitions=2)
    a, b = _load(str(tmp_path / "o2")), _load(str(tmp_path / "of"))
    assert a["extracted_text"].tolist() == b["extracted_text"].tolist()
