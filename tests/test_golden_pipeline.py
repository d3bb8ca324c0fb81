"""Golden-document correctness (FIXTURES.md §3): the Ray pipeline must
reproduce the committed goldens byte-for-byte, at multiple parallelism
levels, with and without the dedup shuffle."""

import pyarrow.compute as pc
import pytest

from ocr_model_ray.pipelines.extract_pipeline import (
    ExtractConfig, extract_pipeline, regions_table, rows_table, tables_table,
)

from conftest import canonical, dataset_to_table, load_golden


def _assert_tables_equal(actual, golden):
    assert actual.num_rows == golden.num_rows
    assert actual.schema.names == golden.schema.names
    actual = actual.cast(golden.schema)
    for name in golden.schema.names:
        assert actual[name].equals(golden[name]), f"column mismatch: {name}"


@pytest.mark.usefixtures("ray_session")
class TestGoldensT1:
    def test_plain_mode_matches_golden(self, t1_pages_dir):
        out = canonical(dataset_to_table(extract_pipeline(t1_pages_dir)))
        _assert_tables_equal(out, load_golden("t1"))

    def test_dedup_mode_matches_golden(self, t1_pages_dir):
        cfg = ExtractConfig(dedup=True)
        out = canonical(dataset_to_table(extract_pipeline(t1_pages_dir, cfg)))
        _assert_tables_equal(out, load_golden("t1"))

    def test_actor_pool_mode_matches_golden(self, t1_pages_dir):
        cfg = ExtractConfig(concurrency=2, batch_size=8)
        out = canonical(dataset_to_table(extract_pipeline(t1_pages_dir, cfg)))
        _assert_tables_equal(out, load_golden("t1"))

    def test_summary_emit_matches_full(self, t1_pages_dir):
        from ocr_model_ray.stages.extract import SUMMARY_SCHEMA
        full = canonical(dataset_to_table(extract_pipeline(t1_pages_dir)))
        summ = canonical(dataset_to_table(
            extract_pipeline(t1_pages_dir, ExtractConfig(emit="summary"))))
        assert summ.schema.names == SUMMARY_SCHEMA.names
        for name in SUMMARY_SCHEMA.names:
            assert summ[name].equals(full[name]), f"summary col {name} differs"

    def test_parallelism_invariance(self, t1_pages_dir):
        a = canonical(dataset_to_table(
            extract_pipeline(t1_pages_dir, ExtractConfig(batch_size=4))))
        b = canonical(dataset_to_table(
            extract_pipeline(t1_pages_dir, ExtractConfig(batch_size=256))))
        _assert_tables_equal(a, b)

    def test_byte_identity_of_text(self, t1_pages_dir):
        out = canonical(dataset_to_table(extract_pipeline(t1_pages_dir)))
        golden = load_golden("t1")
        for got, want in zip(out["extracted_text"].to_pylist(),
                             golden["extracted_text"].to_pylist()):
            assert got == want  # byte-identical per url (rows are url-sorted)

    def test_dup_content_urls_share_extraction(self, t1_pages_dir):
        out = canonical(dataset_to_table(extract_pipeline(
            t1_pages_dir, ExtractConfig(dedup=True))))
        mask = pc.match_substring(out["url"], "dup-content")
        dups = out.filter(mask)
        assert dups.num_rows > 0
        hashes = dups["content_hash"].to_pylist()
        texts = dups["extracted_text"].to_pylist()
        by_hash = {}
        for h, t in zip(hashes, texts):
            by_hash.setdefault(h, set()).add(t)
        assert all(len(v) == 1 for v in by_hash.values())
        # and each dup's text equals the originating article's text
        full = dict(zip(out["content_hash"].to_pylist(),
                        out["extracted_text"].to_pylist()))
        for h, t in zip(hashes, texts):
            assert full[h] == t


@pytest.mark.usefixtures("ray_session")
class TestGoldensT2:
    def test_plain_mode_matches_golden_t2(self, t2_pages_dir):
        out = canonical(dataset_to_table(extract_pipeline(t2_pages_dir)))
        _assert_tables_equal(out, load_golden("t2"))

    def test_dedup_mode_matches_golden_t2(self, t2_pages_dir):
        out = canonical(dataset_to_table(
            extract_pipeline(t2_pages_dir, ExtractConfig(dedup=True))))
        _assert_tables_equal(out, load_golden("t2"))


@pytest.mark.usefixtures("ray_session")
class TestSkew:
    def test_giant_blobs_stream_under_tiny_block_budget(self, t1_pages_dir):
        """Skew guard: with a 4 MiB target block size the 50-200x giant
        payloads must still stream through (dynamic block splitting
        isolates them) and their extraction stays byte-identical."""
        from ray.data import DataContext
        ctx = DataContext.get_current()
        old = ctx.target_max_block_size
        try:
            ctx.target_max_block_size = 4 * 1024 * 1024
            out = canonical(dataset_to_table(extract_pipeline(t1_pages_dir)))
        finally:
            ctx.target_max_block_size = old
        golden = load_golden("t1")
        got = dict(zip(out["url"].to_pylist(),
                       out["extracted_text"].to_pylist()))
        want = dict(zip(golden["url"].to_pylist(),
                        golden["extracted_text"].to_pylist()))
        giants = [u for u in want if "giant-blob" in u]
        assert giants
        for u in giants:
            assert got[u] == want[u]
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestExplodes:
    def test_rows_regions_tables_consistent(self, t1_pages_dir):
        ex = extract_pipeline(t1_pages_dir)
        extracted = canonical(dataset_to_table(ex))
        rows = dataset_to_table(rows_table(extract_pipeline(t1_pages_dir)))
        regions = dataset_to_table(regions_table(extract_pipeline(t1_pages_dir)))
        tables = dataset_to_table(tables_table(extract_pipeline(t1_pages_dir)))
        n_rows_nested = sum(len(x) for x in extracted["rows"].to_pylist())
        n_regions_nested = sum(len(x) for x in extracted["regions"].to_pylist())
        n_tables_nested = sum(len(x) for x in extracted["tables"].to_pylist())
        assert rows.num_rows == n_rows_nested
        assert regions.num_rows == n_regions_nested
        assert tables.num_rows == n_tables_nested
        assert {"url", "row_id", "page", "region_id", "bbox", "text",
                "min_conf", "needs_review"} == set(rows.schema.names)

    def test_region_spans_index_into_text(self, t1_pages_dir):
        extracted = canonical(dataset_to_table(extract_pipeline(t1_pages_dir)))
        for text, regs in zip(extracted["extracted_text"].to_pylist(),
                              extracted["regions"].to_pylist()):
            for r in regs:
                assert text[r["char_start"]:r["char_end"]] == r["text"]
