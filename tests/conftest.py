"""Shared fixtures: ONE Ray session per pytest session, fixture corpora
written once to a tmp dir."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="session")
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_pages_dir(tmp_path_factory):
    from ocr_model_ray.fixtures import write_pages_parquet
    path = str(tmp_path_factory.mktemp("pages") / "t1")
    write_pages_parquet(path, seed=0, tier="t1", rows_per_file=16)
    return path


@pytest.fixture(scope="session")
def t2_pages_dir(tmp_path_factory):
    from ocr_model_ray.fixtures import write_pages_parquet
    path = str(tmp_path_factory.mktemp("pages") / "t2")
    write_pages_parquet(path, seed=0, tier="t2", rows_per_file=500)
    return path


def canonical(table: pa.Table) -> pa.Table:
    """Sort by url, single chunk — the comparison form for goldens."""
    idx = pc.sort_indices(table["url"])
    return table.take(idx).combine_chunks()


def dataset_to_table(ds) -> pa.Table:
    """Materialize a (small, test-sized) Dataset to one Arrow table."""
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def load_golden(tier: str) -> pa.Table:
    import pyarrow.parquet as pq
    return pq.read_table(os.path.join(GOLDEN_DIR, tier, "extracted.parquet"))
