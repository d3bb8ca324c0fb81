"""Unit tests for functions/inverted_index.py."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.inverted_index import inverted_postings


def _ds(rows, num_blocks=1):
    return rd.from_pandas(pd.DataFrame(rows)).repartition(num_blocks)


def test_postings_df_and_dedup(ray_session):
    ds = _ds([
        {"doc_id": 0, "text": "apple apple banana"},   # apple 2x: ships once
        {"doc_id": 1, "text": "apple cherry"},
        {"doc_id": 2, "text": "banana cherry cherry"},
    ])
    out = (inverted_postings(ds, min_df=2, max_df=10).to_pandas()
           .sort_values(["token", "doc_id"]).reset_index(drop=True))
    # every token appears in exactly 2 docs -> all pass the band
    assert out["token"].tolist() == ["apple", "apple", "banana",
                                     "banana", "cherry", "cherry"]
    assert out["df"].tolist() == [2] * 6
    assert out["doc_id"].tolist() == [0, 1, 0, 2, 1, 2]


def test_band_bounds(ray_session):
    ds = _ds([
        {"doc_id": 0, "text": "solo common stop"},
        {"doc_id": 1, "text": "common stop"},
        {"doc_id": 2, "text": "stop"},
    ])
    out = inverted_postings(ds, min_df=2, max_df=2).to_pandas()
    # solo df=1 (below), stop df=3 (above) -> only 'common' survives
    assert set(out["token"]) == {"common"}
    assert len(out) == 2


def test_partitioning_independence(ray_session):
    rows = [{"doc_id": i, "text": f"tok{i % 7} tok{i % 3} shared"}
            for i in range(40)]
    a = (inverted_postings(_ds(rows, 1), min_df=2, max_df=50)
         .to_pandas().sort_values(["token", "doc_id"])
         .reset_index(drop=True))
    b = (inverted_postings(_ds(rows, 8), min_df=2, max_df=50)
         .to_pandas().sort_values(["token", "doc_id"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_empty_corpus(ray_session):
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([], dtype="int64"),
        "text": pd.array([], dtype="string")}))
    out = inverted_postings(empty).to_pandas()
    assert len(out) == 0
