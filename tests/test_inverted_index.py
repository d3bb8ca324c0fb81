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


def test_bm25_topk_hand_case():
    """BM25 against a hand-computed 3-doc case (Lucene idf, k1=1.2,
    b=0.75) plus empty-corpus and no-hit behavior."""
    import math

    import pandas as pd
    import ray.data as rd

    from ocr_model_ray.functions.inverted_index import bm25_topk

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat cat dog", "dog mouse", "bird"]})
    out = bm25_topk(rd.from_pandas(docs), ["cat", "dog"], k=3)
    # N=3, avgdl=(3+2+1)/3=2; df(cat)=1, df(dog)=2
    idf_cat = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    idf_dog = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)

    def contrib(idf, tf, dl):
        return idf * tf * (1.2 + 1.0) / (
            tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.0))

    want = {1: contrib(idf_cat, 2, 3) + contrib(idf_dog, 1, 3),
            2: contrib(idf_dog, 1, 2)}
    got = dict(zip(out["doc_id"], out["score"]))
    assert set(got) == {1, 2}  # doc 3 has no query term
    for d, s in want.items():
        assert got[d] == s, (d, got[d], s)
    assert out["doc_id"].tolist() == sorted(
        want, key=lambda d: (-want[d], d))

    # no hits / empty corpus -> typed empty
    none = bm25_topk(rd.from_pandas(docs), ["absent"], k=3)
    assert len(none) == 0
    empty = bm25_topk(
        rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                     "text": pd.Series([], dtype="object")})),
        ["cat"], k=3)
    assert len(empty) == 0 and list(empty.columns) == ["doc_id", "score"]


def test_bm25_null_text_excluded():
    import pandas as pd
    import ray.data as rd

    from ocr_model_ray.functions.inverted_index import bm25_stats

    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["cat dog", None, "cat"]})
    n, total_len, dfs = bm25_stats(rd.from_pandas(docs), ["cat"])
    assert n == 2 and total_len == 3 and list(dfs) == [2]
