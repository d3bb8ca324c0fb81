"""DSIR-style importance weighting: feature hashing, count folding,
weight semantics, partitioning independence, deterministic resample."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocr_model_ray.functions.importance import (
    NUM_BUCKETS, _bigram_buckets, importance_bucket_counts,
    importance_resample, importance_weights)


def _corpus() -> pd.DataFrame:
    rows = []
    for i in range(200):
        if i % 5 == 0:
            text = "le chat noir dort sur le tapis rouge " * 3
            lang = "fr"
        else:
            text = f"the quick brown fox jumps over dog {i % 7} " * 3
            lang = "en"
        rows.append({"doc_id": i, "text": text, "lang": lang})
    rows.append({"doc_id": 200, "text": None, "lang": "en"})
    rows.append({"doc_id": 201, "text": "single", "lang": "en"})
    rows.append({"doc_id": 202, "text": "   ", "lang": "fr"})
    return pd.DataFrame(rows)


def test_bigram_buckets_adjacency_and_range():
    arr = pa.array(["a b c", "", None, "x  y"])
    dix, b = _bigram_buckets(arr)
    # doc 0 has 2 bigrams; doc 3 has 1 (double space collapses)
    assert dix.tolist() == [0, 0, 3]
    assert ((b >= 0) & (b < NUM_BUCKETS)).all()


def test_counts_partition_independent(ray_session):
    docs = _corpus()
    s1, t1 = importance_bucket_counts(rd.from_pandas(docs))
    s2, t2 = importance_bucket_counts(
        rd.from_pandas(docs).repartition(11))
    assert np.array_equal(s1, s2) and np.array_equal(t1, t2)
    # target (fr) mass is a strict subset of source mass
    assert (t1 <= s1).all()
    assert 0 < t1.sum() < s1.sum()


def test_weights_semantics(ray_session):
    docs = _corpus()
    ds = rd.from_pandas(docs)
    s, t = importance_bucket_counts(ds)
    w = importance_weights(ds, s, t).to_pandas().set_index("doc_id")
    # target-like (fr) docs score strictly above source-typical (en)
    fr = w.loc[[i for i in range(200) if i % 5 == 0], "weight"]
    en = w.loc[[i for i in range(200) if i % 5 != 0], "weight"]
    assert fr.min() > en.max()
    # featureless docs: zero counts, NULL weight
    for d in (200, 201, 202):
        assert w.loc[d, "num"] == 0 and w.loc[d, "den"] == 0
        assert pd.isna(w.loc[d, "weight"])
    # a pure-target doc's weight approaches S_tot/T_tot-normalized
    # full mass: num == its den's target share; all weights positive
    featured = w.dropna(subset=["weight"])
    assert (featured["weight"] >= 0).all()
    assert (fr > 0).all()
    assert (featured["num"] <= featured["den"]).all()


def test_weights_partition_independent_bitexact(ray_session):
    docs = _corpus()
    s, t = importance_bucket_counts(rd.from_pandas(docs))
    a = importance_weights(rd.from_pandas(docs), s, t).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = importance_weights(rd.from_pandas(docs).repartition(13), s, t) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["num"].tolist() == b["num"].tolist()
    assert a["den"].tolist() == b["den"].tolist()
    av = a["weight"].to_numpy()
    bv = b["weight"].to_numpy()
    assert np.array_equal(av.view("int64"), bv.view("int64"))


def test_resample_subset_and_determinism(ray_session):
    docs = _corpus()
    ds = rd.from_pandas(docs)
    s, t = importance_bucket_counts(ds)
    w = importance_weights(ds, s, t)
    kept1 = importance_resample(w, rate=0.5).to_pandas()
    kept2 = importance_resample(
        importance_weights(rd.from_pandas(docs).repartition(7), s, t),
        rate=0.5).to_pandas()
    assert sorted(kept1["doc_id"]) == sorted(kept2["doc_id"])
    assert 0 < len(kept1) < 200
    # rate=0 keeps nothing; a huge rate keeps every POSITIVE-weight
    # doc (zero-weight docs have acceptance threshold 0 at any rate)
    assert importance_resample(w, rate=0.0).to_pandas().empty
    all_kept = importance_resample(w, rate=1e9).to_pandas()
    assert sorted(all_kept["doc_id"]) == [i for i in range(200)
                                          if i % 5 == 0]
