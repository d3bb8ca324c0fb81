"""Units for int8 scalar quantization (functions/quantize.py)."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emb(n: int = 50, d: int = 8, seed: int = 4) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs[7] = 0.0  # all-zero vector
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in vecs]})


def test_codes_in_range_and_dequant_bound(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.quantize import quantize_codes
    df = _emb()
    out = quantize_codes(rd.from_pandas(df)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    for r, orig in zip(out.itertuples(), df["embedding"]):
        q = np.asarray(list(r.q), dtype=np.int64)
        assert q.min() >= -127 and q.max() <= 127
        # dequantization error bounded by one quantization step
        err = np.abs(np.asarray(orig, np.float64) - q * r.scale)
        assert (err <= r.scale + 1e-12).all()
    # all-zero vector: zero codes, zero scale
    z = out[out["vec_id"] == 7].iloc[0]
    assert z.scale == 0.0 and all(v == 0 for v in z.q)


def test_stats_match_codes(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.quantize import (quantize_codes,
                                                  scalar_quantize_stats)
    df = _emb(seed=9)
    stats = scalar_quantize_stats(rd.from_pandas(df)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    codes = quantize_codes(rd.from_pandas(df)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    for s, c in zip(stats.itertuples(), codes.itertuples()):
        q = np.asarray(list(c.q), dtype=np.int64)
        assert s.code_sum == q.sum() and s.code_min == q.min() \
            and s.code_max == q.max() and s.n_dims == len(q)
        assert s.scale == c.scale


def test_max_component_hits_127(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.quantize import quantize_codes
    df = pd.DataFrame({
        "vec_id": np.array([1], dtype=np.int64),
        "embedding": [np.array([0.5, -2.0, 1.0], dtype=np.float32)]})
    out = quantize_codes(rd.from_pandas(df)).to_pandas()
    q = list(out["q"].iloc[0])
    # the max-|x| component quantizes to exactly +-127
    assert q[1] == -127
    assert q == [31, -127, 63]  # trunc semantics, not round


def test_knn_int8_recall_vs_bruteforce(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.quantize import knn_int8
    from ocr_model_ray.functions.similarity import knn_bruteforce
    df = _emb(n=400, d=16, seed=3)
    ds = rd.from_pandas(df)
    q = df[df["vec_id"] < 8]
    exact = knn_bruteforce(ds, q, k=5)
    quant = knn_int8(ds, q, k=5)
    # int8 quantization preserves most of the neighborhood structure
    # (it quantizes magnitude, not direction-normalized values, so
    # compare per-query overlap loosely)
    hits = 0
    for qid in q["vec_id"]:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        g = set(quant[quant["query_id"] == qid]["neighbor_id"])
        hits += len(e & g)
    assert hits >= 8 * 5 * 0.4


def test_knn_int8_partitioning_independent(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.quantize import knn_int8
    df = _emb(n=200, d=8, seed=6)
    q = df[df["vec_id"] < 5]
    outs = [knn_int8(rd.from_pandas(df).repartition(nb), q, k=5)
            for nb in (1, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
