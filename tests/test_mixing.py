"""Unit tests for functions/mixing.py — domain-mixture weights and the
deterministic rebalance downsample."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.mixing import mix_rebalance, source_mix_weights


def _corpus(num_blocks=1):
    # source a: 3 docs x 4 tokens = 12; source b: 1 doc x 4 tokens = 4
    rows = [
        {"doc_id": 0, "source": "a", "text": "w x y z"},
        {"doc_id": 1, "source": "a", "text": "p q r s"},
        {"doc_id": 2, "source": "a", "text": "h i j k"},
        {"doc_id": 3, "source": "b", "text": "m n o t"},
    ]
    return rd.from_pandas(pd.DataFrame(rows)).repartition(num_blocks)


def test_uniform_weights(ray_session):
    w = source_mix_weights(_corpus())
    assert list(w["source"]) == ["a", "b"]
    assert list(w["n_docs"]) == [3, 1]
    assert list(w["n_tokens"]) == [12, 4]
    np.testing.assert_allclose(w["token_share"], [0.75, 0.25])
    # uniform target 0.5 each: a is over-represented (weight < 1),
    # b under-represented (weight > 1)
    np.testing.assert_allclose(w["weight"], [0.5 / 0.75, 0.5 / 0.25])


def test_explicit_target(ray_session):
    w = source_mix_weights(_corpus(), target={"a": 1.0})
    np.testing.assert_allclose(w["weight"], [1.0 / 0.75, 0.0])


def test_zero_token_source(ray_session):
    ds = rd.from_pandas(pd.DataFrame([
        {"doc_id": 0, "source": "a", "text": "w x"},
        {"doc_id": 1, "source": "z", "text": ""},
    ]))
    w = source_mix_weights(ds)
    assert w.loc[w["source"] == "z", "weight"].iloc[0] == 0.0


def test_rebalance_matches_hash_rule(ray_session):
    ds = _corpus(2)
    w = source_mix_weights(ds)
    kept = mix_rebalance(ds, w).to_pandas().sort_values("doc_id")
    # recompute the keep rule by hand
    thr = {s: int(np.floor(min(float(x), 1.0) * 4294967296.0))
           for s, x in zip(w["source"], w["weight"])}
    df = _corpus().to_pandas()
    exp = [r["doc_id"] for _, r in df.iterrows()
           if int(hashlib.md5(r["text"].encode()).hexdigest()[:8], 16)
           < thr[r["source"]]]
    assert kept["doc_id"].tolist() == sorted(exp)
    # weight > 1 means keep-all for that source
    assert thr["b"] == 4294967296
    assert 3 in kept["doc_id"].tolist()


def test_rebalance_null_text_never_keeps(ray_session):
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "source": ["a", "a"],
         "text": pd.array([None, "w x y"], dtype="string")}))
    w = source_mix_weights(ds)
    kept = mix_rebalance(ds, w).to_pandas()
    assert 0 not in kept["doc_id"].tolist()


def test_partitioning_independence(ray_session):
    a = source_mix_weights(_corpus(1))
    b = source_mix_weights(_corpus(4))
    pd.testing.assert_frame_equal(a, b)


def test_empty_corpus(ray_session):
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([], dtype="int64"),
        "source": pd.array([], dtype="string"),
        "text": pd.array([], dtype="string")}))
    w = source_mix_weights(empty)
    assert len(w) == 0
    assert list(w.columns) == ["source", "n_docs", "n_tokens",
                               "token_share", "weight"]


def test_oversample_repeats_and_fraction(ray_session):
    # force weights: source a weight 2.5 -> 2 or 3 copies per doc;
    # source b weight 0.0 -> zero copies
    ds = _corpus(2)
    w = pd.DataFrame({"source": ["a", "b"], "weight": [2.5, 0.0]})
    out = (mix_rebalance(ds, w, oversample=True).to_pandas()
           .sort_values(["doc_id", "copy"]).reset_index(drop=True))
    assert set(out["source"]) == {"a"}
    per_doc = out.groupby("doc_id")["copy"].agg(["size", "max"])
    assert per_doc["size"].isin([2, 3]).all()
    # copy indices are 0..n-1 per doc
    assert (per_doc["max"] == per_doc["size"] - 1).all()
    # deterministic: same output on re-run
    again = (mix_rebalance(_corpus(4), w, oversample=True).to_pandas()
             .sort_values(["doc_id", "copy"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, again)


def test_oversample_integer_weight_exact(ray_session):
    ds = _corpus()
    w = pd.DataFrame({"source": ["a", "b"], "weight": [2.0, 1.0]})
    out = mix_rebalance(ds, w, oversample=True).to_pandas()
    n = out.groupby("doc_id").size()
    assert (n.loc[[0, 1, 2]] == 2).all()   # source a docs
    assert n.loc[3] == 1                   # source b doc
