"""Unit tests for functions/tiers.py — exact rank-cut quality tiers.

The cut rule (cut_q = min s with cum >= q*N) and the strict-> tier
assignment are pinned on hand-computed corpora; partitioning
independence pins that the streaming histogram is order-/block-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.tiers import (
    SCORE_CAP, quality_tiers, tier_stats, word_count_cuts)


def _docs_ds(words_per_doc, num_blocks=1):
    rows = [{"doc_id": i, "text": " ".join(["w"] * n) if n else ""}
            for i, n in enumerate(words_per_doc)]
    return rd.from_pandas(pd.DataFrame(rows)).repartition(num_blocks)


def test_cuts_hand_computed(ray_session):
    # scores 1..8, N=8: cum(s)=s; cuts at q*N = 2, 4, 6
    ds = _docs_ds(range(1, 9))
    assert word_count_cuts(ds) == [2, 4, 6]


def test_tiers_and_tie_at_cut(ray_session):
    # ties AT a cut stay in the lower tier (strict > in the label)
    ds = _docs_ds([1, 2, 3, 4, 5, 6, 7, 8])
    out = quality_tiers(ds).to_pandas().sort_values("doc_id")
    assert list(out["n_words"]) == [1, 2, 3, 4, 5, 6, 7, 8]
    assert list(out["tier"]) == [1, 1, 2, 2, 3, 3, 4, 4]
    assert out["tier"].dtype == np.int32


def test_clamp_top_tier(ray_session):
    # a doc far above the cap clamps into the top bin; cuts and tier
    # assignment clamp identically so it lands in the top tier
    ds = _docs_ds([1, 2, 3, SCORE_CAP + 500])
    out = quality_tiers(ds).to_pandas().sort_values("doc_id")
    assert out["n_words"].iloc[-1] == SCORE_CAP + 500  # unclamped col
    assert out["tier"].iloc[-1] == 4


def test_skewed_distribution(ray_session):
    # 90% empty docs: all three cuts sit at 0, so tier 1 holds the
    # mass and every non-empty doc is top tier
    ds = _docs_ds([0] * 90 + [5] * 10)
    assert word_count_cuts(ds) == [0, 0, 0]
    out = quality_tiers(ds).to_pandas()
    assert (out.loc[out["n_words"] == 0, "tier"] == 1).all()
    assert (out.loc[out["n_words"] == 5, "tier"] == 4).all()


def test_partitioning_independence(ray_session):
    words = list(np.random.default_rng(7).integers(0, 400, size=200))
    a = quality_tiers(_docs_ds(words, 1)).to_pandas()
    b = quality_tiers(_docs_ds(words, 8)).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_tier_stats_matches_pandas(ray_session):
    words = [1, 2, 3, 4, 5, 6, 7, 8, 8, 8]
    labeled = quality_tiers(_docs_ds(words, 4))
    got = tier_stats(labeled).sort_values("tier").reset_index(drop=True)
    ref = labeled.to_pandas().groupby("tier", as_index=False).agg(
        n_docs=("doc_id", "size"), total_words=("n_words", "sum"))
    ref["mean_words"] = ref["total_words"] / ref["n_docs"]
    assert list(got["tier"]) == list(ref["tier"])
    assert list(got["n_docs"]) == list(ref["n_docs"])
    assert list(got["total_words"]) == list(ref["total_words"])
    np.testing.assert_array_equal(got["mean_words"], ref["mean_words"])


def test_empty_corpus(ray_session):
    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                         "text": pd.array([], dtype="string")}))
    assert word_count_cuts(empty) == [0, 0, 0]
    out = quality_tiers(empty).to_pandas()
    assert len(out) == 0
    st = tier_stats(quality_tiers(empty))
    assert len(st) == 0
    assert list(st.columns) == ["tier", "n_docs", "total_words",
                                "mean_words"]


def test_null_text_counts_zero(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "text": [None, "a b c"]})
    out = (quality_tiers(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id"))
    assert list(out["n_words"]) == [0, 3]


def test_percent_rank_ties_share_rank(ray_session):
    from ocr_model_ray.functions.tiers import length_percent_rank
    # scores [2, 2, 5, 9]: peer-first ranks 0,0,2,3 over N-1=3
    out = (length_percent_rank(_docs_ds([2, 2, 5, 9], 2)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    np.testing.assert_array_equal(out["pr"],
                                  [0.0, 0.0, 2 / 3, 3 / 3])


def test_percent_rank_single_and_empty(ray_session):
    from ocr_model_ray.functions.tiers import length_percent_rank
    one = length_percent_rank(_docs_ds([7])).to_pandas()
    assert one["pr"].tolist() == [0.0]
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([], dtype="int64"),
        "text": pd.array([], dtype="string")}))
    assert len(length_percent_rank(empty).to_pandas()) == 0


def test_percent_rank_partitioning_independence(ray_session):
    from ocr_model_ray.functions.tiers import length_percent_rank
    words = list(np.random.default_rng(3).integers(0, 50, size=120))
    a = (length_percent_rank(_docs_ds(words, 1)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (length_percent_rank(_docs_ds(words, 8)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
