"""Duplicate-span removal (functions/span_dedup.py): rolling-hash
correctness, coverage semantics on crafted fixtures, plan equivalence,
and edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.span_dedup import (
    _gram_hashes, dup_gram_counts, span_dedup)

SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _corpus():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"one unique prefix here {SHARED} and a unique tail one",
            f"two different opening {SHARED} closing words two two",
            "totally unrelated content with no duplicate grams here",
            "",
        ],
    })


def test_rolling_hash_position_independence():
    # the same 10-token sequence must hash identically wherever it
    # sits in the flat token stream (the Minv^i normalization)
    toks = np.array(SHARED.split(), dtype=object)
    a = np.concatenate([np.array(["x", "y"], dtype=object), toks])
    b = np.concatenate([toks, np.array(["p", "q", "r"], dtype=object)])
    ga, _, _, _ = _gram_hashes(a, np.zeros(a.size, np.int64), 10)
    gb, _, _, _ = _gram_hashes(b, np.zeros(b.size, np.int64), 10)
    assert ga[2] == gb[0]
    # different sequences hash differently
    assert ga[0] != gb[0]


def test_grams_never_cross_documents():
    toks = np.array(SHARED.split() * 2, dtype=object)
    par = np.repeat([0, 1], 10).astype(np.int64)
    g, gpar, gpos, starts = _gram_hashes(toks, par, 10)
    # 10 tokens per doc, n=10 -> exactly one gram per doc, none spanning
    assert g.size == 2 and g[0] == g[1]
    assert gpos.tolist() == [0, 0] and starts.tolist() == [0, 10]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_semantics(mode):
    out = (span_dedup(rd.from_pandas(_corpus()), n=10, min_docs=2,
                      mode=mode)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["text"].tolist() == [
        "one unique prefix here and a unique tail one",
        "two different opening closing words two two",
        "totally unrelated content with no duplicate grams here",
        "",
    ]
    assert out["n_tokens"].tolist() == [19, 17, 8, 0]
    assert out["n_removed"].tolist() == [10, 10, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_overlapping_spans_union_coverage():
    # 11 shared tokens -> two overlapping dup 10-grams; coverage is
    # their union (11 tokens), not 20
    shared11 = SHARED + " lambda"
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [f"first {shared11} ending", f"second {shared11} closer"],
    })
    out = (span_dedup(rd.from_pandas(docs), n=10, min_docs=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_removed"].tolist() == [11, 11]
    assert out["text"].tolist() == ["first ending", "second closer"]


@pytest.mark.usefixtures("ray_session")
def test_within_doc_repeat_not_removed():
    # the gram repeats INSIDE one doc only -> 1 distinct doc -> kept
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [f"{SHARED} {SHARED}", "completely different words"],
    })
    out = (span_dedup(rd.from_pandas(docs), n=10, min_docs=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_removed"].tolist() == [0, 0]


@pytest.mark.usefixtures("ray_session")
def test_short_docs_have_no_grams():
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["nine tokens only here not quite enough grams",
                 "nine tokens only here not quite enough grams"],
    })
    out = (span_dedup(rd.from_pandas(docs), n=10, min_docs=2)
           .to_pandas())
    assert out["n_removed"].sum() == 0
    assert (out["n_tokens"] == 8).all()


@pytest.mark.usefixtures("ray_session")
def test_plans_pinned_equal_on_real_corpus():
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    a = (span_dedup(docs, n=10, min_docs=2, mode="broadcast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (span_dedup(docs, n=10, min_docs=2, mode="distributed")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a["n_removed"].sum() > 0          # non-degenerate
    for col in ["doc_id", "text", "n_tokens", "n_removed"]:
        assert (a[col].values == b[col].values).all(), col


@pytest.mark.usefixtures("ray_session")
def test_auto_mode_picks_distributed_above_cut(monkeypatch):
    import ocr_model_ray.functions.span_dedup as m
    monkeypatch.setattr(m, "BROADCAST_MAX_HASHES", 0)
    out = (span_dedup(rd.from_pandas(_corpus()), n=10, min_docs=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_removed"].tolist() == [10, 10, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_dup_gram_counts_distinct_doc_semantics():
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [f"{SHARED} {SHARED}", SHARED],
    })
    counts = dup_gram_counts(rd.from_pandas(docs), n=10).to_pandas()
    # doc1 contributes the shared gram ONCE (distinct-per-doc), so the
    # shared gram's count is 2; every cross-boundary gram in doc1 is
    # unique to it
    assert counts["n_docs"].max() == 2
    assert (counts["n_docs"] == 2).sum() == 1
