"""Unit tests for pipelines/curation.py — the composed curation
funnel. The synthetic sf corpora exercise only the lang/quality
stages (no duplicate or contaminated survivors), so these tests plant
duplicates and an eval-set leak to pin the dedup and decontamination
stages, plus local==distributed and partitioning independence.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ocr_model_ray.functions.decontam import ngram_set
from ocr_model_ray.pipelines.curation import (
    STAGES, curation_funnel, curation_groups, curation_kept)

STOP = "the and of to in a is for"  # 8 distinct probe stopwords
EVAL_TEXT = " ".join(f"leak{i:02d}" for i in range(8))  # one 8-gram


def _good(tag: str, nfill: int = 60) -> str:
    """Passes all five Gopher rules: 68 words, mean len ~6.4, all
    alphanumeric-with-letters, no symbols, 8 stopwords."""
    return STOP + " " + " ".join(f"{tag}{i:02d}" for i in range(nfill))


def _corpus() -> pd.DataFrame:
    texts = {
        0: (_good("alpha"), "en"),        # kept
        1: (_good("bravo"), "en"),        # kept (dup representative)
        2: (_good("bravo"), "en"),        # exact duplicate of 1
        3: (_good("china"), "zh"),        # cut at lang
        4: ("too short", "en"),           # cut at quality
        5: (_good("culpa") + " " + EVAL_TEXT, "en"),  # contaminated
    }
    return pd.DataFrame({
        "doc_id": list(texts),
        "text": [texts[i][0] for i in texts],
        "lang": [texts[i][1] for i in texts],
    })


def _expected_funnel(df: pd.DataFrame) -> pd.DataFrame:
    n = {i: len(t) for i, t in zip(df["doc_id"], df["text"])}
    docs = [6, 5, 4, 3, 2]
    chars = [sum(n.values()),
             sum(v for k, v in n.items() if k != 3),
             sum(n[k] for k in (0, 1, 2, 5)),
             n[0] + n[1] + n[5],
             n[0] + n[1]]
    return pd.DataFrame({"stage": list(STAGES),
                         "docs": pd.array(docs, dtype="int64"),
                         "chars": pd.array(chars, dtype="int64")})


def _grams() -> set:
    return ngram_set([EVAL_TEXT], n=8)


def test_funnel_hand_computed_local(ray_session):
    df = _corpus()
    got = curation_funnel(rd.from_pandas(df), _grams(), mode="local")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), _expected_funnel(df))


def test_funnel_distributed_equals_local(ray_session):
    df = _corpus()
    loc = curation_funnel(rd.from_pandas(df), _grams(), mode="local")
    dist = curation_funnel(rd.from_pandas(df).repartition(4), _grams(),
                           mode="distributed")
    pd.testing.assert_frame_equal(loc.reset_index(drop=True),
                                  dist.reset_index(drop=True))


def test_kept_ids(ray_session):
    df = _corpus()
    for mode in ("local", "distributed"):
        kept = (curation_kept(rd.from_pandas(df), _grams(), mode=mode)
                .to_pandas().sort_values("doc_id"))
        assert list(kept["doc_id"]) == [0, 1]
        assert list(kept["chars"]) == [len(df["text"][0]),
                                       len(df["text"][1])]


def test_groups_carry_contamination(ray_session):
    df = _corpus()
    groups, _ = curation_groups(rd.from_pandas(df), _grams(),
                                mode="local")
    g = groups.to_pandas().sort_values("keep_id")
    assert list(g["keep_id"]) == [0, 1, 5]
    assert list(g["contaminated"]) == [False, False, True]


def test_empty_corpus(ray_session):
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object"),
        "lang": pd.Series([], dtype="object")}))
    for mode in ("local", "distributed"):
        f = curation_funnel(empty, _grams(), mode=mode)
        assert list(f["stage"]) == list(STAGES)
        assert f["docs"].sum() == 0 and f["chars"].sum() == 0


def test_no_survivors_distributed(ray_session):
    # every doc fails quality: the survivor exchange sees only empty
    # blocks; counters must still flow and the tail stages read zero
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["tiny", "also tiny"],
                       "lang": ["en", "en"]})
    for mode in ("local", "distributed"):
        f = curation_funnel(rd.from_pandas(df), _grams(), mode=mode)
        assert list(f["docs"]) == [2, 2, 0, 0, 0]
        assert list(f["chars"]) == [13, 13, 0, 0, 0]
        kept = curation_kept(rd.from_pandas(df), _grams(), mode=mode)
        assert kept.count() == 0


def test_partitioning_independence(ray_session):
    df = _corpus()
    one = curation_funnel(rd.from_pandas(df).repartition(1), _grams(),
                          mode="distributed")
    many = curation_funnel(rd.from_pandas(df).repartition(6), _grams(),
                           mode="distributed")
    pd.testing.assert_frame_equal(one.reset_index(drop=True),
                                  many.reset_index(drop=True))
