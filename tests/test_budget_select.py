"""Unit tests for tiers.token_budget_select — token-budget corpus
selection with a windowed-prefix cut inside the marginal tier."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from ocr_model_ray.functions.tiers import quality_tiers, token_budget_select


def _docs(n: int = 400) -> pd.DataFrame:
    rng = np.random.RandomState(7)
    words = rng.randint(0, 60, size=n)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["w"] * int(k)) for k in words]})


def _window_replay(docs: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Independent pandas replay of the SQL window semantics."""
    lab = quality_tiers(rd.from_pandas(docs), mode="local").to_pandas()
    h = lab["doc_id"].map(
        lambda v: hashlib.md5(str(int(v)).encode()).hexdigest())
    o = lab.assign(h=h).sort_values(
        ["tier", "h", "doc_id"], ascending=[False, True, True],
        kind="mergesort")
    keep = np.cumsum(o["n_words"].to_numpy().astype(np.int64)) <= budget
    return (o[keep][["doc_id", "n_words", "tier"]]
            .sort_values("doc_id").reset_index(drop=True)
            .astype({"n_words": "int64", "tier": "int32"}))


def _run(docs: pd.DataFrame, budget: int, mode: str,
         blocks: int = 5) -> pd.DataFrame:
    out = token_budget_select(rd.from_pandas(docs).repartition(blocks),
                              budget, mode=mode).to_pandas()
    if out.empty:
        # Ray's to_pandas on an all-empty collect drops the schema —
        # the query wrappers re-type; mirror that here
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_words": pd.Series([], dtype="int64"),
                             "tier": pd.Series([], dtype="int32")})
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"n_words": "int64", "tier": "int32"}))


def test_budget_matches_window_replay(ray_session):
    docs = _docs()
    total = sum(len(t.split()) for t in docs["text"])
    for budget in (0, 37, total // 4, total // 2, total, total + 10):
        want = _window_replay(docs, budget)
        for mode in ("local", "distributed"):
            got = _run(docs, budget, mode)
            assert got["doc_id"].tolist() == want["doc_id"].tolist(), \
                (mode, budget)
            assert got["n_words"].tolist() == want["n_words"].tolist()
            assert got["tier"].tolist() == want["tier"].tolist()


def test_budget_prefers_best_tier(ray_session):
    docs = _docs()
    lab = quality_tiers(rd.from_pandas(docs), mode="local").to_pandas()
    top = lab[lab["tier"] == lab["tier"].max()]
    # a budget covering the top tier plus a sliver: the whole top tier
    # must be kept (consumed first), lower tiers only partially
    budget = int(top["n_words"].sum()) + 25
    kept = _run(docs, budget, "distributed")
    assert set(top["doc_id"]) <= set(kept["doc_id"])
    assert kept["n_words"].sum() <= budget
    assert len(kept) < len(docs)


def test_budget_partitioning_invariance(ray_session):
    docs = _docs(300)
    base = None
    for blocks in (1, 3, 11):
        got = _run(docs, 2000, "distributed", blocks=blocks)
        ids = got["doc_id"].tolist()
        if base is None:
            base = ids
        assert ids == base, blocks


def test_budget_empty_and_full(ray_session):
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    for mode in ("local", "distributed"):
        out = token_budget_select(rd.from_pandas(empty), 100, mode=mode)
        assert out.count() == 0
        assert set(out.schema().names) >= {"doc_id", "n_words", "tier"}
    docs = _docs(50)
    total = sum(len(t.split()) for t in docs["text"])
    for mode in ("local", "distributed"):
        assert len(_run(docs, total, mode)) == 50
