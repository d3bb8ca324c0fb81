"""Unit tests for url_ops.crawl_budget_allocation — largest-remainder
apportionment of a global crawl budget across hosts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ocr_model_ray.functions.url_ops import (_alloc_frame,
                                             crawl_budget_allocation)


def _scores(n: int = 500) -> pd.DataFrame:
    rng = np.random.RandomState(3)
    return pd.DataFrame({
        "host": [f"h{i}.example.org" for i in range(n)],
        "score": rng.randint(0, 1000, size=n).astype(np.int64)})


def _run(df: pd.DataFrame, budget: int, mode: str,
         blocks: int = 7) -> pd.DataFrame:
    out = crawl_budget_allocation(
        rd.from_pandas(df).repartition(blocks), budget,
        mode=mode).to_pandas()
    if out.empty:
        return pd.DataFrame({"host": pd.Series([], dtype="object"),
                             "alloc": pd.Series([], dtype="int64")})
    return (out.sort_values("host").reset_index(drop=True)
            .astype({"alloc": "int64"}))


def test_alloc_matches_frame_replay(ray_session):
    df = _scores()
    for budget in (0, 1, 97, 10_000, 1_000_003):
        want = _alloc_frame(df, budget, "host", "score")
        for mode in ("local", "distributed"):
            got = _run(df, budget, mode)
            assert got["host"].tolist() == want["host"].tolist(), \
                (mode, budget)
            assert got["alloc"].tolist() == want["alloc"].tolist(), \
                (mode, budget)


def test_alloc_sums_to_budget(ray_session):
    df = _scores()
    for budget in (1, 97, 10_000):
        got = _run(df, budget, "distributed")
        assert int(got["alloc"].sum()) == budget, budget
        # proportionality: allocation within 1 of the exact share
        s = df.set_index("host")["score"]
        total = int(s.sum())
        share = got["host"].map(s) * budget / total
        assert (np.abs(got["alloc"] - share) < 1.0 + 1e-9).all()


def test_alloc_tie_break_by_host(ray_session):
    # equal scores force equal remainders: the +1s go to the
    # lexicographically smallest hosts
    df = pd.DataFrame({"host": ["d", "c", "b", "a"],
                       "score": [1, 1, 1, 1]})
    got = _run(df, 6, "distributed", blocks=2)
    want = _alloc_frame(df, 6, "host", "score")
    assert got["alloc"].tolist() == want["alloc"].tolist()
    assert dict(zip(got["host"], got["alloc"])) == \
        {"a": 2, "b": 2, "c": 1, "d": 1}


def test_alloc_zero_scores_and_empty(ray_session):
    zero = pd.DataFrame({"host": ["a", "b"], "score": [0, 0]})
    for mode in ("local", "distributed"):
        got = _run(zero, 10, mode, blocks=1)
        assert got["alloc"].tolist() == [0, 0], mode
    empty = pd.DataFrame({"host": pd.Series([], dtype="object"),
                          "score": pd.Series([], dtype="int64")})
    for mode in ("local", "distributed"):
        assert len(_run(empty, 10, mode, blocks=1)) == 0, mode


def test_alloc_partitioning_invariance(ray_session):
    df = _scores(300)
    base = None
    for blocks in (1, 3, 11):
        got = _run(df, 1234, "distributed", blocks=blocks)
        if base is None:
            base = got["alloc"].tolist()
        assert got["alloc"].tolist() == base, blocks
