"""Unit tests for link_graph.crawl_depth — level-synchronous BFS
seed-distance assignment with a depth cap."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ocr_model_ray.functions.link_graph import crawl_depth


def _edges():
    e = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
         ("s2", "c"),                       # shortcut: c at depth 1
         ("x", "y"),                        # unreachable island
         ("e", "a")]                        # back edge (cycle) — no-op
    return rd.from_pandas(pd.DataFrame(e, columns=["src_host",
                                                   "dst_host"]))


def _res(seeds, mode, max_depth=8):
    out = crawl_depth(_edges().repartition(3), seeds,
                      max_depth=max_depth, mode=mode).to_pandas()
    return dict(zip(out["host"], out["depth"].astype(int)))


def test_bfs_min_and_unreachable(ray_session):
    for mode in ("local", "distributed"):
        res = _res(["a", "s2"], mode)
        # c is 2 hops from a but 1 from s2 — BFS takes the min
        assert res == {"a": 0, "s2": 0, "b": 1, "c": 1, "d": 2,
                       "e": 3}, (mode, res)


def test_depth_cap(ray_session):
    for mode in ("local", "distributed"):
        res = _res(["a"], mode, max_depth=2)
        assert res == {"a": 0, "b": 1, "c": 2}, (mode, res)


def test_seed_absent_from_graph(ray_session):
    for mode in ("local", "distributed"):
        res = _res(["nope"], mode)
        assert res == {"nope": 0}, (mode, res)


def test_seeds_as_dataset(ray_session):
    seeds = rd.from_pandas(pd.DataFrame({"host": ["s2"]}))
    out = crawl_depth(_edges(), seeds, max_depth=8,
                      mode="distributed").to_pandas()
    res = dict(zip(out["host"], out["depth"].astype(int)))
    # the e -> a back edge makes a (4) and b (5) reachable from s2
    assert res == {"s2": 0, "c": 1, "d": 2, "e": 3, "a": 4, "b": 5}


def test_empty_seeds_and_empty_edges(ray_session):
    out = crawl_depth(_edges(), [], mode="local")
    assert out.count() == 0
    assert "depth" in out.schema().names
    empty = rd.from_pandas(pd.DataFrame(
        {"src_host": pd.Series([], dtype="object"),
         "dst_host": pd.Series([], dtype="object")}))
    for mode in ("local", "distributed"):
        out = crawl_depth(empty, ["s"], mode=mode).to_pandas()
        assert dict(zip(out["host"], out["depth"].astype(int))) == \
            {"s": 0}, mode


def test_regime_switch_mid_run(ray_session, monkeypatch):
    """Force the broadcast->exchange regime switch after the first BFS
    level by shrinking the cap: results must equal the local plan's."""
    import ocr_model_ray.functions.link_graph as lg
    monkeypatch.setattr(lg, "FRONTIER_BROADCAST_ROWS", 3)
    want = _res(["a", "s2"], "local")
    got = _res(["a", "s2"], "distributed")
    assert got == want
    # and with a cap of 0 every round runs exchange-style
    monkeypatch.setattr(lg, "FRONTIER_BROADCAST_ROWS", 0)
    assert _res(["a", "s2"], "distributed") == want


def test_partitioning_invariance(ray_session):
    base = None
    for blocks in (1, 2, 7):
        out = crawl_depth(_edges().repartition(blocks), ["a", "s2"],
                          mode="distributed").to_pandas()
        res = sorted(zip(out["host"], out["depth"].astype(int)))
        if base is None:
            base = res
        assert res == base, blocks
