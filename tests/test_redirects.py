"""Unit tests for url_ops.resolve_redirects — functional-graph
pointer doubling with a hop cap."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ocr_model_ray.functions.url_ops import resolve_redirects


def _edges():
    e = [("a", "b"), ("b", "c"), ("c", "T"),      # 3/2/1-hop chains
         ("x", "y"), ("y", "x"), ("z", "z")]      # 2-cycle, self-loop
    e += [(f"g{i}", f"g{i+1}") for i in range(40)]  # 40-long chain
    return pd.DataFrame(e, columns=["src", "dst"])


def _res(mode, max_hops=32, blocks=4):
    out = resolve_redirects(rd.from_pandas(_edges()).repartition(blocks),
                            max_hops=max_hops, mode=mode).to_pandas()
    return {r["src"]: (r["final"], int(r["hops"]))
            for _, r in out.iterrows()}, len(out)


def test_chains_cycles_and_cap_local(ray_session):
    res, n = _res("local")
    assert n == 46  # one row per distinct src
    assert res["a"] == ("T", 3)
    assert res["b"] == ("T", 2)
    assert res["c"] == ("T", 1)
    # cycles and self-loops never terminate -> NULL, hops 0
    assert res["x"] == (None, 0)
    assert res["y"] == (None, 0)
    assert res["z"] == (None, 0)
    # cap boundary: g8 reaches g40 in exactly 32 hops; g7 needs 33
    assert res["g8"] == ("g40", 32)
    assert res["g7"] == (None, 0)
    assert res["g39"] == ("g40", 1)


def test_distributed_equals_local(ray_session):
    loc, nl = _res("local")
    dist, nd = _res("distributed")
    assert nl == nd and loc == dist


def test_small_cap(ray_session):
    for mode in ("local", "distributed"):
        res, _ = _res(mode, max_hops=2)
        assert res["a"] == (None, 0)     # 3 hops > 2
        assert res["b"] == ("T", 2)
        assert res["c"] == ("T", 1)


def test_empty_edges(ray_session):
    empty = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series([], dtype="object"),
         "dst": pd.Series([], dtype="object")}))
    out = resolve_redirects(empty, mode="local")
    assert out.count() == 0
    assert "final" in out.schema().names
