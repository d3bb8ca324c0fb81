"""Link-graph operators: href scan spec, resolution rules, host
aggregation, and fixed-point PageRank (local == distributed, integer
invariants, oracle-simplification corpus pin)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.link_graph import (
    SCALE, _pagerank_frame, extract_links, host_graph, host_inlinks,
    pagerank_hosts, resolve_href, scan_links)


# ---------------------------------------------------------------------------
# href scan + resolution (the frozen spec both engine and oracle follow)
# ---------------------------------------------------------------------------
def test_scan_links_basic():
    doc = ('<a href="/a">one</a> x <A HREF="/up">caps href not matched'
           '</a> <a class="z" href="/b">t<b>w</b>o</a>')
    got = scan_links(doc)
    # case-insensitive tag, href anywhere in the tag, raw inner markup
    assert ("/a", "one") in got
    assert ("/b", "t<b>w</b>o") in got
    # HREF= (attr name capitalized) matches via (?i)
    assert ("/up", "caps href not matched") in got


def test_scan_links_unclosed_anchor_not_emitted():
    # truncated page: the open <a> has no </a> -> no match (the regex
    # and a parser that emits on endtag agree on truncated prefixes)
    assert scan_links('<p>x</p><a href="/cut">dangling tex') == []


def test_scan_links_single_quoted_href_not_matched():
    # frozen spec: double-quoted href only (shared with the RE2 twin)
    assert scan_links("<a href='/sq'>x</a>") == []


def test_resolve_href_rules():
    src = "https://h1.example.org:8080/p/doc-1?x=1"
    assert resolve_href(src, "https://other.org/z") == "https://other.org/z"
    assert resolve_href(src, "/rooted") == \
        "https://h1.example.org:8080/rooted"
    assert resolve_href(src, "//cdn.org/lib.js") == "https://cdn.org/lib.js"
    assert resolve_href(src, "relative/path") is None
    assert resolve_href(src, "mailto:x@y.z") is None
    assert resolve_href(src, "") is None
    assert resolve_href("not a url", "/x") is None


# ---------------------------------------------------------------------------
# corpus invariant pinning the extract_links oracle simplification
# ---------------------------------------------------------------------------
def test_fixture_html_rows_are_utf8_lt_prefixed(
        ray_session, t1_pages_dir, t2_pages_dir):
    """The DuckDB oracle keeps rows via first-byte == '<' (try_cast's
    escaped blob form leaves printable ASCII like '<' unescaped) and
    decodes kept rows with decode(); the engine keeps rows via
    sniff_mime == text/html and decodes via the utf-8-first fallback
    chain. Equivalence holds because every fixture payload that sniffs
    HTML starts with b'<' (no leading whitespace) and is valid UTF-8
    (decode() == decode_text()) — assert exactly that."""
    from ocr_model_ray.sources.pages import read_pages
    from ocr_model_ray.spec import sniff_mime
    n_html = 0
    for d in (t1_pages_dir, t2_pages_dir):
        rows = read_pages(d, columns=["url", "html"]).take_all()
        for r in rows:
            payload = bytes(r["html"])
            is_html = sniff_mime(payload) == "text/html"
            starts_lt = payload[:1] == b"<"
            assert is_html == starts_lt, r["url"]
            if is_html:
                n_html += 1
                # strict: raises on invalid UTF-8 (a truncated page cut
                # mid-multibyte-char would crash the oracle's decode())
                payload.decode("utf-8")
    assert n_html > 10


def test_extract_links_over_fixture_pages(ray_session, t1_pages_dir):
    from ocr_model_ray.sources.pages import read_pages
    out = extract_links(
        read_pages(t1_pages_dir, columns=["url", "html"])).to_pandas()
    assert {"url", "link_no", "href", "dst_url", "anchor"} <= set(out.columns)
    assert len(out) > 50
    # every fixture href is root-relative -> resolves onto the source
    # origin; link_no is a dense 0..k-1 per url
    assert (out["dst_url"].str.startswith("https://fixture.test/")).all()
    per_url = out.groupby("url")["link_no"]
    assert (per_url.min() == 0).all()
    assert (per_url.max() + 1 == per_url.size()).all()


# ---------------------------------------------------------------------------
# host aggregation + PageRank
# ---------------------------------------------------------------------------
def _edges_frame(n_docs: int = 500) -> pd.DataFrame:
    ids = np.arange(n_docs, dtype=np.int64)
    counts = 1 + (ids % 4)
    rep = np.repeat(ids, counts)
    ends = np.cumsum(counts)
    j = np.arange(int(ends[-1]), dtype=np.int64) \
        - np.repeat(ends - counts, counts)
    return pd.DataFrame({
        "src_host": [f"h{v}" for v in (rep % 37).tolist()],
        "dst_host": [f"h{v}" for v in ((rep * 7 + j * 11 + 3) % 37).tolist()]})


def test_host_graph_and_inlinks_match_pandas(ray_session):
    edges = _edges_frame()
    ds = rd.from_pandas(edges).repartition(7)
    g = host_graph(ds).to_pandas().sort_values(
        ["src_host", "dst_host"]).reset_index(drop=True)
    want = (edges.groupby(["src_host", "dst_host"], as_index=False)
            .agg(n_links=("src_host", "size"))
            .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(g.astype({"n_links": "int64"}), want)

    il = host_inlinks(ds).to_pandas().sort_values(
        "dst_host").reset_index(drop=True)
    want_il = (edges.groupby("dst_host", as_index=False)
               .agg(n_links=("src_host", "size"),
                    n_src_hosts=("src_host", "nunique"))
               .sort_values("dst_host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        il.astype({"n_links": "int64", "n_src_hosts": "int64"}), want_il)


def test_pagerank_local_equals_distributed(ray_session):
    edges = _edges_frame()
    local = pagerank_hosts(rd.from_pandas(edges), iters=5,
                           mode="local").to_pandas()
    dist = pagerank_hosts(rd.from_pandas(edges).repartition(9), iters=5,
                          mode="distributed").to_pandas()
    local = local.sort_values("host").reset_index(drop=True)
    dist = dist.sort_values("host").reset_index(drop=True)
    # integer fixed-point: BIT-equal across plans and partitionings
    assert local["rank_fp"].tolist() == dist["rank_fp"].tolist()
    assert local["host"].tolist() == dist["host"].tolist()
    assert np.array_equal(local["rank"].to_numpy().view("int64"),
                          dist["rank"].to_numpy().view("int64"))


def test_pagerank_integer_invariants(ray_session):
    edges = _edges_frame()
    out = _pagerank_frame(edges, iters=5, src="src_host", dst="dst_host")
    n = out["host"].nunique()
    teleport = (15 * SCALE) // (100 * n)
    # every host gets at least the teleport mass; total mass never
    # exceeds the initial SCALE (floor divisions only ever leak mass)
    assert (out["rank_fp"] >= teleport).all()
    assert out["rank_fp"].sum() <= SCALE
    # a well-linked hub outranks the teleport floor
    assert out["rank_fp"].max() > 2 * teleport


def test_pagerank_sink_host_gets_teleport_only(ray_session):
    # star graph: every spoke links to the hub; spokes have no in-links
    edges = pd.DataFrame({"src_host": [f"s{i}" for i in range(10)],
                          "dst_host": ["hub"] * 10})
    out = _pagerank_frame(edges, iters=3, src="src_host", dst="dst_host")
    n = 11
    teleport = (15 * SCALE) // (100 * n)
    spokes = out[out["host"] != "hub"]
    assert (spokes["rank_fp"] == teleport).all()
    hub = int(out.loc[out["host"] == "hub", "rank_fp"].iloc[0])
    # hub absorbs every spoke's damped contribution
    assert hub == teleport + (85 * (10 * (teleport // 1))) // 100


def test_pagerank_empty_and_single_edge(ray_session):
    empty = pagerank_hosts(rd.from_pandas(pd.DataFrame({
        "src_host": pd.Series([], dtype="object"),
        "dst_host": pd.Series([], dtype="object")})), mode="local")
    assert empty.to_pandas().empty

    one = _pagerank_frame(pd.DataFrame({"src_host": ["a"],
                                        "dst_host": ["b"]}),
                          iters=2, src="src_host", dst="dst_host")
    assert set(one["host"]) == {"a", "b"}
    assert (one["rank_fp"] > 0).all()


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------
def _component_edges_frame() -> pd.DataFrame:
    # 3 families: {a0,a1,a2} chained, {b0,b1} pair, {c0} self-loop
    return pd.DataFrame({
        "src_host": ["a1", "a2", "b0", "c0", "a1"],
        "dst_host": ["a0", "a1", "b1", "c0", "a2"]})


def test_host_components_local_union_find(ray_session):
    from ocr_model_ray.functions.link_graph import host_components
    out = host_components(rd.from_pandas(_component_edges_frame()),
                          mode="local").to_pandas()
    comp = dict(zip(out["host"], out["component"]))
    assert comp == {"a0": "a0", "a1": "a0", "a2": "a0",
                    "b0": "b0", "b1": "b0", "c0": "c0"}


def test_host_components_local_equals_distributed(ray_session):
    from ocr_model_ray.functions.link_graph import host_components
    edges = _component_edges_frame()
    local = host_components(rd.from_pandas(edges),
                            mode="local").to_pandas()
    local = local.sort_values("host").reset_index(drop=True)
    # both iteration regimes must equal the union-find exactly
    for plan in ("exchange", "broadcast"):
        dist = host_components(rd.from_pandas(edges).repartition(4),
                               mode="distributed",
                               iter_plan=plan).to_pandas()
        dist = dist.sort_values("host").reset_index(drop=True)
        assert local["host"].tolist() == dist["host"].tolist()
        assert local["component"].tolist() == dist["component"].tolist()


def test_host_components_chain_converges(ray_session):
    from ocr_model_ray.functions.link_graph import host_components
    # a 5-hop chain needs multiple propagation rounds (min label moves
    # one hop per round); kept short — each distributed round costs a
    # few fixed-cost shuffles under the 4-CPU test session
    edges = pd.DataFrame({
        "src_host": [f"n{i:02d}" for i in range(5)],
        "dst_host": [f"n{i+1:02d}" for i in range(5)]})
    for plan in ("exchange", "broadcast"):
        out = host_components(rd.from_pandas(edges),
                              mode="distributed",
                              iter_plan=plan).to_pandas()
        assert (out["component"] == "n00").all()
        assert len(out) == 6


def test_host_components_empty(ray_session):
    from ocr_model_ray.functions.link_graph import host_components
    empty = pd.DataFrame({"src_host": pd.Series([], dtype="object"),
                          "dst_host": pd.Series([], dtype="object")})
    for mode in ("local", "distributed"):
        assert host_components(rd.from_pandas(empty),
                               mode=mode).to_pandas().empty


def test_pagerank_weighted_local_equals_distributed(ray_session):
    from ocr_model_ray.functions.link_graph import pagerank_hosts
    rng = np.random.RandomState(3)
    edges = pd.DataFrame({
        "src_host": [f"h{v}" for v in rng.randint(0, 23, 400)],
        "dst_host": [f"h{v}" for v in rng.randint(0, 23, 400)],
        "w": rng.randint(1, 9, 400).astype("int64")})
    local = pagerank_hosts(rd.from_pandas(edges), iters=5,
                           weight_col="w", mode="local").to_pandas()
    dist = pagerank_hosts(rd.from_pandas(edges).repartition(7), iters=5,
                          weight_col="w",
                          mode="distributed").to_pandas()
    local = local.sort_values("host").reset_index(drop=True)
    dist = dist.sort_values("host").reset_index(drop=True)
    assert local["rank_fp"].tolist() == dist["rank_fp"].tolist()
    assert local["host"].tolist() == dist["host"].tolist()


def test_pagerank_weighted_semantics():
    from ocr_model_ray.functions.link_graph import _pagerank_frame
    # host 'a' sends 9x more weight to 'big' than to 'small'
    edges = pd.DataFrame({"src_host": ["a", "a"],
                          "dst_host": ["big", "small"],
                          "w": pd.Series([9, 1], dtype="int64")})
    out = _pagerank_frame(edges, iters=1, src="src_host",
                          dst="dst_host", weight_col="w") \
        .set_index("host")["rank_fp"]
    assert out["big"] > out["small"]
    # unit weights == unweighted rule, bit for bit
    edges1 = edges.assign(w=pd.Series([1, 1], dtype="int64"))
    w1 = _pagerank_frame(edges1, iters=3, src="src_host",
                         dst="dst_host", weight_col="w")
    uw = _pagerank_frame(edges1[["src_host", "dst_host"]], iters=3,
                         src="src_host", dst="dst_host")
    assert w1["rank_fp"].tolist() == uw["rank_fp"].tolist()


def test_pagerank_weighted_duplicate_pairs_sum():
    from ocr_model_ray.functions.link_graph import _pagerank_frame
    # the same (src, dst) pair appearing twice must behave as one
    # edge with summed weight
    twice = pd.DataFrame({"src_host": ["a", "a", "a"],
                          "dst_host": ["b", "b", "c"],
                          "w": pd.Series([2, 3, 5], dtype="int64")})
    once = pd.DataFrame({"src_host": ["a", "a"],
                         "dst_host": ["b", "c"],
                         "w": pd.Series([5, 5], dtype="int64")})
    a = _pagerank_frame(twice, 3, "src_host", "dst_host", "w")
    b = _pagerank_frame(once, 3, "src_host", "dst_host", "w")
    assert a["rank_fp"].tolist() == b["rank_fp"].tolist()


def test_trustrank_local_equals_distributed(ray_session):
    edges = _edges_frame()
    seeds = ["h1", "h5", "nope"]  # one absent seed: NS still 3
    local = pagerank_hosts(rd.from_pandas(edges), iters=5, seeds=seeds,
                           mode="local").to_pandas()
    dist = pagerank_hosts(rd.from_pandas(edges).repartition(9), iters=5,
                          seeds=seeds, mode="distributed").to_pandas()
    local = local.sort_values("host").reset_index(drop=True)
    dist = dist.sort_values("host").reset_index(drop=True)
    assert local["rank_fp"].tolist() == dist["rank_fp"].tolist()
    assert local["host"].tolist() == dist["host"].tolist()


def test_trustrank_semantics():
    from ocr_model_ray.functions.link_graph import _pagerank_frame
    # chain a -> b -> c -> d plus an off-graph island x -> y: trust
    # decays along the chain and never reaches the island
    edges = pd.DataFrame({"src_host": ["a", "b", "c", "x"],
                          "dst_host": ["b", "c", "d", "y"]})
    out = _pagerank_frame(edges, iters=5, src="src_host",
                          dst="dst_host", seeds=["a"])
    r = dict(zip(out["host"], out["rank_fp"]))
    t0 = SCALE  # single seed: full trust mass starts at a
    tele = (15 * t0) // 100
    # the seed keeps its teleport share; each hop damps by 85//100
    assert r["a"] == tele
    assert r["b"] == (85 * tele) // 100 + 0  # a's final mass -> b next
    assert r["x"] == 0 and r["y"] == 0  # island: zero trust, present
    assert r["d"] > 0  # within 5 hops of the seed
    # ranks strictly decay along the chain after the seed
    assert r["a"] > r["b"] > 0


def test_trustrank_absent_seed_mass_vanishes():
    from ocr_model_ray.functions.link_graph import _pagerank_frame
    edges = pd.DataFrame({"src_host": ["a"], "dst_host": ["b"]})
    one = _pagerank_frame(edges, iters=3, src="src_host",
                          dst="dst_host", seeds=["a"])
    two = _pagerank_frame(edges, iters=3, src="src_host",
                          dst="dst_host", seeds=["a", "ghost"])
    ra1 = dict(zip(one["host"], one["rank_fp"]))["a"]
    ra2 = dict(zip(two["host"], two["rank_fp"]))["a"]
    # NS=2 halves a's trust mass even though ghost has no row
    assert ra2 == ((15 * (SCALE // 2)) // 100)
    assert ra1 == ((15 * SCALE) // 100)
    assert "ghost" not in set(two["host"])


def test_trustrank_seeds_dataset_and_empty(ray_session):
    edges = rd.from_pandas(_edges_frame())
    seeds_ds = rd.from_pandas(pd.DataFrame({"host": ["h1", "h5"]}))
    out = pagerank_hosts(edges, iters=2, seeds=seeds_ds,
                         mode="local").to_pandas()
    want = pagerank_hosts(edges, iters=2, seeds=["h1", "h5"],
                          mode="local").to_pandas()
    assert out.sort_values("host")["rank_fp"].tolist() == \
        want.sort_values("host")["rank_fp"].tolist()
    with pytest.raises(ValueError):
        pagerank_hosts(edges, iters=2, seeds=[], mode="local")


def test_pagerank_broadcast_plan_bit_equal(ray_session):
    """iter_plan='broadcast' (static edges never re-exchanged, rank
    vector in plasma) is BIT-equal to the exchange plan and the local
    frame — plain, weighted, and seeded (TrustRank) variants."""
    edges = _edges_frame()

    def run(**kw):
        out = pagerank_hosts(rd.from_pandas(edges).repartition(9),
                             iters=5, mode="distributed", **kw) \
            .to_pandas().sort_values("host").reset_index(drop=True)
        return out

    for extra in ({}, {"seeds": ["h1", "h2"]}):
        bc = run(iter_plan="broadcast", **extra)
        ex = run(iter_plan="exchange", **extra)
        lc = pagerank_hosts(rd.from_pandas(edges), iters=5,
                            mode="local", **extra).to_pandas() \
            .sort_values("host").reset_index(drop=True)
        assert bc["host"].tolist() == ex["host"].tolist() \
            == lc["host"].tolist()
        assert bc["rank_fp"].tolist() == ex["rank_fp"].tolist() \
            == lc["rank_fp"].tolist()
        assert np.array_equal(bc["rank"].to_numpy().view("int64"),
                              ex["rank"].to_numpy().view("int64"))


def test_pagerank_weighted_broadcast_bit_equal(ray_session):
    """Weighted contrib (r*w)//W path under the broadcast plan."""
    edges = _edges_frame()
    w = edges.groupby(["src_host", "dst_host"], as_index=False) \
        .agg(n_links=("src_host", "size"))
    bc = pagerank_hosts(rd.from_pandas(w).repartition(5), iters=5,
                        weight_col="n_links", mode="distributed",
                        iter_plan="broadcast").to_pandas() \
        .sort_values("host").reset_index(drop=True)
    ex = pagerank_hosts(rd.from_pandas(w).repartition(5), iters=5,
                        weight_col="n_links", mode="distributed",
                        iter_plan="exchange").to_pandas() \
        .sort_values("host").reset_index(drop=True)
    assert bc["rank_fp"].tolist() == ex["rank_fp"].tolist()


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------
def test_hits_star_closed_form(ray_session):
    # 3 spokes -> 1 center: after one iteration auth(center) = SCALE
    # exactly (it holds ALL authority mass), hub(spoke) = floor(SCALE/3),
    # and the point is FIXED (iteration 2+ reproduces it bit-for-bit)
    from ocr_model_ray.functions.link_graph import _hits_frame
    edges = pd.DataFrame({"src_host": ["s1", "s2", "s3"],
                          "dst_host": ["c", "c", "c"]})
    for iters in (1, 2, 5):
        out = (_hits_frame(edges, iters, "src_host", "dst_host")
               .set_index("host"))
        assert int(out.loc["c", "auth_fp"]) == SCALE
        assert int(out.loc["c", "hub_fp"]) == 0
        for s in ("s1", "s2", "s3"):
            assert int(out.loc[s, "auth_fp"]) == 0
            assert int(out.loc[s, "hub_fp"]) == SCALE // 3


def test_hits_plans_bit_equal(ray_session):
    from ocr_model_ray.functions.link_graph import hits_hosts
    edges = _edges_frame()
    local = hits_hosts(rd.from_pandas(edges), iters=4,
                       mode="local").to_pandas()
    exch = hits_hosts(rd.from_pandas(edges).repartition(9), iters=4,
                      mode="distributed", iter_plan="exchange",
                      num_buckets=5).to_pandas()
    bcast = hits_hosts(rd.from_pandas(edges).repartition(3), iters=4,
                       mode="distributed", iter_plan="broadcast",
                       num_buckets=11).to_pandas()
    local = local.sort_values("host").reset_index(drop=True)
    for other in (exch, bcast):
        o = other.sort_values("host").reset_index(drop=True)
        assert local["host"].tolist() == o["host"].tolist()
        assert local["auth_fp"].tolist() == o["auth_fp"].tolist()
        assert local["hub_fp"].tolist() == o["hub_fp"].tolist()
        # floats too (driver hashes the int64 view)
        assert np.array_equal(local["auth"].to_numpy().view("int64"),
                              o["auth"].to_numpy().view("int64"))
        assert np.array_equal(local["hub"].to_numpy().view("int64"),
                              o["hub"].to_numpy().view("int64"))


def test_hits_invariants_and_empty(ray_session):
    from ocr_model_ray.functions.link_graph import _hits_frame, hits_hosts
    out = _hits_frame(_edges_frame(), 5, "src_host", "dst_host")
    # L1 mass conservation up to floor leakage: totals in (SCALE-n, SCALE]
    n = len(out)
    assert 0 < out["auth_fp"].sum() <= SCALE
    assert out["auth_fp"].sum() > SCALE - n
    assert 0 < out["hub_fp"].sum() <= SCALE
    assert (out["auth_fp"] >= 0).all() and (out["hub_fp"] >= 0).all()

    empty = hits_hosts(rd.from_pandas(pd.DataFrame({
        "src_host": pd.Series([], dtype="object"),
        "dst_host": pd.Series([], dtype="object")})), mode="local")
    assert empty.to_pandas().empty
    # typed-empty schema is pinned at the frame level (Ray's
    # from_pandas/to_pandas round-trip drops columns on zero rows)
    from ocr_model_ray.functions.link_graph import _hits_empty
    assert list(_hits_empty().columns) == ["host", "auth_fp", "hub_fp",
                                           "auth", "hub"]

    # self-loop only: the single host is its own perfect hub+authority
    loop = _hits_frame(pd.DataFrame({"src_host": ["a"],
                                     "dst_host": ["a"]}),
                       3, "src_host", "dst_host")
    assert loop["auth_fp"].tolist() == [SCALE]
    assert loop["hub_fp"].tolist() == [SCALE]


# ---------------------------------------------------------------------------
# harmonic centrality
# ---------------------------------------------------------------------------
def test_harmonic_closed_forms(ray_session):
    from ocr_model_ray.functions.link_graph import (_harmonic_frame,
                                                    _harmonic_lcm)
    assert _harmonic_lcm(8) == 840
    # path a->b->c: H(b)=1, H(c)=1+1/2
    path = pd.DataFrame({"src_host": ["a", "b"], "dst_host": ["b", "c"]})
    out = _harmonic_frame(path, 8, "src_host", "dst_host") \
        .set_index("host")
    assert out["harmonic_fp"].to_dict() == {"a": 0, "b": 840, "c": 1260}
    assert out["n_reached"].to_dict() == {"a": 0, "b": 1, "c": 2}
    assert out.loc["c", "harmonic"] == 1260 / 840.0
    # depth cap: a 10-chain from h0, max_depth=3 sees only 3 hops back
    chain = pd.DataFrame({"src_host": [f"n{i}" for i in range(9)],
                          "dst_host": [f"n{i+1}" for i in range(9)]})
    out3 = _harmonic_frame(chain, 3, "src_host", "dst_host") \
        .set_index("host")
    L3 = _harmonic_lcm(3)   # 6
    assert int(out3.loc["n9", "harmonic_fp"]) == L3 + L3 // 2 + L3 // 3
    assert int(out3.loc["n9", "n_reached"]) == 3
    # cycle: every node on a 4-cycle reaches the other 3
    cyc = pd.DataFrame({"src_host": ["a", "b", "c", "d"],
                        "dst_host": ["b", "c", "d", "a"]})
    oc = _harmonic_frame(cyc, 8, "src_host", "dst_host")
    assert (oc["harmonic_fp"] == 840 + 420 + 280).all()
    assert (oc["n_reached"] == 3).all()


def test_harmonic_plans_bit_equal_and_empty(ray_session):
    from ocr_model_ray.functions.link_graph import harmonic_centrality
    edges = _edges_frame()
    loc = harmonic_centrality(rd.from_pandas(edges),
                              mode="local").to_pandas()
    dist = harmonic_centrality(rd.from_pandas(edges).repartition(9),
                               mode="distributed",
                               num_buckets=5).to_pandas()
    loc = loc.sort_values("host").reset_index(drop=True)
    dist = dist.sort_values("host").reset_index(drop=True)
    assert loc["host"].tolist() == dist["host"].tolist()
    assert loc["harmonic_fp"].tolist() == dist["harmonic_fp"].tolist()
    assert loc["n_reached"].tolist() == dist["n_reached"].tolist()
    assert np.array_equal(loc["harmonic"].to_numpy().view("int64"),
                          dist["harmonic"].to_numpy().view("int64"))

    empty = harmonic_centrality(rd.from_pandas(pd.DataFrame({
        "src_host": pd.Series([], dtype="object"),
        "dst_host": pd.Series([], dtype="object")})), mode="local")
    assert empty.to_pandas().empty


# ---------------------------------------------------------------------------
# HyperBall (approximate harmonic centrality)
# ---------------------------------------------------------------------------
def test_hyperball_plans_bit_equal_and_accuracy(ray_session):
    from ocr_model_ray.functions.link_graph import (
        _harmonic_frame, hyperball_centrality)
    edges = _edges_frame()
    loc = hyperball_centrality(rd.from_pandas(edges),
                               mode="local").to_pandas()
    dist = hyperball_centrality(rd.from_pandas(edges).repartition(9),
                                mode="distributed",
                                num_buckets=5).to_pandas()
    loc = loc.sort_values("host").reset_index(drop=True)
    dist = dist.sort_values("host").reset_index(drop=True)
    assert loc["host"].tolist() == dist["host"].tolist()
    for c in ("est_reach", "harmonic_est"):
        assert np.array_equal(loc[c].to_numpy().view("int64"),
                              dist[c].to_numpy().view("int64"))
    # independent accuracy pin vs the EXACT (SQL-verified) harmonic:
    # p=10 gives ~3.2% standard error; 5% bound on this graph
    exact = _harmonic_frame(edges, 8, "src_host", "dst_host") \
        .sort_values("host").reset_index(drop=True)
    rel = np.abs(loc["harmonic_est"].to_numpy()
                 - exact["harmonic"].to_numpy()) \
        / np.maximum(exact["harmonic"].to_numpy(), 1e-9)
    assert rel.max() < 0.05
    # ball-size estimate: every host reaches all 37 (strongly
    # connected synth graph) — est_reach within 5% of 37
    assert (np.abs(loc["est_reach"].to_numpy() - 37) / 37 < 0.05).all()


def test_hyperball_registers_monotone_and_empty(ray_session):
    from ocr_model_ray.functions.link_graph import (
        _hll_est, _hll_init, hyperball_centrality)
    # estimator sanity: singleton sketches estimate ~1; merged pair ~2
    hosts = np.array([f"x{i}" for i in range(64)], dtype=object)
    regs = _hll_init(hosts, 10)
    est1 = _hll_est(regs)
    assert (np.abs(est1 - 1.0) < 0.05).all()
    merged = np.maximum(regs[0], regs[1])[None, :]
    assert abs(_hll_est(merged)[0] - 2.0) < 0.2
    empty = hyperball_centrality(rd.from_pandas(pd.DataFrame({
        "src_host": pd.Series([], dtype="object"),
        "dst_host": pd.Series([], dtype="object")})), mode="local")
    assert empty.to_pandas().empty
