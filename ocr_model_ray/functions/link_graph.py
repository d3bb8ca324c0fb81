"""Web link-graph operators: href/anchor extraction from raw HTML
pages, host-level graph aggregation, in-link statistics, and
fixed-point PageRank.

The reference repo has no link-graph stage (its corpus is
document-per-file, ``worker/document_processor.py``) — these are the
web-scale training-data additions the task brief lists for the
Common-Crawl-shaped pages table (BASELINE.json ``input_hint``): link
graphs drive host-quality priors (Common Crawl's harmonic-centrality
ranking, RefinedWeb's URL filtering) and anchor text is retrieval /
training signal. Repo doctrine throughout: vectorized per-batch
kernels, one bucketed exchange per wide step, per-iteration state is
O(hosts) — never O(docs) — and a 'local' plan collapses the exchanges
for provably small inputs.

PageRank runs in FIXED-POINT int64 (``SCALE`` = 10^12): every step is
integer arithmetic (floor divisions and order-free integer sums), so
the result is bit-identical across partitionings AND to the DuckDB
oracle's BIGINT replay — float PageRank differs in the last ulp by
summation order, which the driver's value-hash gate would flag.
The frozen update rule (both sides implement exactly this):

    r0(h)      = SCALE // N                      for every host h
    contrib(e) = r(src) // outdeg(src)           per distinct edge e
    r'(h)      = (DAMP_COMP * SCALE) // (100 * N)
                 + (DAMP * sum_e->h contrib(e)) // 100

Dangling-host mass is dropped (ranks need not sum to SCALE) — a
deterministic, documented spec choice shared with the oracle.
"""
from __future__ import annotations

import logging
import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .dedup_algos import _resolve_mode

log = logging.getLogger(__name__)

#: frozen link-scan spec (shared semantics with the SQL oracle's RE2
#: pattern): double-quoted href anywhere in the <a> tag, anchor = raw
#: inner markup up to the first </a>, case-insensitive, dot matches
#: newlines. Entities are NOT unescaped and nested <a> are not handled
#: — the scan is the crawler-style regex pass, not the DOM parse.
#: the whitespace class is spelled out as RE2's ASCII \s ([\t\n\f\r ]):
#: Python's \s would also match U+00A0/U+0085 etc. and silently diverge
#: from the DuckDB twin on exotic-whitespace markup
LINK_RE = re.compile(r'<a[\t\n\f\r ][^>]*?href="([^"]*)"[^>]*>(.*?)</a>',
                     re.IGNORECASE | re.DOTALL)

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
_ORIGIN_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*")

#: PageRank fixed-point scale and damping (percent)
SCALE = 10 ** 12
DAMP = 85


def _compact(ds: rd.Dataset, rows: int, num_buckets: int) -> rd.Dataset:
    """Coalesce (no shuffle) a just-materialized iteration-state
    Dataset to O(rows) blocks. Groupby outputs inherit Ray's default
    ~200 shuffle partitions regardless of size, and every subsequent
    exchange costs O(map_blocks x reduce_partitions) boundary objects
    — 15+ shuffles per PageRank run turned a 37-host graph into
    thousands of tiny tasks before this policy existed."""
    nb = max(1, min(num_buckets, rows // 500_000 + 1))
    return ds.repartition(nb).materialize()


def resolve_href(src_url: str, href: str) -> Optional[str]:
    """Frozen absolutization subset (shared with the SQL twin):
    absolute URLs pass through, root-relative ('/path') joins the
    source origin, protocol-relative ('//host/p') takes the source
    scheme; everything else (relative paths, mailto:, fragments,
    empty) resolves to None — a crawler queue wants unambiguous
    targets, and path-relative resolution needs the full RFC 3986
    merge that neither side implements."""
    if _SCHEME_RE.match(href):
        return href
    m = _ORIGIN_RE.match(src_url)
    if m is None:
        return None
    if href.startswith("//"):
        return m.group(0).split("://", 1)[0] + ":" + href
    if href.startswith("/"):
        return m.group(0) + href
    return None


def scan_links(doc: str) -> list[tuple[str, str]]:
    """All (href, anchor) pairs in one decoded HTML document."""
    return LINK_RE.findall(doc)


def extract_links(pages: rd.Dataset, url_col: str = "url",
                  html_col: str = "html") -> rd.Dataset:
    """(url, link_no, href, dst_url, anchor) per <a href> in every
    text/html page (magic-number sniff — non-HTML payloads yield no
    rows). ``link_no`` is the 0-based match ordinal within the page.

    The per-row work is one C-regex scan over the decoded payload —
    the same shape as the md5/simhash kernels: per-document string
    work where the C call IS the vectorization. Output is ~links
    rows; the payload column dies at this stage boundary."""
    from ..spec import decode_text, sniff_mime

    def per_batch(df: pd.DataFrame) -> pa.Table:
        urls: list[str] = []
        nos: list[int] = []
        hrefs: list[str] = []
        dsts: list[Optional[str]] = []
        anchors: list[str] = []
        for url, payload in zip(df[url_col].tolist(),
                                df[html_col].tolist()):
            if payload is None or sniff_mime(bytes(payload)) != "text/html":
                continue
            doc = decode_text(bytes(payload))
            for no, (href, anchor) in enumerate(scan_links(doc)):
                urls.append(url)
                nos.append(no)
                hrefs.append(href)
                dsts.append(resolve_href(url, href))
                anchors.append(anchor)
        # typed arrow output (repo doctrine): all-empty batches keep
        # the schema, so downstream collects/joins never see
        # schema-less blocks and Ray's size estimator stays quiet
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "link_no": pa.array(nos, pa.int64()),
            "href": pa.array(hrefs, pa.string()),
            "dst_url": pa.array(dsts, pa.string()),
            "anchor": pa.array(anchors, pa.string())})

    return pages.map_batches(per_batch, batch_format="pandas")


def host_graph(edges: rd.Dataset, src: str = "src_host",
               dst: str = "dst_host",
               num_buckets: int = 64) -> rd.Dataset:
    """Host-level edge aggregation: (src_host, dst_host, n_links) —
    one bucketed exchange on the composite key (hot host pairs cost a
    linear pandas groupby inside their bucket, never per-key Python)."""
    from .bucketed import bucketed_agg
    return bucketed_agg(edges, [src, dst], {"n_links": (src, "size")},
                        num_buckets=num_buckets)


def host_inlinks(edges: rd.Dataset, src: str = "src_host",
                 dst: str = "dst_host",
                 num_buckets: int = 64) -> rd.Dataset:
    """Per-destination-host in-link stats: total links + distinct
    linking hosts. One exchange on dst — every (dst, *) row lands in
    one bucket, so the per-bucket ``nunique`` is complete."""
    from .bucketed import bucketed_agg
    return bucketed_agg(edges, dst,
                        {"n_links": (src, "size"),
                         "n_src_hosts": (src, "nunique")},
                        num_buckets=num_buckets)


def _pagerank_frame(edges: pd.DataFrame, iters: int,
                    src: str, dst: str,
                    weight_col: str | None = None,
                    seeds: list[str] | None = None) -> pd.DataFrame:
    """Single-frame fixed-point PageRank (the local plan and the
    per-test reference for the distributed twin). Pure int64 numpy.

    With ``weight_col``: weighted rule — contrib(e) = (r(src) · w(e))
    // W(src) where W = Σ w over src's out-edges, computed OVERFLOW-
    SAFELY as ``(r//W)·w + ((r%W)·w)//W`` (exact identity; safe while
    max W · max w < 2^63).

    With ``seeds``: TrustRank (Gyöngyi et al., VLDB 2004) — the
    teleport vector concentrates on the trusted seed list instead of
    being uniform: t(h) = SCALE // NS for seed hosts (NS = distinct
    seeds AS GIVEN — a seed absent from the graph gets no row and its
    trust mass simply vanishes, like the paper's dangling seeds),
    0 elsewhere; r starts AT the trust vector; each iteration is
    r = (15·t(h))//100 + (DAMP·insum)//100. Spam hosts far from the
    seed set end near 0 — the demotion signal."""
    if weight_col is None:
        e = edges[[src, dst]].drop_duplicates()
        w = np.ones(len(e), dtype=np.int64)
    else:
        e = (edges.groupby([src, dst], as_index=False)
             .agg(__w=(weight_col, "sum")))
        w = e["__w"].to_numpy().astype(np.int64)
    hosts = pd.unique(pd.concat([e[src], e[dst]], ignore_index=True))
    hosts = np.sort(hosts.astype(object))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": pd.Series([], dtype="object"),
                             "rank_fp": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})
    idx = pd.Index(hosts)
    si = idx.get_indexer(e[src]).astype(np.int64)
    di = idx.get_indexer(e[dst]).astype(np.int64)
    outw = np.zeros(n, dtype=np.int64)
    np.add.at(outw, si, w)
    if seeds is None:
        teleport = np.full(n, (15 * SCALE) // (100 * n), dtype=np.int64)
        r = np.full(n, SCALE // n, dtype=np.int64)
    else:
        ns = len(set(seeds))
        t0 = np.int64(SCALE // ns)
        is_seed = np.isin(hosts, np.array(sorted(set(seeds)),
                                          dtype=object))
        teleport = np.where(is_seed, (15 * t0) // 100,
                            0).astype(np.int64)
        r = np.where(is_seed, t0, 0).astype(np.int64)
    for _ in range(iters):
        q, s = r[si] // outw[si], r[si] % outw[si]
        contrib = q * w + (s * w) // outw[si]
        insum = np.zeros(n, dtype=np.int64)
        np.add.at(insum, di, contrib)
        r = teleport + (DAMP * insum) // 100
    return pd.DataFrame({"host": hosts, "rank_fp": r,
                         "rank": r / float(SCALE)})


#: hosts-table row cut under which the distributed plan's ITERATION
#: uses the broadcast regime (rank vector rides plasma, static edges
#: never re-exchange); 2M hosts ~ 80 MB of (host, rank) — the same
#: driver-resident-small-table doctrine as ``crawl_depth``
BROADCAST_HOSTS_CUT = 2_000_000


def pagerank_hosts(edges: rd.Dataset, iters: int = 5,
                   src: str = "src_host", dst: str = "dst_host",
                   num_buckets: int = 32,
                   weight_col: str | None = None,
                   seeds=None,
                   mode: str = "auto",
                   iter_plan: str = "auto") -> rd.Dataset:
    """Fixed-point PageRank over the host graph (module docstring for
    the frozen update rule). Output: (host, rank_fp, rank).

    ``seeds`` switches the teleport vector to a trusted seed list —
    TrustRank (``_pagerank_frame`` docstring for the frozen rule).
    Accepts a list of host strings or a Dataset with a ``host``
    column; a seed list is an admin artifact (hundreds to a few
    thousand hosts), so it rides into the per-bucket maps as a
    broadcast sorted array — no extra exchange.

    Distributed plan (``mode='distributed'``, the 10^12-doc shape):
    the distinct edge set and the host universe each cost one bucketed
    exchange once. The ITERATION then runs one of two regimes
    (``iter_plan``):

    * ``'broadcast'`` (auto when hosts <= ``BROADCAST_HOSTS_CUT``) —
      the O(hosts) rank vector rides plasma (``ray.put`` per
      iteration); every iteration is ONE streaming pass over the
      STATIC edge Dataset (per-block (dst, contrib) partials, ranks
      looked up from the broadcast — the edges are never
      re-exchanged) + one bucketed sum of the partials + an O(hosts)
      driver fold for teleport+damp. This is the regime a HOST-level
      graph (10^8 hosts under 10^12 pages) actually wants: the heavy
      static side moves zero times per iteration. Same
      driver-resident-small-table doctrine as ``crawl_depth``.
    * ``'exchange'`` (auto above the cut — page-level graphs, where
      the rank vector itself is too big to broadcast) — every
      iteration is

          ranks ⋈ edges on src  (hash-bucket join, contrib in the
                                 bucket task)
          -> bucketed sum by dst
          -> hosts ⋈ insum LEFT (teleport + damp in the bucket task)

      i.e. per-iteration state is one O(hosts) Dataset — the same
      Dataset-resident iteration doctrine as
      ``dedup_algos._label_prop_ray``, at the cost of re-exchanging
      the static edge side each round.

    Fixed-point integer arithmetic makes the result bit-identical
    across plans, bucket counts and batch boundaries (pinned by
    test)."""
    if seeds is not None:
        if isinstance(seeds, rd.Dataset):
            seeds = seeds.to_pandas()["host"].tolist()
        seeds = sorted({str(h) for h in seeds})
        if not seeds:
            raise ValueError("TrustRank needs a non-empty seed list")
    cols = [src, dst] + ([weight_col] if weight_col else [])
    if _resolve_mode(edges, mode) == "local":
        def proj(df: pd.DataFrame) -> pd.DataFrame:
            return df[cols]
        frame = edges.map_batches(proj, batch_format="pandas").to_pandas()
        if frame.empty:
            frame = pd.DataFrame({c: pd.Series([], dtype="object")
                                  for c in cols})
        return rd.from_pandas(_pagerank_frame(frame, iters, src, dst,
                                              weight_col=weight_col,
                                              seeds=seeds))

    from .bucketed import bucketed_agg, bucketed_distinct
    from .joins import hash_bucket_join

    if weight_col is None:
        dedges = bucketed_distinct(
            edges.map_batches(lambda t: t.select([src, dst]),
                              batch_format="pyarrow"),
            [src, dst], ).materialize()
    else:
        # weighted graph: one bucketed aggregation replaces the
        # distinct (duplicate pairs SUM their weights)
        def keep_w(t: pa.Table) -> pa.Table:
            return pa.table({src: t[src], dst: t[dst],
                             "__w": t[weight_col].cast(pa.int64())})

        dedges = bucketed_agg(
            edges.map_batches(keep_w, batch_format="pyarrow"),
            [src, dst], {"__w": ("__w", "sum")},
            num_buckets=num_buckets).materialize()
    n_edges = dedges.count()
    dedges = _compact(dedges, n_edges, num_buckets)

    def one_side(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"host": t[col].cast(pa.string())})
        return f

    hosts = bucketed_distinct(
        dedges.map_batches(one_side(src), batch_format="pyarrow")
        .union(dedges.map_batches(one_side(dst), batch_format="pyarrow")),
        ["host"]).materialize()
    n = hosts.count()
    hosts = _compact(hosts, n, num_buckets)
    if n == 0:
        return rd.from_pandas(pd.DataFrame({
            "host": pd.Series([], dtype="object"),
            "rank_fp": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="float64")}))
    if seeds is None:
        tele_fp = (15 * SCALE) // (100 * n)
        r0 = SCALE // n
        seed_arr = None
    else:
        t0 = SCALE // len(seeds)
        tele_fp = (15 * t0) // 100
        r0 = t0
        seed_arr = pa.array(seeds, pa.string())

    def tele_and_r0(host_col) -> tuple[np.ndarray, np.ndarray]:
        """Per-host (teleport, initial-rank) vectors for one batch —
        uniform without seeds, seed-indicator-scaled with them."""
        m = len(host_col)
        if seed_arr is None:
            return (np.full(m, tele_fp, dtype=np.int64),
                    np.full(m, r0, dtype=np.int64))
        hit = pc.is_in(host_col, value_set=seed_arr) \
            .to_numpy(zero_copy_only=False).astype(bool)
        return (np.where(hit, tele_fp, 0).astype(np.int64),
                np.where(hit, r0, 0).astype(np.int64))

    # out-mass joins into the edge set ONCE; iterations reuse the
    # result (unweighted: out-degree; weighted: Σ w per src)
    if weight_col is None:
        outdeg = bucketed_agg(dedges, src, {"outdeg": (dst, "size")},
                              num_buckets=num_buckets)
    else:
        outdeg = bucketed_agg(dedges, src, {"outdeg": ("__w", "sum")},
                              num_buckets=num_buckets)
    # fuse the compaction into the join's execution: edge count is
    # already known from dedges, so the repartition rides the same plan
    nb_e = max(1, min(num_buckets, n_edges // 500_000 + 1))
    edges_wd = hash_bucket_join(dedges, outdeg, on=src,
                                num_buckets=num_buckets
                                ).repartition(nb_e).materialize()

    if iter_plan == "auto":
        iter_plan = ("broadcast" if n <= BROADCAST_HOSTS_CUT
                     else "exchange")
    if iter_plan == "broadcast":
        import ray

        hosts_pd = hosts.to_pandas()    # O(hosts): the documented
        idx = pd.Index(hosts_pd["host"])  # driver-resident small table
        tele, r = tele_and_r0(pa.array(hosts_pd["host"], pa.string()))
        for _ in range(iters):
            sref = ray.put(pd.Series(r, index=idx))

            def partial(t: pa.Table, _sref=sref) -> pa.Table:
                s = ray.get(_sref)
                rr = s.reindex(pd.Index(
                    t[src].to_numpy(zero_copy_only=False))).to_numpy()
                if rr.dtype != np.int64:
                    # reindex only upcasts to float when a src host is
                    # missing from the universe — impossible by
                    # construction, so fail loudly rather than floor-
                    # divide garbage
                    if np.isnan(rr).any():
                        raise ValueError("pagerank: src host missing "
                                         "from the host universe")
                    rr = rr.astype(np.int64)
                d = t["outdeg"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                if weight_col is None:
                    c = rr // d
                else:
                    w = t["__w"].to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                    c = (rr // d) * w + ((rr % d) * w) // d
                g = (pa.table({dst: t[dst], "contrib": pa.array(c)})
                     .group_by(dst).aggregate([("contrib", "sum")]))
                return g.select([dst, "contrib_sum"]) \
                        .rename_columns([dst, "contrib"])

            ins = bucketed_agg(
                edges_wd.map_batches(partial, batch_format="pyarrow"),
                dst, {"insum": ("contrib", "sum")},
                num_buckets=num_buckets).to_pandas()
            if ins.empty or "insum" not in ins.columns:
                m = np.zeros(len(hosts_pd), dtype=np.int64)
            else:
                m = (pd.Series(ins["insum"].to_numpy().astype(np.int64),
                               index=ins[dst])
                     .reindex(idx).fillna(0).astype(np.int64)
                     .to_numpy())
            r = tele + (DAMP * m) // 100
        return rd.from_pandas(pd.DataFrame({
            "host": hosts_pd["host"],
            "rank_fp": r.astype("int64"),
            "rank": r.astype("int64") / float(SCALE)}))

    def seed_ranks(t: pa.Table) -> pa.Table:
        _, r_init = tele_and_r0(t["host"])
        return pa.table({"host": t["host"], "r": pa.array(r_init)})

    ranks = hosts.map_batches(seed_ranks,
                              batch_format="pyarrow").materialize()

    # TWO exchanges per iteration (round-4 verdict #4 — was three):
    # the contrib join's post_merge pre-aggregates by dst INSIDE each
    # src-bucket (a combiner partial), and the dst-side sum COMPLETES
    # inside the teleport join's bucket task via left_agg (the join
    # key co-locates each host's partials), so the standalone
    # bucketed_agg exchange between them disappears.
    for _ in range(iters):
        def as_src(t: pa.Table) -> pa.Table:
            return pa.table({src: t["host"], "r": t["r"]})

        def contrib_in_bucket(t: pa.Table) -> pa.Table:
            r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
            if weight_col is None:
                c = r // d
            else:
                w = t["__w"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                # exact (r·w)//W without int64 overflow (frame twin)
                c = (r // d) * w + ((r % d) * w) // d
            g = (pa.table({"host": t[dst], "contrib": pa.array(c)})
                 .group_by("host").aggregate([("contrib", "sum")]))
            return g.select(["host", "contrib_sum"]) \
                    .rename_columns(["host", "contrib"])

        joined = hash_bucket_join(
            edges_wd, ranks.map_batches(as_src, batch_format="pyarrow"),
            on=src, num_buckets=num_buckets,
            post_merge=contrib_in_bucket)

        def sum_partials(t: pa.Table) -> pa.Table:
            g = t.group_by("host").aggregate([("contrib", "sum")])
            return g.select(["host", "contrib_sum"]) \
                    .rename_columns(["host", "insum"])

        def finish(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            s = (pc.fill_null(t["insum"], 0).cast(pa.int64())
                 .to_numpy(zero_copy_only=False).astype(np.int64))
            tele, _ = tele_and_r0(t["host"])
            return pa.table({"host": t["host"],
                             "r": pa.array(tele + (DAMP * s) // 100)})

        # compaction fused into the iteration's one execution
        nb_r = max(1, min(num_buckets, n // 500_000 + 1))
        ranks = hash_bucket_join(
            joined, hosts, on="host", how="right",
            num_buckets=num_buckets, left_agg=sum_partials,
            post_merge=finish).repartition(nb_r).materialize()

    def out(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy()
        return pa.table({"host": t["host"], "rank_fp": r,
                         "rank": pa.array(r / float(SCALE))})

    return ranks.map_batches(out, batch_format="pyarrow")


def _l1_scale_fp(v: np.ndarray, total: int) -> np.ndarray:
    """Frozen HITS normalization step: floor((v / total) * SCALE) with
    v and total cast to float64 first — ONE IEEE division + ONE IEEE
    multiplication + floor per host, the exact expression the SQL twin
    evaluates (``floor((CAST(s AS DOUBLE) / CAST(t AS DOUBLE)) *
    1000000000000.0)``), so results are bit-identical across plans and
    to the oracle. Integer sums stay exact/order-free; only this
    normalization touches floats, and it is a fixed op sequence.
    ``total <= 0`` (empty score mass) yields the zero vector."""
    if total <= 0:
        return np.zeros(len(v), dtype=np.int64)
    return np.floor((v.astype(np.float64) / np.float64(total))
                    * np.float64(SCALE)).astype(np.int64)


_HITS_EMPTY = {"host": "object", "auth_fp": "int64", "hub_fp": "int64",
               "auth": "float64", "hub": "float64"}


def _hits_empty() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t)
                         for c, t in _HITS_EMPTY.items()})


def _hits_frame(edges: pd.DataFrame, iters: int, src: str,
                dst: str) -> pd.DataFrame:
    """Single-frame HITS (Kleinberg 1999) — the local plan and the
    per-test reference for the distributed twins. Frozen update rule
    (both the distributed plans and the DuckDB oracle implement
    exactly this):

        hub0(h)  = SCALE // N                    for every host h
        A'(h)    = sum_{(s,h) in E} hub(s)       (int64, order-free)
        auth(h)  = floor((A'(h)/TA) * SCALE),    TA = sum_h A'(h)
        H'(h)    = sum_{(h,d) in E} auth(d)
        hub(h)   = floor((H'(h)/TH) * SCALE),    TH = sum_h H'(h)

    L1 normalization (not the paper's L2) keeps every step either an
    exact integer sum or the one-division float expression of
    ``_l1_scale_fp`` — L2 would need a square-root whose summation
    order leaks into the last ulp. Bounds: per-host sums are <= the
    total score mass (~SCALE), totals are <= SCALE * max_degree —
    int64-safe while max degree < 9.2e6; beyond that, lower SCALE."""
    e = edges[[src, dst]].drop_duplicates()
    hosts = pd.unique(pd.concat([e[src], e[dst]], ignore_index=True))
    hosts = np.sort(hosts.astype(object))
    n = len(hosts)
    if n == 0:
        return _hits_empty()
    idx = pd.Index(hosts)
    si = idx.get_indexer(e[src]).astype(np.int64)
    di = idx.get_indexer(e[dst]).astype(np.int64)
    hub = np.full(n, SCALE // n, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        ap = np.zeros(n, dtype=np.int64)
        np.add.at(ap, di, hub[si])
        auth = _l1_scale_fp(ap, int(ap.sum()))
        hp = np.zeros(n, dtype=np.int64)
        np.add.at(hp, si, auth[di])
        hub = _l1_scale_fp(hp, int(hp.sum()))
    return pd.DataFrame({"host": hosts, "auth_fp": auth, "hub_fp": hub,
                         "auth": auth / float(SCALE),
                         "hub": hub / float(SCALE)})


def hits_hosts(edges: rd.Dataset, iters: int = 5,
               src: str = "src_host", dst: str = "dst_host",
               num_buckets: int = 32,
               mode: str = "auto",
               iter_plan: str = "auto") -> rd.Dataset:
    """HITS hubs-and-authorities over the host graph (frozen L1
    fixed-point rule in ``_hits_frame``). Output: (host, auth_fp,
    hub_fp, auth, hub). Complements PageRank: authority rewards being
    linked FROM good hubs (directory/aggregator pages), the signal
    Kleinberg's paper showed is distinct from raw in-degree prestige.

    Distributed plan (``mode='distributed'``): the distinct edge set
    and host universe cost one bucketed exchange each, once. Each
    iteration then needs TWO half-steps (in-sum by dst for authority,
    out-sum by src for hub — double PageRank's one) under one of two
    regimes (``iter_plan``, same policy/cut as ``pagerank_hosts``):

    * ``'broadcast'`` (auto when hosts <= ``BROADCAST_HOSTS_CUT``) —
      the O(hosts) score vector rides plasma; each half-step is ONE
      streaming pass over the STATIC edge Dataset (per-block (key,
      partial-sum), scores looked up from the broadcast) + one small
      bucketed sum + an O(hosts) driver normalization fold. The
      static edges never re-exchange.
    * ``'exchange'`` — each half-step hash-bucket-joins the score
      Dataset into the edges and bucket-sums the other endpoint;
      per-iteration state stays one O(hosts) Dataset. The
      normalization total is a single scalar aggregate per half-step
      (one number to the driver — the documented O(1) fold).

    The L1-scale step is the identical float expression everywhere
    (``_l1_scale_fp``), so local/exchange/broadcast are bit-identical
    and match the oracle's unrolled-CTE replay (pinned by test)."""
    cols = [src, dst]
    if _resolve_mode(edges, mode) == "local":
        frame = edges.map_batches(lambda df: df[cols],
                                  batch_format="pandas").to_pandas()
        if frame.empty:
            frame = pd.DataFrame({c: pd.Series([], dtype="object")
                                  for c in cols})
        return rd.from_pandas(_hits_frame(frame, iters, src, dst))

    from .bucketed import bucketed_agg, bucketed_distinct
    from .joins import hash_bucket_join

    dedges = bucketed_distinct(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow"),
        [src, dst]).materialize()
    n_edges = dedges.count()
    dedges = _compact(dedges, n_edges, num_buckets)

    def one_side(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"host": t[col].cast(pa.string())})
        return f

    hosts = bucketed_distinct(
        dedges.map_batches(one_side(src), batch_format="pyarrow")
        .union(dedges.map_batches(one_side(dst), batch_format="pyarrow")),
        ["host"]).materialize()
    n = hosts.count()
    hosts = _compact(hosts, n, num_buckets)
    if n == 0:
        return rd.from_pandas(_hits_empty())
    h0 = SCALE // n

    if iter_plan == "auto":
        iter_plan = ("broadcast" if n <= BROADCAST_HOSTS_CUT
                     else "exchange")

    if iter_plan == "broadcast":
        import ray

        hosts_pd = hosts.to_pandas()    # O(hosts): the documented
        idx = pd.Index(hosts_pd["host"])  # driver-resident small table

        def half_step(score: np.ndarray, key_in: str,
                      key_out: str) -> np.ndarray:
            """One HITS half-step under the broadcast regime: stream
            the static edges once, looking up ``score`` (keyed by
            ``key_in``'s endpoint) from plasma and partial-summing by
            ``key_out``; finish with one bucketed sum + the driver
            normalization fold."""
            sref = ray.put(pd.Series(score, index=idx))

            def partial(t: pa.Table, _sref=sref) -> pa.Table:
                s = ray.get(_sref)
                v = s.reindex(pd.Index(
                    t[key_in].to_numpy(zero_copy_only=False))).to_numpy()
                if v.dtype != np.int64:
                    if np.isnan(v).any():
                        raise ValueError("hits: edge endpoint missing "
                                         "from the host universe")
                    v = v.astype(np.int64)
                g = (pa.table({"host": t[key_out], "p": pa.array(v)})
                     .group_by("host").aggregate([("p", "sum")]))
                # select by NAME: pyarrow's key/aggregate column
                # order varies between releases (the q22 /
                # salted_group_count trap)
                return g.select(["host", "p_sum"]) \
                        .rename_columns(["host", "p"])

            agg = bucketed_agg(
                dedges.map_batches(partial, batch_format="pyarrow"),
                "host", {"s": ("p", "sum")},
                num_buckets=num_buckets).to_pandas()
            if agg.empty or "s" not in agg.columns:
                raw = np.zeros(len(hosts_pd), dtype=np.int64)
            else:
                raw = (pd.Series(agg["s"].to_numpy().astype(np.int64),
                                 index=agg["host"])
                       .reindex(idx).fillna(0).astype(np.int64)
                       .to_numpy())
            return _l1_scale_fp(raw, int(raw.sum()))

        hub = np.full(len(hosts_pd), h0, dtype=np.int64)
        auth = np.zeros(len(hosts_pd), dtype=np.int64)
        for _ in range(iters):
            auth = half_step(hub, src, dst)
            hub = half_step(auth, dst, src)
        return rd.from_pandas(pd.DataFrame({
            "host": hosts_pd["host"],
            "auth_fp": auth, "hub_fp": hub,
            "auth": auth / float(SCALE),
            "hub": hub / float(SCALE)}))

    # exchange regime: score vectors stay Datasets end-to-end
    def const_scores(v: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"host": t["host"],
                             "v": pa.array(np.full(len(t), v,
                                                   dtype=np.int64))})
        return f

    hub_ds = hosts.map_batches(const_scores(h0),
                               batch_format="pyarrow").materialize()
    nb_r = max(1, min(num_buckets, n // 500_000 + 1))

    def half_step_ds(score_ds: rd.Dataset, key_in: str,
                     key_out: str) -> rd.Dataset:
        """TWO exchanges per half-step (round-4 verdict #4 — was
        three): the score join's post_merge pre-sums by the OUT
        endpoint inside each bucket (combiner partials, materialized
        once — the normalization total is their driver sum, no extra
        exchange), and the per-host sum COMPLETES inside the
        normalization join's bucket task via left_agg."""
        def as_key(t: pa.Table) -> pa.Table:
            return pa.table({key_in: t["host"], "v": t["v"]})

        def emit_partial(t: pa.Table) -> pa.Table:
            g = (pa.table({"host": t[key_out], "p": t["v"]})
                 .group_by("host").aggregate([("p", "sum")]))
            return g.select(["host", "p_sum"]) \
                    .rename_columns(["host", "p"])

        joined = hash_bucket_join(
            dedges, score_ds.map_batches(as_key, batch_format="pyarrow"),
            on=key_in, num_buckets=num_buckets,
            post_merge=emit_partial).materialize()
        # normalization total: partials are additive, so their sum is
        # the exact half-step total — ONE scalar off the materialized
        # partials, no bucketed exchange
        total = joined.sum("p") or 0

        def sum_partials(t: pa.Table) -> pa.Table:
            g = t.group_by("host").aggregate([("p", "sum")])
            return g.select(["host", "p_sum"]) \
                    .rename_columns(["host", "s"])

        def finish(t: pa.Table) -> pa.Table:
            s = (pc.fill_null(t["s"], 0).cast(pa.int64())
                 .to_numpy(zero_copy_only=False).astype(np.int64))
            return pa.table({"host": t["host"],
                             "v": pa.array(_l1_scale_fp(s, int(total)))})

        return hash_bucket_join(
            joined, hosts, on="host", how="right",
            num_buckets=num_buckets, left_agg=sum_partials,
            post_merge=finish).repartition(nb_r).materialize()

    auth_ds = None
    for _ in range(iters):
        auth_ds = half_step_ds(hub_ds, src, dst)
        hub_ds = half_step_ds(auth_ds, dst, src)

    def out_merge(t: pa.Table) -> pa.Table:
        a = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["v_hub"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"host": t["host"],
                         "auth_fp": pa.array(a), "hub_fp": pa.array(h),
                         "auth": pa.array(a / float(SCALE)),
                         "hub": pa.array(h / float(SCALE))})

    def rename_hub(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"], "v_hub": t["v"]})

    return hash_bucket_join(
        auth_ds, hub_ds.map_batches(rename_hub, batch_format="pyarrow"),
        on="host", num_buckets=num_buckets, post_merge=out_merge)


def _components_frame(edges: pd.DataFrame, src: str,
                      dst: str) -> pd.DataFrame:
    """Single-frame connected components (local plan + the reference
    for the distributed twin): union-find over factorized hosts,
    component id = lexicographically smallest member host."""
    hosts = pd.unique(pd.concat([edges[src], edges[dst]],
                                ignore_index=True))
    hosts = np.sort(hosts.astype(object))
    if len(hosts) == 0:
        return pd.DataFrame({"host": pd.Series([], dtype="object"),
                             "component": pd.Series([], dtype="object")})
    idx = pd.Index(hosts)
    a = idx.get_indexer(edges[src]).astype(np.int64)
    b = idx.get_indexer(edges[dst]).astype(np.int64)
    parent = np.arange(len(hosts), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(a.tolist(), b.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            # union by smaller index => root IS the min member (hosts
            # are sorted), no second pass needed
            if ri < rj:
                parent[rj] = ri
            else:
                parent[ri] = rj
    roots = np.array([find(i) for i in range(len(hosts))])
    return pd.DataFrame({"host": hosts, "component": hosts[roots]})


def host_components(edges: rd.Dataset, src: str = "src_host",
                    dst: str = "dst_host", num_buckets: int = 32,
                    rounds_cap: int | None = None,
                    mode: str = "auto",
                    iter_plan: str = "auto") -> rd.Dataset:
    """Connected components of the (undirected) host graph: (host,
    component) where component = lexicographically smallest host in
    the component — site families / mirror clusters at host
    granularity.

    Distributed plan: STRING min-label propagation. ``iter_plan``
    picks the round regime (same policy as ``pagerank_hosts``):

    * ``'broadcast'`` (auto when hosts <= ``BROADCAST_HOSTS_CUT``) —
      the O(hosts) label vector rides plasma; each round is ONE
      streaming pass over the STATIC symmetric edge Dataset (per-block
      (dst, min incoming label) partials) + one bucketed min + an
      O(hosts) driver fold — the static edges never re-exchange.
    * ``'exchange'`` — the Dataset-resident round shape of
      ``dedup_algos._label_prop_ray`` (labels never collect; one join
      + one bucketed min per round; a changed-count aggregate
      terminates) — the page-level-graph path, where the label vector
      itself is too big to broadcast.

    min over strings is as order-free as min over ints, so the result
    is partitioning-invariant, plan-invariant (pinned by test) and
    equal to the local union-find. ``rounds_cap`` defaults to
    n_nodes + 1 — the worst-case diameter bound, so the default ALWAYS
    converges (the sibling min_label_propagation rule); pass a smaller
    cap only as an explicit latency/exactness trade."""
    if _resolve_mode(edges, mode) == "local":
        def proj(df: pd.DataFrame) -> pd.DataFrame:
            return df[[src, dst]]
        frame = edges.map_batches(proj, batch_format="pandas").to_pandas()
        if frame.empty:
            frame = pd.DataFrame({src: pd.Series([], dtype="object"),
                                  dst: pd.Series([], dtype="object")})
        return rd.from_pandas(_components_frame(frame, src, dst))

    from .bucketed import bucketed_agg, bucketed_distinct
    from .joins import hash_bucket_join

    def sym(t: pa.Table) -> pa.Table:
        s = t[src].cast(pa.string())
        d = t[dst].cast(pa.string())
        return pa.concat_tables([pa.table({"src": s, "dst": d}),
                                 pa.table({"src": d, "dst": s})])

    dedges = bucketed_distinct(
        edges.map_batches(sym, batch_format="pyarrow"), ["src", "dst"],
    ).materialize()
    n_edges = dedges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "component": pa.array([], pa.string())}))
    dedges = _compact(dedges, n_edges, num_buckets)

    labels = bucketed_distinct(
        dedges.map_batches(lambda t: pa.table({"node": t["src"]}),
                           batch_format="pyarrow"),
        ["node"]).materialize()
    n = labels.count()
    labels = (_compact(labels, n, num_buckets)
              .map_batches(lambda t: pa.table({"node": t["node"],
                                               "label": t["node"]}),
                           batch_format="pyarrow").materialize())

    # message rows carry a MAX-sentinel self label (U+FFFF, mirroring
    # _label_prop_ray's _LP_NO_SELF int): pandas' object-dtype groupby
    # min cannot skip None, so the sentinel must SORT ABOVE every real
    # label — true for IDNA hostnames (ASCII/punycode); a non-BMP
    # label would violate the invariant, hence the hostname domain note
    no_self = "￿"

    if iter_plan == "auto":
        iter_plan = ("broadcast" if n <= BROADCAST_HOSTS_CUT
                     else "exchange")
    if iter_plan == "broadcast":
        import ray

        cap = rounds_cap if rounds_cap is not None else n + 1
        nodes_pd = labels.to_pandas()   # O(hosts) driver-resident
        idx = pd.Index(nodes_pd["node"])
        lab = nodes_pd["node"].to_numpy(dtype=object)
        converged = False
        for _ in range(cap):
            ref = ray.put(pd.Series(lab, index=idx))

            def part(t: pa.Table, _ref=ref) -> pa.Table:
                s = ray.get(_ref)
                ls = s.reindex(pd.Index(
                    t["src"].to_numpy(zero_copy_only=False))) \
                    .to_numpy(dtype=object)
                g = (pa.table({"node": t["dst"],
                               "label": pa.array(ls, pa.string())})
                     .group_by("node").aggregate([("label", "min")]))
                return g.select(["node", "label_min"]) \
                        .rename_columns(["node", "label"])

            ins = bucketed_agg(
                dedges.map_batches(part, batch_format="pyarrow"),
                "node", {"label": ("label", "min")},
                num_buckets=num_buckets).to_pandas()
            incoming = (pd.Series(ins["label"].to_numpy(dtype=object),
                                  index=ins["node"])
                        .reindex(idx).fillna(no_self)
                        .to_numpy(dtype=object))
            new = np.minimum(lab, incoming)
            if int((new < lab).sum()) == 0:
                converged = True
                break
            lab = new
        if not converged:
            log.warning("host_components: rounds_cap=%d hit before "
                        "convergence", cap)
        return rd.from_pandas(pd.DataFrame({
            "host": nodes_pd["node"],
            "component": pd.array(lab, dtype="object")}))

    def as_msg(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"],
                         "label": t["label"].cast(pa.string()),
                         "selfl": pa.array([no_self] * t.num_rows,
                                           pa.string())})

    def as_self(t: pa.Table) -> pa.Table:
        lab = t["label"].cast(pa.string())
        return pa.table({"node": t["node"], "label": lab, "selfl": lab})

    def lab_as_src(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["src" if c == "node" else c for c in t.column_names])

    def changed_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        c = pc.sum(pc.less(t["label"], t["old"])).as_py() or 0
        return pa.table({"n": pa.array([int(c)], pa.int64())})

    cap = rounds_cap if rounds_cap is not None else n + 1
    for _ in range(cap):
        msgs = hash_bucket_join(
            dedges, labels.map_batches(lab_as_src, batch_format="pyarrow"),
            on="src", num_buckets=num_buckets,
        ).map_batches(as_msg, batch_format="pyarrow")
        selfm = labels.map_batches(as_self, batch_format="pyarrow")
        # min over strings per node; `old` = the self label (messages
        # carry null selfl, which pandas min skips)
        # fuse the round's compaction into the same execution: the
        # groupby's map_groups output inherits ~200 shuffle partitions
        # regardless of size, and without the repartition BOTH the
        # changed-count pass and the next round's join exchange pay
        # O(label_blocks x reduce_partitions) boundary objects — the
        # PageRank iteration-state policy (_compact), applied in-plan
        nb = max(1, min(num_buckets, n // 500_000 + 1))
        agg = bucketed_agg(msgs.union(selfm), "node",
                           {"label": ("label", "min"),
                            "old": ("selfl", "min")},
                           num_buckets=num_buckets
                           ).repartition(nb).materialize()
        changed = int(agg.map_batches(
            changed_count, batch_format="pyarrow").sum("n") or 0)
        # agg is already materialized; the projection is a lazy view
        labels = agg.select_columns(["node", "label"])
        if changed == 0:
            break
    else:
        log.warning("host_components: rounds_cap=%d hit before "
                    "convergence", cap)

    return labels.map_batches(
        lambda t: pa.table({"host": t["node"],
                            "component": t["label"].cast(pa.string())}),
        batch_format="pyarrow")


#: a BFS frontier level up to this many hosts is collected and
#: broadcast (ray.put) instead of exchanged — ~2M host strings is
#: ~100-200 MB in the object store, read zero-copy by every edge-scan
#: task; beyond it the round falls back to the bucketed semi exchange
FRONTIER_BROADCAST_ROWS = 2_000_000


def _crawl_depth_frame(edges: pd.DataFrame, seeds: list[str],
                       max_depth: int, src: str,
                       dst: str) -> pd.DataFrame:
    """Single-frame BFS (the local plan and the per-test reference for
    the distributed twin): dict adjacency, level-by-level expansion."""
    adj: dict[str, list[str]] = {}
    for s, d in zip(edges[src].astype(str), edges[dst].astype(str)):
        adj.setdefault(s, []).append(d)
    depth = {s: 0 for s in seeds}
    frontier = sorted(depth)
    for k in range(1, max_depth + 1):
        nxt = sorted({d for s in frontier for d in adj.get(s, ())
                      if d not in depth})
        if not nxt:
            break
        for h in nxt:
            depth[h] = k
        frontier = nxt
    hosts = sorted(depth)
    return pd.DataFrame({
        "host": pd.Series(hosts, dtype="object"),
        "depth": pd.Series([depth[h] for h in hosts], dtype="int64")})


def crawl_depth(edges: rd.Dataset, seeds, max_depth: int = 8,
                src: str = "src_host", dst: str = "dst_host",
                num_buckets: int = 32,
                mode: str = "auto") -> rd.Dataset:
    """BFS crawl-depth assignment: minimum hop count from a SEED host
    set over the directed host graph — the frontier-scheduling signal
    a crawler uses to bound how far from its seed list it wanders
    (and the 'hops from trusted seeds' quality prior). Output one row
    per host reachable within ``max_depth``: ``(host, depth)``, seeds
    at depth 0 (emitted even if absent from the graph — a seed list
    is fetched regardless); unreachable / beyond-cap hosts are simply
    absent, exactly the pages the crawl never schedules.

    ``seeds``: list of host strings, or a Dataset with a ``host``
    column (a prior query's output — e.g. top-PageRank hosts).

    Distributed plan — level-synchronous BFS, ≤ ``max_depth`` rounds
    (the cap is the CRAWL's own policy knob, typically single-digit,
    so the round count is a policy constant, not a function of corpus
    size). Two regimes, switched by the ASSIGNED-host count against
    ``FRONTIER_BROADCAST_ROWS`` (host tables are tiny next to the
    page corpus — a broadcast cap of 2M hosts covers real crawls'
    host graphs, and the exchange regime covers the rest):

    * **broadcast regime** (assigned set fits the cap): the frontier
      AND the assigned-host set ship once per round via ``ray.put``;
      one streaming edge scan filters src∈frontier, uniques dsts
      per block, and drops already-assigned dsts IN the scan
      (vectorized ``is_in`` both ways — exact strings, no hashes, so
      no collision caveat); one ``bucketed_distinct`` exchange of
      the surviving NEW-host mentions (bounded by hub fan-in, never
      by E); the distinct level collects to the driver, which holds
      the depth table as plain lists. Zero joins, zero unions, one
      small exchange per round — the O(E) edge set never moves.
    * **exchange regime** (assigned set outgrew the cap): frontier
      semi-joins the edges (``hash_bucket_semi``) when it is itself
      too big to broadcast, the anti runs as a bucketed exchange
      against the assigned Dataset, and the depth table lives as a
      compacted Dataset — nothing O(hosts) on the driver.

    The regime switch happens mid-run the moment a level would push
    the assigned set (or a single level's distinct candidates) past
    the cap: the driver-side levels fold into a Dataset once, and
    BFS continues exchange-style. Measured motivation: the original
    always-exchange plan cost 3 materialized exchanges per round
    (~11 s/round of fixed cost on a 2.2M-edge soak graph); the
    broadcast regime runs the same soak's rounds on one small
    exchange each. The per-round streaming scan still reads every
    edge block (O(E·depth) COMPUTE, zero movement); the Pregel
    upgrade path — pre-bucket edges by src once, probe only frontier
    buckets — applies when that scan dominates. Set semantics make
    the result partitioning-invariant: every exchange is
    distinct/semi/anti on exact keys — no ordering, no floats."""
    if isinstance(seeds, rd.Dataset):
        seed_list = sorted({str(h) for h in
                            seeds.to_pandas()["host"].tolist()})
    else:
        seed_list = sorted({str(h) for h in seeds})
    if not seed_list:
        # pandas empty, not arrow: Ray's to_pandas on a 0-row arrow
        # Dataset drops the schema, and the gate compares column names
        return rd.from_pandas(pd.DataFrame({
            "host": pd.Series([], dtype="object"),
            "depth": pd.Series([], dtype="int64")}))

    if _resolve_mode(edges, mode) == "local":
        def proj(df: pd.DataFrame) -> pd.DataFrame:
            return df[[src, dst]]
        frame = edges.map_batches(proj, batch_format="pandas").to_pandas()
        if frame.empty:
            frame = pd.DataFrame({src: pd.Series([], dtype="object"),
                                  dst: pd.Series([], dtype="object")})
        return rd.from_pandas(
            _crawl_depth_frame(frame, seed_list, max_depth, src, dst))

    from .bucketed import bucketed_distinct
    from .joins import hash_bucket_semi

    def as_edge(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src].cast(pa.string()),
                         "dst": t[dst].cast(pa.string())})

    dedges = bucketed_distinct(
        edges.map_batches(as_edge, batch_format="pyarrow"),
        ["src", "dst"]).materialize()
    n_edges = dedges.count()

    def seed_table(k: int = 0) -> pa.Table:
        return pa.table({
            "host": pa.array(seed_list, pa.string()),
            "depth": pa.array(np.full(len(seed_list), k, np.int64))})

    if n_edges == 0:
        return rd.from_arrow(seed_table())
    dedges = _compact(dedges, n_edges, num_buckets)

    import ray

    # broadcast regime's driver state: the depth table as levels of
    # host lists (bounded by FRONTIER_BROADCAST_ROWS total) + the
    # exact assigned set for the collect-side rescreen
    levels: list[tuple[list[str], int]] | None = [(list(seed_list), 0)]
    assigned_set: set[str] = set(seed_list)
    # exchange regime's state (built lazily at the regime switch)
    assigned: rd.Dataset | None = None
    frontier: rd.Dataset | None = None
    frontier_hosts: list | None = list(seed_list)
    n_assigned = len(seed_list)

    def levels_table() -> pa.Table:
        hosts: list[str] = []
        depths: list[int] = []
        for hs, kk in levels:  # type: ignore[union-attr]
            hosts.extend(hs)
            depths.extend([kk] * len(hs))
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "depth": pa.array(depths, pa.int64())})

    def to_exchange_regime(level_ds: rd.Dataset | None) -> None:
        """Fold the driver-side depth table into a Dataset once; BFS
        continues with bucketed anti exchanges from here on."""
        nonlocal assigned, frontier, levels
        assigned = _compact(rd.from_arrow(levels_table()), n_assigned,
                            num_buckets)
        frontier = level_ds
        levels = None

    for k in range(1, max_depth + 1):
        if frontier_hosts is not None:
            # ship the frontier (and, in the broadcast regime, the
            # assigned set) ONCE via the object store; each edge block
            # filters with vectorized is_in — no exchange touches the
            # O(E) side, and already-assigned dsts die in the scan
            fref = ray.put(pa.array(frontier_hosts, pa.string()))
            aref = (ray.put(pa.array(sorted(assigned_set), pa.string()))
                    if levels is not None else None)

            def expand(t: pa.Table, _f=fref, _a=aref) -> pa.Table:
                import pyarrow.compute as pc
                sel = t.filter(pc.is_in(t["src"],
                                        value_set=ray.get(_f)))
                new = pc.unique(sel["dst"])
                if _a is not None:
                    new = new.filter(pc.invert(
                        pc.is_in(new, value_set=ray.get(_a))))
                return pa.table({"host": new})

            cand_raw = dedges.map_batches(expand,
                                          batch_format="pyarrow")
        else:
            def as_src(t: pa.Table) -> pa.Table:
                return pa.table({"src": t["host"]})

            cand_raw = hash_bucket_semi(
                dedges, frontier.map_batches(as_src,
                                             batch_format="pyarrow"),
                on="src", num_buckets=num_buckets,
            ).map_batches(lambda t: pa.table({"host": t["dst"]}),
                          batch_format="pyarrow")
        cand = bucketed_distinct(cand_raw, ["host"],
                                 num_buckets=num_buckets).materialize()
        # count BEFORE any collect/anti: a frontier with no outgoing
        # edges yields an all-empty cand whose Ray schema is None, and
        # the downstream schema probes would crash on it — and the
        # round would be wasted work anyway
        n_cand = cand.count()
        if n_cand == 0:
            break

        if levels is not None and (
                n_cand > FRONTIER_BROADCAST_ROWS
                or n_assigned + n_cand > FRONTIER_BROADCAST_ROWS):
            # this level outgrows the driver-side regime — fold and
            # fall through to the exchange path for this round
            to_exchange_regime(None)

        if levels is not None:
            # broadcast regime: the level is the collected candidates
            # minus an exact driver rescreen (the in-scan anti already
            # filtered per-block; the rescreen catches dsts assigned
            # THIS round's collect hasn't seen — there are none today,
            # but the set op is cheap and makes the invariant local)
            new_hosts = sorted(set(cand.to_pandas()["host"])
                               - assigned_set)
            if not new_hosts:
                break
            levels.append((new_hosts, k))
            assigned_set.update(new_hosts)
            n_assigned += len(new_hosts)
            frontier_hosts = new_hosts
            continue

        level = hash_bucket_semi(cand, assigned, on="host",
                                 anti=True,
                                 num_buckets=num_buckets).materialize()
        n_new = level.count()
        if n_new == 0:
            break

        depth_k = k  # bind per round for the closure below

        def with_depth(t: pa.Table) -> pa.Table:
            return pa.table({
                "host": t["host"],
                "depth": pa.array(np.full(t.num_rows, depth_k,
                                          np.int64))})

        level_k = level.map_batches(with_depth, batch_format="pyarrow")
        n_assigned += n_new
        # the union grows block count by the level's blocks every
        # round; the compaction repartition keeps the depth table's
        # block structure constant (resolve_redirects' measured
        # doubling pathology, same fix)
        assigned = _compact(assigned.union(level_k), n_assigned,
                            num_buckets)
        frontier = level
        if n_new <= FRONTIER_BROADCAST_ROWS:
            frontier_hosts = level.to_pandas()["host"].tolist()
        else:
            frontier_hosts = None
    if levels is not None:
        return rd.from_arrow(levels_table())
    return assigned


# ---------------------------------------------------------------------------
# Harmonic centrality (exact, lcm-scaled integer reciprocals)
# ---------------------------------------------------------------------------
def _harmonic_lcm(max_depth: int) -> int:
    """lcm(1..max_depth): the common denominator that makes the
    harmonic sum integer-exact (840 at the default depth 8)."""
    return int(np.lcm.reduce(np.arange(1, max_depth + 1,
                                       dtype=np.int64)))


_HARMONIC_EMPTY = {"host": "object", "harmonic_fp": "int64",
                   "n_reached": "int64", "harmonic": "float64"}


def _harmonic_empty() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t)
                         for c, t in _HARMONIC_EMPTY.items()})


def _harmonic_frame(edges: pd.DataFrame, max_depth: int, src: str,
                    dst: str) -> pd.DataFrame:
    """Single-frame exact harmonic centrality (local plan + the
    reference for the distributed twin): BFS forward from every
    source over a CSR adjacency; ``harmonic_fp(h) = sum_d n_d(h) *
    (L // d)`` where ``n_d(h)`` counts sources at shortest distance
    ``d <= max_depth`` from ``h`` and ``L = lcm(1..max_depth)`` —
    every step integer, the one float division is ``harmonic =
    harmonic_fp / L`` (identical expression in the SQL twin)."""
    L = _harmonic_lcm(max_depth)
    e = edges[[src, dst]].drop_duplicates()
    hosts = pd.unique(pd.concat([e[src], e[dst]], ignore_index=True))
    hosts = np.sort(hosts.astype(object))
    n = len(hosts)
    if n == 0:
        return _harmonic_empty()
    idx = pd.Index(hosts)
    si = idx.get_indexer(e[src]).astype(np.int64)
    di = idx.get_indexer(e[dst]).astype(np.int64)
    order = np.argsort(si, kind="stable")
    si, di = si[order], di[order]
    starts = np.searchsorted(si, np.arange(n + 1))
    fp = np.zeros(n, dtype=np.int64)
    reached = np.zeros(n, dtype=np.int64)
    dist = np.empty(n, dtype=np.int64)
    for s in range(n):
        dist.fill(-1)
        dist[s] = 0
        frontier = np.array([s], dtype=np.int64)
        for d in range(1, max_depth + 1):
            if not len(frontier):
                break
            outs = np.concatenate([di[starts[u]:starts[u + 1]]
                                   for u in frontier]) \
                if len(frontier) else np.empty(0, np.int64)
            outs = np.unique(outs)
            new = outs[dist[outs] < 0]
            if not len(new):
                break
            dist[new] = d
            fp[new] += L // d
            reached[new] += 1
            frontier = new
    return pd.DataFrame({"host": hosts, "harmonic_fp": fp,
                         "n_reached": reached,
                         "harmonic": fp / float(L)})


def harmonic_centrality(edges: rd.Dataset, max_depth: int = 8,
                        src: str = "src_host", dst: str = "dst_host",
                        num_buckets: int = 32,
                        mode: str = "auto") -> rd.Dataset:
    """EXACT harmonic centrality over the host graph — the ranking
    Common Crawl actually publishes for hosts (harmonic centrality,
    Boldi & Vigna 2014): ``H(h) = sum_{s reaches h} 1 / d(s, h)``,
    truncated at ``max_depth`` hops (the same single-digit policy cap
    as ``crawl_depth`` — beyond it 1/d contributions are < 1/8 and
    real systems truncate or approximate). Output: ``(host,
    harmonic_fp, n_reached, harmonic)``; ``harmonic_fp`` is the
    integer ``sum n_d * (lcm(1..max_depth) // d)``, so results are
    bit-identical across plans/partitionings and vs the oracle's
    recursive-CTE replay — float 1/d sums would differ in the last
    ulp by summation order.

    Distributed plan — level-synchronous MULTI-SOURCE BFS: per-round
    state is the Dataset of discovered ``(src, host)`` pairs, i.e.
    O(sum of ball sizes), the honest cost of exact centrality. Per
    round: ONE hash-bucket join of the frontier pairs into the static
    distinct-edge set, one compound ``bucketed_distinct``, one
    bucketed ANTI filter against the visited-pair keys, and one tiny
    per-round (host, n_d) partial aggregate; the per-round partials
    carry integer weight ``L // d`` into a final bucketed sum. At
    web-host scale the full-source exact plan is the bounded-graph /
    soak verifier; production estimates harmonic centrality from a
    SOURCE SAMPLE (pass the sampled sub-frontier as ``edges``'
    sources via a pre-filter) or a HyperBall sketch — the exact plan
    here is the ground truth those estimates are validated against."""
    cols = [src, dst]
    if _resolve_mode(edges, mode) == "local":
        frame = edges.map_batches(lambda df: df[cols],
                                  batch_format="pandas").to_pandas()
        if frame.empty:
            frame = pd.DataFrame({c: pd.Series([], dtype="object")
                                  for c in cols})
        return rd.from_pandas(_harmonic_frame(frame, max_depth,
                                              src, dst))

    from .bucketed import bucketed_agg, bucketed_distinct
    from .joins import hash_bucket_join, hash_bucket_semi

    L = _harmonic_lcm(max_depth)
    dedges = bucketed_distinct(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow"),
        [src, dst]).materialize()
    n_edges = dedges.count()
    dedges = _compact(dedges, n_edges, num_buckets)

    def one_side(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"host": t[col].cast(pa.string())})
        return f

    hosts = bucketed_distinct(
        dedges.map_batches(one_side(src), batch_format="pyarrow")
        .union(dedges.map_batches(one_side(dst), batch_format="pyarrow")),
        ["host"]).materialize()
    n = hosts.count()
    hosts = _compact(hosts, n, num_buckets)
    if n == 0:
        return rd.from_pandas(_harmonic_empty())

    def pack_key(t: pa.Table) -> pa.Table:
        # exact compound visited key (string concat — collision-free
        # by construction: '|' never appears in a hostname)
        k = pc.binary_join_element_wise(
            t["psrc"].cast(pa.string()), t["host"].cast(pa.string()),
            "|")
        return t.append_column("key", k)

    def self_pairs(t: pa.Table) -> pa.Table:
        base = pa.table({"psrc": t["host"], "host": t["host"]})
        return pack_key(base)

    frontier = hosts.map_batches(self_pairs,
                                 batch_format="pyarrow").materialize()
    visited = frontier.map_batches(lambda t: t.select(["key"]),
                                   batch_format="pyarrow").materialize()
    round_parts: list[rd.Dataset] = []
    nb_v = max(1, min(num_buckets, n // 500_000 + 1))
    nb_new = nb_v
    # TWO exchanges per round (round-4 verdict #4 — was five): the
    # expansion join pre-dedupes pairs inside each src-bucket and the
    # distinct COMPLETES inside the anti filter's own exchange
    # (hash_bucket_semi(left_unique=True) — the key lands wholly in
    # one bucket); the per-round (host, n_d) counts are per-BLOCK
    # partials over the compacted frontier (no exchange — the one
    # final bucketed sum over all rounds' partials finishes them).
    # The frontier compacts right after the semi (its ~200 shuffle
    # output blocks feed THREE consumers) and visited re-compacts per
    # round — a lazy-union cadence was measured 27% SLOWER at sf0.1:
    # task-launch cost per accumulated tiny block beats the exchange
    # it saves (the _compact docstring's lesson).
    for d in range(1, max_depth + 1):
        def as_edge_key(t: pa.Table) -> pa.Table:
            return pa.table({src: t["host"], "psrc": t["psrc"]})

        def expand(t: pa.Table) -> pa.Table:
            out = pa.table({"psrc": t["psrc"], "host": t[dst]})
            # in-bucket combiner: duplicate (psrc, host) pairs from
            # different co-bucketed srcs collapse before the shuffle
            return pack_key(out.group_by(["psrc", "host"])
                            .aggregate([]).select(["psrc", "host"]))

        nxt = hash_bucket_join(
            dedges,
            frontier.map_batches(as_edge_key, batch_format="pyarrow"),
            on=src, num_buckets=num_buckets, post_merge=expand)
        # the compaction repartition is LAZY on the semi's plan, so it
        # rides the same execution (no second pass over materialized
        # blocks); its size estimate is the previous round's frontier
        new = (hash_bucket_semi(nxt, visited, on="key",
                                num_buckets=num_buckets,
                                anti=True, left_unique=True)
               .repartition(nb_new).materialize())
        n_new = new.count()
        if n_new == 0:
            break
        nb_new = max(1, min(num_buckets, n_new // 500_000 + 1))
        w = L // d
        round_parts.append(new.map_batches(
            lambda t, _w=w: (
                lambda g: pa.table({
                    "host": g["host"],
                    "fp": pc.multiply(g["count_all"].cast(pa.int64()),
                                      pa.scalar(_w, pa.int64())),
                    "n_d": g["count_all"].cast(pa.int64())})
            )(t.group_by("host").aggregate([([], "count_all")])),
            batch_format="pyarrow"))
        # `new` is already compacted, so its key projection adds only
        # nb_new blocks — the union stays lazy on odd rounds and the
        # repartition+materialize (one execution) runs every second
        # round, halving the per-round launch cost without letting
        # tiny blocks pile up
        visited = visited.union(
            new.map_batches(lambda t: t.select(["key"]),
                            batch_format="pyarrow"))
        if d % 2 == 0 or d == max_depth:
            visited = visited.repartition(max(nb_v, d)).materialize()
        frontier = new

    if not round_parts:
        totals = None
    else:
        parts = round_parts[0]
        for p in round_parts[1:]:
            parts = parts.union(p)
        totals = bucketed_agg(parts, "host",
                              {"harmonic_fp": ("fp", "sum"),
                               "n_reached": ("n_d", "sum")},
                              num_buckets=num_buckets)

    def zeros(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), dtype=np.int64)
        return pa.table({"host": t["host"],
                         "harmonic_fp": pa.array(z),
                         "n_reached": pa.array(z),
                         "harmonic": pa.array(z.astype(np.float64))})

    if totals is None:
        return hosts.map_batches(zeros, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        fp = (pc.fill_null(t["harmonic_fp"], 0).cast(pa.int64())
              .to_numpy(zero_copy_only=False).astype(np.int64))
        nr = (pc.fill_null(t["n_reached"], 0).cast(pa.int64())
              .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"host": t["host"],
                         "harmonic_fp": pa.array(fp),
                         "n_reached": pa.array(nr),
                         "harmonic": pa.array(fp / float(L))})

    return hash_bucket_join(hosts, totals, on="host", how="left",
                            num_buckets=num_buckets, post_merge=finish)


# ---------------------------------------------------------------------------
# HyperBall centrality (Boldi & Vigna 2013 — the approximate scale path)
# ---------------------------------------------------------------------------
#: HLL precision: m = 2^p registers per host (p=10 -> 1 KiB/host,
#: ~3.2% standard error — the precision Common Crawl-scale rankings
#: actually run; the EXACT ``harmonic_centrality`` is the verifier)
HLL_P_DEFAULT = 10


def _hll_init(hosts, p: int) -> np.ndarray:
    """(n, m) uint8 HLL registers, each row the sketch of {host}.
    Hash = blake2b-64 of the host string (process-stable, seedless);
    register index = low p bits, rho = leading-zero count of the
    remaining 64-p bits + 1 (frozen, shared by every plan)."""
    import hashlib
    m = 1 << p
    regs = np.zeros((len(hosts), m), dtype=np.uint8)
    for i, h in enumerate(hosts):
        hv = int.from_bytes(hashlib.blake2b(
            str(h).encode(), digest_size=8).digest(), "big")
        idx = hv & (m - 1)
        w = hv >> p
        regs[i, idx] = (64 - p) - w.bit_length() + 1
    return regs


def _hll_est(regs2d: np.ndarray) -> np.ndarray:
    """Row-wise HLL cardinality estimate (frozen float64 expression:
    alpha*m^2 / sum 2^-M with the standard small-range correction
    m*ln(m/V); the register-order sum is a fixed-shape numpy axis-1
    reduction, so every plan computes the bit-identical float)."""
    m = regs2d.shape[1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = np.ldexp(1.0, -regs2d.astype(np.int64)).sum(axis=1)
    raw = alpha * m * m / s
    v = (regs2d == 0).sum(axis=1)
    small = (raw <= 2.5 * m) & (v > 0)
    out = raw.copy()
    out[small] = m * np.log(m / v[small])
    return out


def _hyperball_frame(edges: pd.DataFrame, max_depth: int, p: int,
                     src: str, dst: str) -> pd.DataFrame:
    """Single-frame HyperBall (local plan + the distributed twin's
    reference): in-ball sketches grow by ball_in(h, d) = {h} ∪
    ⋃_{(s,h)∈E} ball_in(s, d-1) — one order-free elementwise register
    max per round; harmonic += max(est_d - est_{d-1}, 0) / d."""
    e = edges[[src, dst]].drop_duplicates()
    hosts = pd.unique(pd.concat([e[src], e[dst]], ignore_index=True))
    hosts = np.sort(hosts.astype(object))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": pd.Series([], dtype="object"),
                             "est_reach": pd.Series([], dtype="float64"),
                             "harmonic_est": pd.Series([], dtype="float64")})
    idx = pd.Index(hosts)
    si = idx.get_indexer(e[src]).astype(np.int64)
    di = idx.get_indexer(e[dst]).astype(np.int64)
    regs = _hll_init(hosts, p)
    prev = _hll_est(regs)
    harm = np.zeros(n, dtype=np.float64)
    for d in range(1, max_depth + 1):
        new = regs.copy()
        np.maximum.at(new, di, regs[si])
        regs = new
        est = _hll_est(regs)
        harm += np.maximum(est - prev, 0.0) / d
        prev = est
    return pd.DataFrame({"host": hosts, "est_reach": prev,
                         "harmonic_est": harm})


def hyperball_centrality(edges: rd.Dataset, max_depth: int = 8,
                         p: int = HLL_P_DEFAULT,
                         src: str = "src_host", dst: str = "dst_host",
                         num_buckets: int = 32,
                         mode: str = "auto") -> rd.Dataset:
    """APPROXIMATE harmonic centrality via HyperBall (Boldi & Vigna,
    "In-core computation of geometric centralities with HyperBall",
    2013) — the sketch Common Crawl-scale rankings actually run, with
    ``harmonic_centrality`` as its exact verifier (the repo's LSH/IVF
    doctrine: approximate scale path + exact ground truth).

    Per host, an HLL counter sketches its IN-ball; each round merges
    every in-neighbour's round-(d-1) counter (elementwise register
    max — exact, order-free, mergeable) and adds the estimated ball
    growth over d to the harmonic accumulator. Output: (host,
    est_reach, harmonic_est). Every float step is a frozen pure
    function of the (exact) registers, so local == distributed
    BIT-equal (pinned by test); accuracy vs exact is ~1/sqrt(m).

    Distributed plan: counters live as a (host, regs:binary(2^p),
    prev_est, harm) Dataset — O(hosts) rows x 2^p bytes. Per round:
    ONE hash-bucket join of counters into the static distinct-edge
    set on src (shipping m-byte registers along each edge — the
    documented HyperBall exchange cost), a union with the self rows,
    and one bucketed per-host merge computing the register max, the
    estimate, and the harmonic increment in a single pass. No driver
    state; max_depth (the same single-digit policy cap as the exact
    plan) bounds the rounds."""
    cols = [src, dst]
    if _resolve_mode(edges, mode) == "local":
        frame = edges.map_batches(lambda df: df[cols],
                                  batch_format="pandas").to_pandas()
        if frame.empty:
            frame = pd.DataFrame({c: pd.Series([], dtype="object")
                                  for c in cols})
        return rd.from_pandas(_hyperball_frame(frame, max_depth, p,
                                               src, dst))

    from .bucketed import bucketed_distinct
    from .joins import hash_bucket_join

    m = 1 << p
    dedges = bucketed_distinct(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow"),
        [src, dst]).materialize()
    dedges = _compact(dedges, dedges.count(), num_buckets)

    def one_side(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"host": t[col].cast(pa.string())})
        return f

    hosts = bucketed_distinct(
        dedges.map_batches(one_side(src), batch_format="pyarrow")
        .union(dedges.map_batches(one_side(dst), batch_format="pyarrow")),
        ["host"]).materialize()
    n = hosts.count()
    hosts = _compact(hosts, n, num_buckets)
    if n == 0:
        return rd.from_pandas(pd.DataFrame({
            "host": pd.Series([], dtype="object"),
            "est_reach": pd.Series([], dtype="float64"),
            "harmonic_est": pd.Series([], dtype="float64")}))

    def seed(t: pa.Table) -> pa.Table:
        hs = np.asarray(t["host"].to_pylist(), dtype=object)
        regs = _hll_init(hs, p)
        # serialize ONCE, slice per host — tobytes() inside the
        # per-host loop re-copied the whole block matrix each
        # iteration (quadratic: stalled the 1M-host soak outright)
        buf = regs.tobytes(order="C")
        return pa.table({
            "host": t["host"],
            "regs": pa.array([buf[i * m:(i + 1) * m]
                              for i in range(len(hs))],
                             pa.binary()),
            "prev_est": pa.array(_hll_est(regs)),
            "harm": pa.array(np.zeros(len(hs)))})

    counters = hosts.map_batches(seed,
                                 batch_format="pyarrow").materialize()
    nb_r = max(1, min(num_buckets, n // 100_000 + 1))

    for d in range(1, max_depth + 1):
        def as_src(t: pa.Table) -> pa.Table:
            return pa.table({src: t["host"], "regs": t["regs"]})

        def contrib(t: pa.Table) -> pa.Table:
            # in-neighbour sketches addressed to their edge's dst
            return pa.table({"host": t[dst], "regs": t["regs"],
                             "prev_est": pa.nulls(len(t), pa.float64()),
                             "harm": pa.nulls(len(t), pa.float64()),
                             "is_self": pa.array([False] * len(t))})

        moved = hash_bucket_join(
            dedges, counters.map_batches(as_src, batch_format="pyarrow"),
            on=src, num_buckets=num_buckets, post_merge=contrib)
        selves = counters.map_batches(
            lambda t: t.append_column("is_self",
                                      pa.array([True] * len(t))),
            batch_format="pyarrow")

        def tag(t: pa.Table) -> pa.Table:
            key = pa.table({"host": t["host"]})
            from .joins import _bucket_of
            return t.append_column(
                "__b", _bucket_of(key, ["host"], num_buckets))

        def merge(g: pd.DataFrame, _d=d) -> pd.DataFrame:
            """Array path — one stable sort groups the bucket by host,
            ``np.maximum.reduceat`` folds every group's registers in
            one call, and ``_hll_est`` estimates all groups row-wise;
            the pandas per-group iteration measured ~0.3 ms/host
            (most of the 1M-host soak's wall). Bit-identical: the
            register max is exact and the estimate is the same frozen
            row-wise expression."""
            n_rows = len(g)
            if n_rows == 0:
                return pd.DataFrame({"host": [], "regs": [],
                                     "prev_est": [], "harm": []})
            hosts_a = g["host"].to_numpy()
            order = np.argsort(hosts_a, kind="stable")
            hosts_s = hosts_a[order]
            regs = np.frombuffer(
                b"".join(g["regs"].iloc[order]), dtype=np.uint8) \
                .reshape(n_rows, m)
            new_grp = np.r_[True, hosts_s[1:] != hosts_s[:-1]]
            starts = np.flatnonzero(new_grp)
            merged = np.maximum.reduceat(regs, starts, axis=0)
            # each group's SELF row carries its running (prev_est,
            # harm) — every merged host has exactly one (the union
            # always includes the counters side)
            gid = np.cumsum(new_grp) - 1
            is_self = g["is_self"].to_numpy()[order].astype(bool)
            self_rows = np.full(len(starts), -1, dtype=np.int64)
            self_rows[gid[is_self]] = np.flatnonzero(is_self)
            if (self_rows < 0).any():
                raise ValueError("hyperball: contribution host "
                                 "missing from the host universe")
            prev_est = g["prev_est"].to_numpy()[order][self_rows] \
                .astype(np.float64)
            harm = g["harm"].to_numpy()[order][self_rows] \
                .astype(np.float64)
            est = _hll_est(merged)
            harm = harm + np.maximum(est - prev_est, 0.0) / _d
            buf = merged.tobytes(order="C")
            return pd.DataFrame({
                "host": hosts_s[starts],
                "regs": [buf[i * m:(i + 1) * m]
                         for i in range(len(starts))],
                "prev_est": est,
                "harm": harm})

        counters = (moved.union(selves)
                    .map_batches(tag, batch_format="pyarrow")
                    .groupby("__b")
                    .map_groups(merge, batch_format="pandas")
                    .repartition(nb_r).materialize())

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"],
                         "est_reach": t["prev_est"],
                         "harmonic_est": t["harm"]})

    return counters.map_batches(out, batch_format="pyarrow")
