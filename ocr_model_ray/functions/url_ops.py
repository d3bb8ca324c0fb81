"""URL operators for web-corpus pipelines: canonicalization, URL-level
dedup, host aggregates, host blocklist filtering.

Engine extension (no reference counterpart): web training corpora key
pages by URL. C4 (Raffel et al., 2020) dedupes at exactly URL
granularity; RefinedWeb/FineWeb filter against host blocklists and
compute host-level quality statistics before any content-level pass.
These operators provide that layer over any table with a url:string
column (the BASELINE.json input_hint pages shape).

Canonicalization rules — mirrored EXACTLY by the SQL oracle in
``__ray_entry__.py`` (``_canon_url_sql``); change the two together:

 1. the fragment (first ``#`` onward) is dropped;
 2. scheme and host[:port] are lowercased; path/query case is kept;
 3. default ports are stripped (``:80`` for http, ``:443`` for https);
 4. an empty path becomes ``/``;
 5. query params are split on ``&``; empty params and tracking params
    (``utm_*``, ``fbclid``, ``gclid``) are dropped; the remainder are
    sorted bytewise and rejoined; an emptied query drops its ``?``.

A url that does not parse as ``scheme://host...`` canonicalizes to
NULL and is excluded from dedup/host aggregation (SQL NULL-key
semantics; the exclusion is logged, never silent).

Scale shape: every kernel is a per-batch pandas/regex vectorized
transform (one ``str.extract`` over the batch; the query-param pass is
an explode → sort → group-join over only the rows that HAVE a query).
``url_dedup`` and ``host_stats`` route their wide step through
``bucketed_agg`` — one bucketed exchange of (key, id) rows, vectorized
per-bucket groupby, unbounded key domains welcome. The blocklist
broadcasts once via ``ray.put`` (sorted array + ``np.searchsorted``
membership), never per batch.
"""

from __future__ import annotations

import logging
import re
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

log = logging.getLogger("ocr_model_ray.url_ops")

#: scheme :// host[:port] path [? query]  (fragment already stripped)
_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?")
#: tracking params dropped by rule 5 (name match, with or without '=')
_TRACKING_RE = re.compile(r"^(utm_[^=]*|fbclid|gclid)(=.*)?$")
_HOST_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]*)")


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonical form per the module rules; NULL for
    non-parsing urls (and for null input, like SQL)."""
    urls = urls.astype("object")
    base = urls.str.split("#", n=1).str[0]
    ext = base.str.extract(_URL_RE)
    scheme = ext[0].str.lower()
    hostport = ext[1].str.lower()
    path, query = ext[2], ext[3]
    hostport = hostport.mask(
        (scheme == "http") & hostport.str.endswith(":80", na=False),
        hostport.str[:-3])
    hostport = hostport.mask(
        (scheme == "https") & hostport.str.endswith(":443", na=False),
        hostport.str[:-4])
    path = path.mask(path == "", "/")

    q = query.fillna("")
    q2 = pd.Series("", index=urls.index, dtype="object")
    has_q = q != ""
    if has_q.any():
        parts = q[has_q].str.split("&").explode().rename("p")
        parts = parts[(parts != "")
                      & ~parts.str.match(_TRACKING_RE, na=False)]
        if len(parts):
            joined = (parts.reset_index()
                      .sort_values(["index", "p"])
                      .groupby("index", sort=False)["p"]
                      .agg("&".join))
            q2.update(joined)
    return scheme + "://" + hostport + path + q2.mask(q2 != "", "?" + q2)


def host_series(urls: pd.Series) -> pd.Series:
    """Lowercased host (port stripped) per url; NULL when unparsable."""
    return (urls.astype("object").str.extract(_HOST_RE)[0].str.lower())


def canonicalize_urls(ds: rd.Dataset, url_col: str = "url",
                      out_col: str = "canon_url") -> rd.Dataset:
    """Append ``out_col`` with the canonical form of ``url_col``."""
    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df[out_col] = canonicalize_series(df[url_col])
        return df

    return ds.map_batches(add, batch_format="pandas")


def url_dedup(ds: rd.Dataset, url_col: str = "url",
              id_col: str = "doc_id",
              num_buckets: int = 64) -> rd.Dataset:
    """URL-level exact dedup (the C4 step): group by canonical url,
    keep the min id. Output: (canon_url, keep_id, n_dupes), one row per
    distinct canonical url, streaming. Unparsable urls are dropped from
    the key domain (logged per batch); one bucketed exchange of
    (canon_url, id) rows total."""
    from .bucketed import bucketed_agg

    def project(df: pd.DataFrame) -> pd.DataFrame:
        canon = canonicalize_series(df[url_col])
        bad = int(canon.isna().sum())
        if bad:
            log.warning("url_dedup: dropped %d unparsable urls", bad)
        keep = canon.notna().to_numpy()
        return pd.DataFrame({
            "canon_url": canon.to_numpy()[keep],
            id_col: df[id_col].to_numpy()[keep]})

    projected = ds.map_batches(project, batch_format="pandas")
    return bucketed_agg(projected, "canon_url",
                        {"keep_id": (id_col, "min"),
                         "n_dupes": (id_col, "size")},
                        num_buckets=num_buckets)


def host_stats(ds: rd.Dataset, url_col: str = "url",
               agg_cols: dict[str, tuple[str, str]] | None = None,
               num_buckets: int = 64) -> rd.Dataset:
    """Per-host aggregates (the RefinedWeb host-stats pass). Default
    output: (host, n_docs); pass ``agg_cols`` in pandas NamedAgg form
    to add metrics (e.g. ``{"total_chars": ("n_chars", "sum")}``).
    Unparsable urls are excluded (logged). One bucketed exchange."""
    from .bucketed import bucketed_agg
    aggs = {"n_docs": (url_col, "size")}
    aggs.update(agg_cols or {})
    needed = sorted({c for c, _f in aggs.values()} - {url_col})

    def project(df: pd.DataFrame) -> pd.DataFrame:
        host = host_series(df[url_col])
        bad = int(host.isna().sum())
        if bad:
            log.warning("host_stats: dropped %d unparsable urls", bad)
        keep = host.notna().to_numpy()
        out = pd.DataFrame({"host": host.to_numpy()[keep],
                            url_col: df[url_col].to_numpy()[keep]})
        for c in needed:
            out[c] = df[c].to_numpy()[keep]
        return out

    projected = ds.map_batches(project, batch_format="pandas")
    return bucketed_agg(projected, "host", aggs,
                        num_buckets=num_buckets)


def host_quality_filter(ds: rd.Dataset, url_col: str = "url",
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        min_mean_words: float = 50.0,
                        num_buckets: int = 64) -> rd.Dataset:
    """Host-level quality gate (the FineWeb-style pass): drop EVERY
    document from a host whose mean whitespace-token count per doc is
    below ``min_mean_words``. Output: (id_col, host) of survivors.

    Two passes over the corpus:

    * pass 1 streams once, emitting per-batch per-host partials
      (sum n_words, n docs — int-exact, the combiner), finished by one
      ``bucketed_agg`` exchange of tiny int rows; the mean is an exact
      int/int double division (bit-identical to the SQL oracle's).
    * the PASSING host names collect and broadcast via ``ray.put``
      (the good-host set is bounded by distinct hosts, ~30 B each —
      fine to ~10^8 hosts; beyond that swap the broadcast for a
      ``hash_bucket_join`` on host, same pass-2 seam).
    * pass 2 streams again, keeping rows whose host is in the set
      (vectorized searchsorted membership).

    Unparsable urls have no host and never survive (SQL inner-join
    semantics)."""
    from .bucketed import bucketed_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        host = host_series(df[url_col])
        text = df[text_col]
        stripped = text.str.strip()
        n_words = stripped.str.split().str.len().fillna(0).astype(
            "int64")
        n_words[stripped == ""] = 0
        g = pd.DataFrame({"host": host, "w": n_words})
        g = g[host.notna().to_numpy()]
        return g.groupby("host", as_index=False).agg(
            w=("w", "sum"), n=("w", "size"))

    partials = ds.map_batches(partial, batch_format="pandas")
    stats = bucketed_agg(partials, "host",
                         {"w": ("w", "sum"), "n": ("n", "sum")},
                         num_buckets=num_buckets)

    def good_hosts(df: pd.DataFrame) -> pd.DataFrame:
        ok = (df["w"].to_numpy() / df["n"].to_numpy()) >= min_mean_words
        return df.loc[ok, ["host"]]

    good = stats.map_batches(good_hosts,
                             batch_format="pandas").to_pandas()
    hosts = (np.sort(good["host"].to_numpy())
             if not good.empty and "host" in good.columns
             else np.empty(0, dtype=object))
    log.info("host_quality_filter: %d hosts pass (broadcast %.1f KB)",
             hosts.size, hosts.nbytes / 1e3)
    ref = ray.put(hosts)

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        ok_hosts = ray.get(ref)
        host = host_series(df[url_col])
        if ok_hosts.size == 0:
            keep = np.zeros(len(df), dtype=bool)
        else:
            h = host.fillna("").to_numpy()
            idx = np.searchsorted(ok_hosts, h)
            np.minimum(idx, ok_hosts.size - 1, out=idx)
            keep = (ok_hosts[idx] == h) & host.notna().to_numpy()
        return pd.DataFrame({id_col: df[id_col].to_numpy()[keep],
                             "host": host.to_numpy()[keep]})

    return ds.map_batches(cut, batch_format="pandas")


def crawl_diff(old: rd.Dataset, new: rd.Dataset, key: str = "url",
               fp_col: str = "fp",
               num_buckets: int = 64) -> rd.Dataset:
    """Snapshot diff between two crawls of the same url space: one row
    per url with status ``new`` (only in the new crawl), ``gone``
    (only in the old), ``changed`` (both, fingerprints differ), or
    ``same`` — the incremental-recrawl primitive (process only
    new+changed, tombstone gone).

    Inputs are (key, fp_col) streams — fp is any content fingerprint
    (md5 of text, simhash, etc.); the key must be UNIQUE per crawl
    (run ``url_dedup``/``bucketed_argmax`` upstream otherwise; with
    duplicate keys the per-bucket outer merge would emit cross
    products). One bucketed exchange of (key, fp) rows total — both
    sides shuffle once through the shared ``hash_bucket_join``; texts
    never move."""
    from .joins import hash_bucket_join

    def proj(side):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({key: df[key], side: df[fp_col]})
        return f

    o = old.map_batches(proj("__fp_old"), batch_format="pandas")
    n = new.map_batches(proj("__fp_new"), batch_format="pandas")
    joined = hash_bucket_join(o, n, on=key, how="outer",
                              num_buckets=num_buckets)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        fo, fn = df["__fp_old"], df["__fp_new"]
        status = np.where(
            fo.isna(), "new",
            np.where(fn.isna(), "gone",
                     np.where(fo == fn, "same", "changed")))
        return pd.DataFrame({key: df[key],
                             "status": pd.array(status,
                                                dtype="object")})

    return joined.map_batches(classify, batch_format="pandas")


def host_filter(ds: rd.Dataset, blocked: Iterable[str],
                url_col: str = "url", keep: bool = False) -> rd.Dataset:
    """Drop (or with ``keep=True``, retain only) rows whose host is in
    ``blocked``. The list is sorted, broadcast ONCE via ``ray.put``,
    and membership is a vectorized ``searchsorted`` per batch — a
    million-host blocklist is ~30 MB in every worker's plasma view,
    never re-shipped. Unparsable-url rows never match (host NULL), so
    they pass a blocklist and fail an allowlist, like SQL ``IN``."""
    arr = np.array(sorted(set(blocked)), dtype=object)
    ref = ray.put(arr)

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        bl = ray.get(ref)
        host = host_series(df[url_col])
        if bl.size == 0:
            hit = np.zeros(len(df), dtype=bool)
        else:
            h = host.fillna("").to_numpy()
            idx = np.searchsorted(bl, h)
            np.minimum(idx, bl.size - 1, out=idx)
            hit = (bl[idx] == h) & host.notna().to_numpy()
        return df[hit if keep else ~hit]

    return ds.map_batches(cut, batch_format="pandas")


def host_mirror_pairs(ds: rd.Dataset, host_col: str = "host",
                      key_col: str = "h", threshold: float = 0.3,
                      num_buckets: int = 64,
                      max_hosts_per_key: int | None = None) -> rd.Dataset:
    """Mirror-host detection: host pairs whose CONTENT-KEY SETS overlap
    with Jaccard >= ``threshold`` (Common Crawl drops mirror sites this
    way — two hosts serving largely identical documents).

    Input: any (host, key) stream where ``key`` identifies a piece of
    content (md5 of the page text, a simhash, a canonical-url hash).
    Exact set semantics end-to-end:

      distinct (host, key)  — one bucketed exchange
      -> group by key, pair the hosts sharing it (vectorized sort +
         triangle indices per group, the _pairs_in_frame shape)
      -> per-pair intersection counts — one bucketed exchange
      -> per-host set sizes — one bucketed exchange on the same stream
      -> sizes join in, J = i / (n_a + n_b - i)  (one float division,
         bit-exact vs the SQL twin)

    A key shared by k hosts yields k(k-1)/2 pair rows — boilerplate
    texts ("404 not found") can make k huge at web scale. The guard is
    OPT-IN (``max_hosts_per_key``): keys above the cap are dropped
    whole and the drop is LOGGED (never silent); the default (None)
    keeps exact semantics so the oracle comparison stays equality.
    Output: (host_a, host_b, n_inter, n_a, n_b, jaccard)."""
    import pyarrow as pa

    from .bucketed import bucketed_agg, bucketed_distinct
    from .joins import hash_bucket_join

    def proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # NULL keys (e.g. md5 of a NULL text) identify nothing — drop
        # them BEFORE pairing: the SQL twin's equijoin never matches
        # NULLs, and a stringified None would otherwise form a bogus
        # shared-'None' group pairing unrelated hosts
        out = pa.table({"host": t[host_col].cast(pa.string()),
                        "k": t[key_col]})
        return out.filter(pc.is_valid(out["k"]))

    pairs_src = bucketed_distinct(
        ds.map_batches(proj, batch_format="pyarrow"),
        ["host", "k"]).materialize()
    # coalesce the distinct stream before the fan of downstream
    # shuffles (link_graph._compact rationale: groupby outputs inherit
    # ~200 partitions regardless of size and every later exchange pays
    # O(map_blocks x reduce_partitions))
    from .link_graph import _compact
    pairs_src = _compact(pairs_src, pairs_src.count(), num_buckets)

    sizes = bucketed_agg(pairs_src, "host", {"n": ("k", "size")},
                         num_buckets=num_buckets)

    def add_kb(df: pd.DataFrame) -> pd.DataFrame:
        kb = pd.util.hash_array(df["k"].to_numpy()) % num_buckets
        return df.assign(__kb=kb.astype(np.int32))

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["host"].to_numpy(),
                            g["k"].to_numpy().astype(str)))
        ks = g["k"].to_numpy().astype(str)[order]
        hs = g["host"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        out_a, out_b = [], []
        n_dropped = 0
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if max_hosts_per_key is not None and n > max_hosts_per_key:
                n_dropped += 1
                continue
            iu = np.triu_indices(n, k=1)
            out_a.append(hs[s:e][iu[0]])
            out_b.append(hs[s:e][iu[1]])
        if n_dropped:
            log.warning("host_mirror_pairs: %d keys above "
                        "max_hosts_per_key=%s dropped whole",
                        n_dropped, max_hosts_per_key)
        import pyarrow as pa
        if not out_a:
            # typed arrow empty: an object-dtype empty pandas frame
            # becomes arrow `null` type and poisons the downstream join
            return pa.table({"host_a": pa.array([], pa.string()),
                             "host_b": pa.array([], pa.string())})
        return pa.table({"host_a": pa.array(np.concatenate(out_a)),
                         "host_b": pa.array(np.concatenate(out_b))})

    pair_rows = (pairs_src.map_batches(add_kb, batch_format="pandas")
                 .groupby("__kb")
                 .map_groups(pairs_in_group, batch_format="pandas"))
    inter = bucketed_agg(pair_rows, ["host_a", "host_b"],
                         {"n_inter": ("host_a", "size")},
                         num_buckets=num_buckets)

    def typed_inter(df: pd.DataFrame):
        import pyarrow as pa
        # empty reduce partitions emit schema-less pandas blocks; the
        # arrow join downstream would infer `null` for their columns
        if df.empty or "host_a" not in df.columns:
            return pa.table({"host_a": pa.array([], pa.string()),
                             "host_b": pa.array([], pa.string()),
                             "n_inter": pa.array([], pa.int64())})
        return pa.table({
            "host_a": pa.array(df["host_a"], pa.string()),
            "host_b": pa.array(df["host_b"], pa.string()),
            "n_inter": pa.array(df["n_inter"].astype("int64"))})

    inter = inter.map_batches(typed_inter,
                              batch_format="pandas").materialize()
    if inter.count() == 0:
        import pyarrow as pa
        return rd.from_arrow(pa.table({
            "host_a": pa.array([], pa.string()),
            "host_b": pa.array([], pa.string()),
            "n_inter": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))

    def size_as(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({col: t["host"],
                             f"n_{col[-1]}": t["n"].cast(pa.int64())})
        return f

    with_a = hash_bucket_join(
        inter, sizes.map_batches(size_as("host_a"), batch_format="pyarrow"),
        on="host_a", num_buckets=num_buckets)
    with_ab = hash_bucket_join(
        with_a, sizes.map_batches(size_as("host_b"), batch_format="pyarrow"),
        on="host_b", num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        i = t["n_inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = i.astype(np.float64) / (na + nb - i).astype(np.float64)
        out = pa.table({"host_a": t["host_a"], "host_b": t["host_b"],
                        "n_inter": pa.array(i), "n_a": pa.array(na),
                        "n_b": pa.array(nb), "jaccard": pa.array(j)})
        return out.filter(pa.compute.greater_equal(out["jaccard"],
                                                   threshold))

    return with_ab.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------------- robots.txt

_PATH_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)")


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """RFC 9309 (Robots Exclusion Protocol) parser — the governing
    group's (allow, path-prefix) rules for ``agent``.

    Implemented semantics: groups are runs of ``User-agent`` lines
    followed by directives; an exact (case-insensitive) agent match
    beats the ``*`` group; ``Allow``/``Disallow`` only (other
    directives ignored); an empty ``Disallow:`` value means allow-all
    and yields no rule. The RFC's wildcard extensions are SUPPORTED:
    ``*`` in a rule matches any character run and a trailing ``$``
    anchors the rule at the path end (``robots_filter`` compiles such
    rules to anchored regexes; a ``$`` anywhere else is literal).
    Rule specificity is the raw rule-string octet length, the RFC's
    longest-match order."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_agents = True
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(value.lower())
            in_agents = True
        elif field in ("allow", "disallow"):
            in_agents = False
            if not value:
                continue  # empty Disallow/Allow: no rule
            rules.append((field == "allow", value))
        else:
            in_agents = False
    if agents:
        groups.append((agents, rules))
    agent = agent.lower()
    exact = [r for a, r in groups if agent in a]
    if exact:
        return exact[0]
    star = [r for a, r in groups if "*" in a]
    return star[0] if star else []


def robots_filter(pages: rd.Dataset, robots: rd.Dataset,
                  agent: str = "*", url_col: str = "url",
                  host_col: str = "host",
                  text_col: str = "robots_txt") -> rd.Dataset:
    """Keep pages their host's robots.txt allows for ``agent``
    (RFC 9309 evaluation: the longest matching prefix decides; at
    equal length Allow wins; no matching rule / no robots.txt for the
    host -> allowed; matching is on the url PATH, query excluded).

    Scale shape: the robots table is ONE row per host — the small
    side of any crawl — so the parsed rule set broadcasts via
    ``ray.put`` once and the page stream is filtered per batch with
    vectorized prefix tests grouped by host (Python cost per
    host-x-rule, C per row). A corpus whose rule set outgrows worker
    heap would swap the broadcast for a host-bucketed semi join; at
    that point the rules are a table, not a config."""
    host_rules: dict[str, list[tuple[bool, str]]] = {}
    for b in robots.map_batches(lambda t: t, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for h, txt in zip(b[host_col].to_pylist(),
                          b[text_col].to_pylist()):
            rules = parse_robots(txt or "", agent=agent)
            if rules:
                # evaluation order: ascending (length, allow) so the
                # LAST override is the longest match, with Allow
                # winning length ties
                host_rules[h] = sorted(
                    rules, key=lambda r: (len(r[1]), r[0]))
    ref = ray.put(host_rules)

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        rules_of = ray.get(ref)
        urls = df[url_col].astype(str)
        hosts = host_series(urls)
        paths = urls.str.extract(_PATH_RE, expand=False).fillna("")
        paths = paths.where(paths != "", "/")
        keep = np.ones(len(df), dtype=bool)
        for h, idx in df.groupby(hosts).groups.items():
            rules = rules_of.get(h)
            if not rules:
                continue
            p = paths.loc[idx]
            pos = df.index.get_indexer(idx)
            best_len = np.full(len(idx), -1, dtype=np.int64)
            verdict = np.ones(len(idx), dtype=bool)
            for allow, prefix in rules:
                if "*" in prefix or prefix.endswith("$"):
                    # RFC 9309 wildcards: '*' = any run, trailing '$'
                    # anchors the path end; specificity stays the raw
                    # rule-string length (the longest-match order)
                    body, end = (prefix[:-1], "$") \
                        if prefix.endswith("$") else (prefix, "")
                    pat = re.escape(body).replace(r"\*", ".*") + end
                    m = p.str.match(pat).to_numpy()
                else:
                    m = p.str.startswith(prefix).to_numpy()
                hit = m & (len(prefix) >= best_len)
                verdict[hit] = allow
                best_len[m & (len(prefix) > best_len)] = len(prefix)
            keep[pos] = verdict
        return df[keep]

    return pages.map_batches(per_batch, batch_format="pandas")


# ----------------------------------------------------------- sitemaps

#: frozen sitemap-scan spec (shared semantics with the SQL twin's RE2
#: patterns, the link_graph.LINK_RE doctrine): <url> blocks scanned
#: dotall, then one <loc> and optional <lastmod> inside each block;
#: entities are NOT unescaped — this is the crawler-style regex pass,
#: not an XML parse (malformed feeds degrade to fewer entries, never
#: to a parser error)
_SITEMAP_URL_BLOCK_RE = re.compile(r"<url>(.*?)</url>", re.DOTALL)
_SITEMAP_LOC_RE = re.compile(r"<loc>\s*([^<]*?)\s*</loc>", re.DOTALL)
_SITEMAP_LASTMOD_RE = re.compile(r"<lastmod>\s*([^<]*?)\s*</lastmod>",
                                 re.DOTALL)


def sitemap_entries(ds: rd.Dataset, xml_col: str = "sitemap_xml",
                    key_cols: Iterable[str] = ("host",)) -> rd.Dataset:
    """Scan sitemap XML blobs into (``*key_cols``, loc, lastmod) rows
    — the url-discovery side of the crawl toolkit (robots gives the
    permission side). One vectorized extractall per batch for the
    <url> blocks, then the loc/lastmod scan per block; sitemaps are
    per-host metadata, orders of magnitude below page volume, so the
    per-block regex cost is off the hot path by construction.
    Blocks without a <loc> are dropped (a sitemap entry IS its loc);
    missing <lastmod> is null."""
    key_cols = list(key_cols)

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        out_keys: dict[str, list] = {k: [] for k in key_cols}
        locs: list[str] = []
        lastmods: list = []
        xmls = df[xml_col].astype(str)
        for i, xml in enumerate(xmls):
            for block in _SITEMAP_URL_BLOCK_RE.findall(xml):
                m = _SITEMAP_LOC_RE.search(block)
                if not m or not m.group(1):
                    continue
                lm = _SITEMAP_LASTMOD_RE.search(block)
                for k in key_cols:
                    out_keys[k].append(df[k].iloc[i])
                locs.append(m.group(1))
                lastmods.append(lm.group(1) if lm else None)
        out = pd.DataFrame({**out_keys, "loc": pd.Series(locs, dtype="object"),
                            "lastmod": pd.Series(lastmods, dtype="object")})
        return out

    return ds.map_batches(per_batch, batch_format="pandas")


# ---------------------------------------------------------------------------
# Redirect-chain resolution (pointer doubling)
# ---------------------------------------------------------------------------

def resolve_redirects(edges: rd.Dataset, src_col: str = "src",
                      dst_col: str = "dst", max_hops: int = 32,
                      num_buckets: int = 32,
                      mode: str = "auto") -> rd.Dataset:
    """Resolve every redirect source to its FINAL target: the crawl
    step that collapses 301/302/canonical chains before URL dedup
    (a fetch that hits u1 -> u2 -> u3 must be keyed by u3).

    ``edges``: one (src, dst) row per redirect — a FUNCTIONAL graph
    (at most one outgoing edge per src; crawl redirect maps are).
    Duplicate srcs are a caller bug and make the walk multiplicative
    on both the engine and SQL side — dedup upstream.

    Output, one row per distinct src: ``(src, final, hops)`` where
    ``final`` is the first node reached that has NO outgoing edge and
    ``hops`` the exact edge count to it; chains that do not terminate
    within ``max_hops`` edges (too long, or a redirect CYCLE) emit
    ``final = NULL, hops = 0`` — exactly the rows a crawler gives up
    on.

    Plan: POINTER DOUBLING over the state table
    ``(src, cur, hops, done)`` — each round LEFT-joins the active rows
    (keyed on ``cur``) against the full state (keyed on ``src``):
    a match composes ``f_2k(x) = f_k(f_k(x))`` with hops added
    exactly; a miss means ``cur`` has no outgoing edge — terminal,
    done. Every chain of length L resolves in ceil(log2 L) rounds, so
    the round count is ceil(log2(max_hops)) + 1 REGARDLESS of corpus
    size — each round one bucketed hash join (the same exchange
    doctrine as ``_label_prop_ray``), state materialized between
    rounds, never collected to the driver. Distinct from label
    propagation (undirected min-label) and PageRank (weighted
    fixed-point): this is functional-graph path compression.
    """
    import math

    from .dedup_algos import _resolve_mode
    from .joins import hash_bucket_join

    if _resolve_mode(edges, mode) == "local":
        df = edges.to_pandas()
        if df.empty or src_col not in df.columns:
            return rd.from_arrow(pa.table({
                "src": pa.array([], pa.string()),
                "final": pa.array([], pa.string()),
                "hops": pa.array([], pa.int64())}))
        nxt = dict(zip(df[src_col], df[dst_col]))
        srcs, finals, hops_out = [], [], []
        for s in df[src_col]:
            cur, h = nxt[s], 1
            while h < max_hops and cur in nxt:
                cur = nxt[cur]
                h += 1
            srcs.append(s)
            if cur in nxt:          # still redirecting after max_hops
                finals.append(None)
                hops_out.append(0)
            else:
                finals.append(cur)
                hops_out.append(h)
        return rd.from_pandas(pd.DataFrame({
            "src": pd.Series(srcs, dtype="object"),
            "final": pd.Series(finals, dtype="object"),
            "hops": pd.Series(hops_out, dtype="int64")}))

    import pyarrow.compute as pc

    def init(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": t[src_col], "cur": t[dst_col],
            "hops": pa.array(np.ones(n, dtype=np.int64)),
            "done": pa.array(np.zeros(n, dtype=bool))})

    def rename_right(t: pa.Table) -> pa.Table:
        return pa.table({"cur": t["src"], "jcur": t["cur"],
                         "jhops": t["hops"]})

    def compose(t: pa.Table) -> pa.Table:
        # post_merge inside each join bucket: a matched row jumps to
        # its target's target (hops add exactly); a miss means cur has
        # no outgoing edge — terminal, done. Done rows need no special
        # casing: their cur IS terminal, so they miss every round and
        # pass through unchanged — the WHOLE state flows through each
        # join (no done/active split, no union: per-round splits +
        # unions measured a 0.6 s -> 128 s/round plan-and-block blowup
        # over 5 rounds; this shape keeps a stable bucket-count block
        # structure and a fixed round budget with no driver syncs).
        j = pc.is_valid(t["jcur"])
        return pa.table({
            "src": t["src"],
            "cur": pc.if_else(j, t["jcur"], t["cur"]),
            "hops": pc.add(t["hops"],
                           pc.fill_null(t["jhops"], 0)).cast(pa.int64()),
            "done": pc.invert(j),
        })

    state = edges.map_batches(init, batch_format="pyarrow").materialize()
    # every chain of length L <= max_hops resolves in ceil(log2 L)
    # doubling rounds; the +1 covers L = 1 edge cases. Fixed budget —
    # longer chains and cycles are EXACTLY the rows the cap rejects.
    rounds = max(1, math.ceil(math.log2(max(max_hops, 2)))) + 1
    for _ in range(rounds):
        right = state.map_batches(rename_right, batch_format="pyarrow")
        # repartition back to num_buckets per round: the join's
        # map_groups emits ~one block per SORT INPUT block, and state
        # enters the exchange twice (left + renamed right), so without
        # the coalesce block count DOUBLES per round (measured 64 ->
        # 1024 over 5 rounds with round time 2.3 -> 106 s at constant
        # 110k rows — sort overhead scales with block count). The
        # no-shuffle repartition is a metadata split/merge, cheap
        # relative to the round's own exchange.
        state = hash_bucket_join(
            state.map_batches(
                lambda t: t.select(["src", "cur", "hops"]),
                batch_format="pyarrow"),
            right, on="cur", how="left", num_buckets=num_buckets,
            post_merge=compose).repartition(num_buckets).materialize()

    def finish(t: pa.Table) -> pa.Table:
        ok = pc.and_(t["done"], pc.less_equal(t["hops"], max_hops))
        return pa.table({
            "src": t["src"],
            "final": pc.if_else(ok, t["cur"],
                                pa.scalar(None, t["cur"].type)),
            "hops": pc.if_else(ok, t["hops"], pa.scalar(0, pa.int64())),
        })

    return state.map_batches(finish, batch_format="pyarrow")


#: remainder bins for the apportionment threshold sketch (same exact-
#: cut-without-sort doctrine as tiers.token_budget_select's hex bins)
_ALLOC_BINS = 4096


def _alloc_frame(df: pd.DataFrame, budget: int, host_col: str,
                 score_col: str) -> pd.DataFrame:
    """Single-frame largest-remainder apportionment (local plan + the
    reference replay for the distributed twin)."""
    s = df[score_col].to_numpy().astype(np.int64)
    hosts = df[host_col].to_numpy().astype(object)
    total = int(s.sum())
    if total <= 0 or budget <= 0:
        alloc = np.zeros(len(df), dtype=np.int64)
    else:
        base = (budget * s) // total
        rem = (budget * s) % total
        leftover = int(budget - base.sum())
        alloc = base.copy()
        if leftover > 0:
            order = np.lexsort((hosts, -rem))
            alloc[order[:leftover]] += 1
    out = pd.DataFrame({host_col: hosts, "alloc": alloc})
    return out.sort_values(host_col).reset_index(drop=True)


def crawl_budget_allocation(scores: rd.Dataset, budget: int,
                            host_col: str = "host",
                            score_col: str = "score",
                            mode: str = "auto") -> rd.Dataset:
    """Largest-remainder (Hamilton) apportionment of a global crawl
    budget across hosts: given per-host scores (quality priors, doc
    counts, politeness weights), allocate exactly ``budget`` fetch
    slots — base_h = (B·s_h) // S plus +1 for the top-L hosts by
    remainder (L = B - Σ base, tie-broken by host ASC). Σ alloc == B
    exactly whenever S > 0 — the crawl scheduler's invariant.

    Output: (host_col, alloc:int64), one row per input host.

    Distributed plan — hosts tables are small next to page corpora
    but can still be 10^8 rows, so nothing sorts and nothing lands on
    the driver except bounded sketches:

    1. one streaming pass folds (Σ score) — a 1-row partial per block;
    2. a second pass computes each host's base/remainder in place and
       emits a bounded remainder-bin count sketch
       (bin = (rem · 4096) // S);
    3. the driver walks bins from the top: full bins get +1 via a
       broadcast bin mask; the ONE threshold bin is resolved exactly
       from its own rows (expected hosts/4096, collected and ranked
       (rem DESC, host ASC));
    4. the final pass emits base + the mask/id-set top-up, streaming.

    Integer arithmetic end-to-end (overflow bound: B·max_score and
    S·4096 < 2^63), so local == distributed == the SQL window replay
    bit-exactly."""
    from .dedup_algos import _resolve_mode

    empty = pd.DataFrame({host_col: pd.Series([], dtype="object"),
                          "alloc": pd.Series([], dtype="int64")})

    if _resolve_mode(scores, mode) == "local":
        frame = scores.to_pandas()
        if frame.empty or host_col not in frame.columns:
            return rd.from_pandas(empty)
        return rd.from_pandas(
            _alloc_frame(frame, budget, host_col, score_col))

    def total_partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": pa.array([int(s.sum())], pa.int64()),
                         "n": pa.array([len(s)], pa.int64())})

    tot = scores.map_batches(total_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    if tot.empty or "s" not in tot.columns or int(tot["n"].sum()) == 0:
        return rd.from_pandas(empty)
    total = int(tot["s"].sum())

    if total <= 0 or budget <= 0:
        def zeros(t: pa.Table) -> pa.Table:
            return pa.table({
                host_col: t[host_col],
                "alloc": pa.array(np.zeros(t.num_rows, np.int64))})
        return scores.map_batches(zeros, batch_format="pyarrow")

    def rem_of(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return (budget * s) // total, (budget * s) % total

    def bin_partial(t: pa.Table) -> pa.Table:
        base, rem = rem_of(t)
        b = (rem * _ALLOC_BINS) // total
        # the block's Σ base rides in row 0 of a side column (the
        # partials fold by plain column sums on the driver)
        base_sum = np.zeros(_ALLOC_BINS, dtype=np.int64)
        base_sum[0] = int(base.sum())
        return pa.table({
            "b": pa.array(np.arange(_ALLOC_BINS, dtype=np.int64)),
            "n": pa.array(np.bincount(b, minlength=_ALLOC_BINS)
                          .astype(np.int64)),
            "base": pa.array(base_sum)})

    folded = scores.map_batches(bin_partial, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    bins = folded.groupby("b")["n"].sum().reindex(
        range(_ALLOC_BINS), fill_value=0).to_numpy()
    leftover = int(budget) - int(folded["base"].sum())

    # walk bins from the top remainder down: full bins +1 wholesale
    bin_mask = np.zeros(_ALLOC_BINS, dtype=bool)
    thr_bin = -1
    thr_take = 0
    rest = leftover
    for b in range(_ALLOC_BINS - 1, -1, -1):
        if rest <= 0:
            break
        if bins[b] <= rest:
            bin_mask[b] = True
            rest -= int(bins[b])
        else:
            thr_bin, thr_take = b, rest
            rest = 0
    thr_hosts = np.empty(0, dtype=object)
    if thr_bin >= 0 and thr_take > 0:
        t_bin = thr_bin

        def only_thr(t: pa.Table) -> pa.Table:
            _, rem = rem_of(t)
            b = (rem * _ALLOC_BINS) // total
            sel = b == t_bin
            h = t[host_col].to_numpy(zero_copy_only=False)
            return pa.table({host_col: pa.array(h[sel], pa.string()),
                             "rem": pa.array(rem[sel])})

        thr = scores.map_batches(only_thr,
                                 batch_format="pyarrow").to_pandas()
        o = thr.sort_values(["rem", host_col],
                            ascending=[False, True], kind="mergesort")
        thr_hosts = np.sort(o[host_col].to_numpy()[:thr_take]
                            .astype(object))

    mref = ray.put(bin_mask)
    href = ray.put(np.array(sorted(thr_hosts), dtype=object))

    def final(t: pa.Table) -> pa.Table:
        bm = ray.get(mref)
        th = ray.get(href)
        base, rem = rem_of(t)
        b = (rem * _ALLOC_BINS) // total
        up = bm[b]
        if th.size:
            h = t[host_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(th, h)
            np.minimum(pos, th.size - 1, out=pos)
            up = up | (th[pos] == h)
        return pa.table({host_col: t[host_col],
                         "alloc": pa.array(base + up.astype(np.int64))})

    return scores.map_batches(final, batch_format="pyarrow")


#: deterministic mini public-suffix list for tests/benchmarks — the
#: real PSL (https://publicsuffix.org, ~9k rules incl. ``*.ck``
#: wildcards and ``!www.ck`` exceptions) drops in unchanged:
#: ``registrable_domain_series`` implements the full PSL algorithm
#: (longest rule wins; wildcard matches one non-empty label;
#: exception prevails and is itself the registrable domain), and the
#: candidate windows derive from the deepest rule in the loaded set,
#: so per-row cost is a few set probes regardless of list size.
DEFAULT_PUBLIC_SUFFIXES: tuple[str, ...] = (
    "com", "org", "net", "io", "uk", "co.uk", "org.uk", "github.io")


def registrable_domain_series(hosts: pd.Series,
                              suffixes) -> pd.Series:
    """Vectorized eTLD+1 (registrable domain) per host, full PSL
    semantics (https://publicsuffix.org/list — public knowledge):

    * a plain rule matches hosts ending with its labels; the LONGEST
      matching rule wins; registrable = suffix + one preceding
      NON-EMPTY label;
    * a wildcard rule ``*.parent`` makes every single non-empty label
      under ``parent`` a public suffix;
    * an exception rule ``!host`` prevails over a wildcard: the
      matched labels are THEMSELVES the registrable domain;
    * NULL when no rule matches, when the host IS a public suffix
      (no extra label), or when the host is null — the same CASE the
      SQL oracle computes for plain-rule sets.

    Candidate windows run to the deepest rule in ``suffixes``; cost
    is a handful of vectorized set probes per depth, independent of
    rule-set size.

    Deliberate divergence from the PSL's implicit default ``*`` rule:
    an unlisted TLD yields NULL here (excluded + logged by callers)
    instead of becoming a public suffix — a corpus rollup wants
    unknown TLDs surfaced, not silently grouped as registrable."""
    plain: set[str] = set()
    wild_parents: set[str] = set()
    exceptions: set[str] = set()
    for r in suffixes:
        if r.startswith("!"):
            exceptions.add(r[1:])
        elif r.startswith("*."):
            wild_parents.add(r[2:])
        else:
            plain.add(r)

    def depth(s: str) -> int:
        return s.count(".") + 1

    max_k = max([depth(s) for s in plain]
                + [depth(w) + 1 for w in wild_parents]
                + [depth(e) for e in exceptions] + [1])

    hosts = hosts.astype("object")
    parts = hosts.str.split(".")
    n = parts.str.len().fillna(0).astype(int).to_numpy()
    last: dict[int, np.ndarray] = {}
    for k in range(1, max_k + 2):
        last[k] = parts.str[-k:].str.join(".").to_numpy(dtype=object)
    nonempty: dict[int, np.ndarray] = {}
    for k in range(1, max_k + 2):
        # label k positions from the right exists and is non-empty —
        # degenerate hosts like 'a..com' never yield a registrable
        # domain (the SQL replay's [^.]+ label regex enforces the
        # same), and a wildcard only matches a non-empty label
        lbl = parts.str[-k]
        nonempty[k] = (n >= k) & lbl.notna().to_numpy() \
            & (lbl.fillna("") != "").to_numpy()

    conds, choices = [], []
    # exception rules prevail over ALL other matching rules (PSL
    # algorithm step: "the prevailing rule is the one which is an
    # exception rule"), so they go first; the matched labels ARE the
    # registrable domain (suffix = rule minus leftmost label)
    if exceptions:
        for k in range(max_k, 0, -1):
            exc = (pd.Series(last[k]).isin(exceptions).to_numpy()
                   & (n >= k))
            conds.append(exc)
            choices.append(np.where(n >= k, last[k], None))
    # then longest matching suffix rule wins; registrable = suffix
    # plus one preceding non-empty label
    for k in range(max_k, 0, -1):
        sfx_match = np.zeros(len(hosts), dtype=bool)
        if plain:
            sfx_match |= (pd.Series(last[k]).isin(plain).to_numpy()
                          & (n >= k))
        if k >= 2 and wild_parents:
            sfx_match |= (pd.Series(last[k - 1]).isin(wild_parents)
                          .to_numpy() & nonempty[k])
        conds.append(sfx_match)
        choices.append(np.where(nonempty[k + 1], last[k + 1], None))
    out = np.select(conds, choices, default=None)
    return pd.Series(out, index=hosts.index, dtype="object")


def registrable_domain_stats(ds: rd.Dataset, url_col: str = "url",
                             suffixes: Iterable[str] | None = None,
                             agg_cols: dict[str, tuple[str, str]] | None = None,
                             num_buckets: int = 64) -> rd.Dataset:
    """Per-registrable-domain (eTLD+1) aggregates — the granularity
    FineWeb/RefinedWeb actually key host-quality decisions on (a
    blocklist of ``blogspot.com`` hosts is one entry at eTLD+1, a
    million at host level). Default output: (etld1, n_docs); extend
    with ``agg_cols`` in pandas NamedAgg form. Hosts with no PSL match
    or equal to a bare suffix aggregate under NULL is NOT done — they
    are excluded (logged), matching SQL NULL-key GROUP BY exclusion
    in the oracle's WHERE.

    The suffix set broadcasts once via ``ray.put`` (a real PSL is
    ~9k strings, well under a MB); per batch the work is three
    vectorized set probes. One bucketed exchange of (etld1, metric)
    rows total."""
    from .bucketed import bucketed_agg
    sfx = frozenset(suffixes if suffixes is not None
                    else DEFAULT_PUBLIC_SUFFIXES)
    ref = ray.put(sfx)
    aggs = {"n_docs": (url_col, "size")}
    aggs.update(agg_cols or {})
    needed = sorted({c for c, _f in aggs.values()} - {url_col})

    def project(df: pd.DataFrame) -> pd.DataFrame:
        etld1 = registrable_domain_series(host_series(df[url_col]),
                                          ray.get(ref))
        bad = int(etld1.isna().sum())
        if bad:
            log.warning("registrable_domain_stats: dropped %d urls "
                        "with no registrable domain", bad)
        keep = etld1.notna().to_numpy()
        out = pd.DataFrame({"etld1": etld1.to_numpy()[keep],
                            url_col: df[url_col].to_numpy()[keep]})
        for c in needed:
            out[c] = df[c].to_numpy()[keep]
        return out

    projected = ds.map_batches(project, batch_format="pandas")
    return bucketed_agg(projected, "etld1", aggs,
                        num_buckets=num_buckets)


def host_doc_cap(ds: rd.Dataset, cap: int, url_col: str = "url",
                 id_col: str = "doc_id",
                 num_buckets: int = 32) -> rd.Dataset:
    """Per-host diversity cap (the Dolma/anti-spam rule: at most
    ``cap`` documents from any single host). Selection is
    DETERMINISTIC and content/partitioning-independent: within a host,
    docs rank by (md5(url), doc_id) — a content-blind uniform order —
    and only the first ``cap`` survive. Output: (doc_id, host) for
    kept rows; join back on id to materialize payloads (ids are 16
    bytes/row where texts are KBs — the cap decision never moves a
    payload).

    Scale shape: one bucketed exchange of (host-hash, host, md5(url),
    id) rows; each bucket sorts its own hosts and takes per-host
    prefixes — unbounded host counts welcome, a hot host costs one
    bucket a longer sort, never the driver."""
    from .text_stats import md5_hex
    from .window import hash_partitioned_window

    def project(df: pd.DataFrame) -> pd.DataFrame:
        host = host_series(df[url_col])
        bad = int(host.isna().sum())
        if bad:
            log.warning("host_doc_cap: dropped %d unparsable urls", bad)
        keep = host.notna().to_numpy()
        h = host.to_numpy()[keep]
        mu = md5_hex(pd.Series(df[url_col].to_numpy()[keep],
                               dtype="object")).to_numpy()
        # uint64 accumulate then int64 reinterpret: a non-ASCII host
        # (raw IDN, first UTF-8 byte >= 0x80) overflows a signed
        # fromiter
        hb = np.fromiter(
            (int.from_bytes(x.encode()[:8], "big") for x in h),
            dtype=np.uint64, count=len(h)).view(np.int64) if len(h) \
            else np.array([], dtype=np.int64)
        return pd.DataFrame({"hb": hb, "host": h, "mu": mu,
                             id_col: df[id_col].to_numpy()[keep]})

    def kern(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        # g arrives sorted by (hb, host, mu, id) — the framework's one
        # mergesort IS the within-host rank order (one host never
        # splits across hb values), so no second sort here
        rank = g.groupby("host", sort=False).cumcount()
        out = g[rank.to_numpy() < cap]
        return pd.DataFrame({id_col: out[id_col].to_numpy(),
                             "host": out["host"].to_numpy()})

    return hash_partitioned_window(
        ds.map_batches(project, batch_format="pandas"),
        "hb", ["host", "mu", id_col], kern, num_buckets=num_buckets)


def path_templates(ds: rd.Dataset, url_col: str = "url",
                   num_buckets: int = 64) -> rd.Dataset:
    """URL path-template mining: mask every decimal digit run in the
    path to ``{n}`` and count urls per (host, template, depth) — the
    crawl-planning primitive that exposes templated page families
    (``/product/{n}/view`` × 40M) so a budgeted crawler can cap or
    sample them instead of fetching every instantiation (the
    per-template generalization of ``host_doc_cap``).

    Rules (mirrored EXACTLY by the SQL twin in ``__ray_entry__.py``):
    fragment dropped; host lowercased, port stripped (``host_series``);
    empty path becomes ``/``; query/fragment are NOT part of the
    template; ``depth`` = number of ``/`` in the template; unparsable
    urls are dropped from the key domain with a logged count.

    Scale shape: one vectorized regex pass per batch (str.extract +
    one str.replace), then a single bucketed exchange of
    (host, template, depth) combiner rows via ``bucketed_agg`` —
    per-batch pre-aggregation shrinks each block to its local template
    set before the shuffle, so the exchange is template-bounded, not
    url-bounded."""
    from .bucketed import bucketed_agg

    def project(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col].astype("object").str.split("#", n=1).str[0]
        ext = u.str.extract(_URL_RE)
        host = ext[1].str.lower()
        bad = int(host.isna().sum())
        if bad:
            log.warning("path_templates: dropped %d unparsable urls",
                        bad)
        # strip :port (host_series semantics)
        host = host.str.split(":", n=1).str[0]
        path = ext[2].mask(ext[2] == "", "/")
        tmpl = path.str.replace(r"[0-9]+", "{n}", regex=True)
        depth = tmpl.str.count("/")
        keep = host.notna().to_numpy()
        out = pd.DataFrame({
            "host": host.to_numpy()[keep],
            "template": tmpl.to_numpy()[keep],
            "depth": depth.to_numpy()[keep].astype("int64")})
        return (out.groupby(["host", "template", "depth"],
                            as_index=False).size()
                .rename(columns={"size": "n_urls"}))

    projected = ds.map_batches(project, batch_format="pandas")
    return bucketed_agg(projected, ["host", "template", "depth"],
                        {"n_urls": ("n_urls", "sum")},
                        num_buckets=num_buckets)
