"""URL operators (functions/url_ops.py): canonicalization rules on
crafted edge cases, URL dedup semantics, host stats, blocklist
filtering — plus the synth-url adapter's Python==SQL twin pin."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.url_ops import (
    canonicalize_series, canonicalize_urls, host_filter, host_series,
    host_stats, url_dedup)


def test_canonicalize_rules():
    urls = pd.Series([
        # case + default port + fragment
        "HTTPS://Example.COM:443/Path#frag",
        "http://host.org:80/a",
        # non-default port kept
        "http://host.org:8080/a",
        # empty path -> '/'
        "https://h.io",
        "https://h.io?b=2&a=1",
        # tracking params dropped, rest sorted, '?' kept
        "https://h.io/p?utm_source=rss&b=2&fbclid=xyz&a=1",
        # tracking-only query -> '?' dropped
        "https://h.io/p?utm_campaign=x&gclid=1",
        # fragment containing '?' must NOT be parsed as a query
        "https://h.io/p#frag?notaquery=1",
        # empty params ('&&') dropped; trailing '?' dropped
        "https://h.io/p?&&a=1&",
        "https://h.io/p?",
        # path case preserved; utm_ bare name (no '=') dropped
        "https://h.io/CaseKept?utm_x",
        # malformed -> NULL
        "notaurl",
        None,
    ])
    s = canonicalize_series(urls)
    got = s.where(s.notna(), None).tolist()
    assert got == [
        "https://example.com/Path",
        "http://host.org/a",
        "http://host.org:8080/a",
        "https://h.io/",
        "https://h.io/?a=1&b=2",
        "https://h.io/p?a=1&b=2",
        "https://h.io/p",
        "https://h.io/p",
        "https://h.io/p?a=1",
        "https://h.io/p",
        "https://h.io/CaseKept",
        None,
        None,
    ]


def test_host_series():
    s = pd.Series(["HTTPS://Example.COM:8443/p", "http://h.io", "bad",
                   None])
    h = host_series(s)
    assert h.where(h.notna(), None).tolist() == [
        "example.com", "h.io", None, None]


def _url_corpus():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "url": [
            "https://A.example.org:443/x?utm_source=a",   # dup of 2
            "https://a.example.org/x",                    # dup of 1
            "https://b.example.org/y?b=2&a=1",
            "https://b.example.org/y?a=1&b=2",            # dup of 3
            "not a url",                                   # dropped
        ],
        "n_chars": [10, 20, 30, 40, 50],
    })


@pytest.mark.usefixtures("ray_session")
def test_url_dedup():
    out = (url_dedup(rd.from_pandas(_url_corpus()))
           .to_pandas().sort_values("canon_url")
           .reset_index(drop=True))
    assert out["canon_url"].tolist() == [
        "https://a.example.org/x", "https://b.example.org/y?a=1&b=2"]
    assert out["keep_id"].tolist() == [1, 3]
    assert out["n_dupes"].tolist() == [2, 2]


@pytest.mark.usefixtures("ray_session")
def test_canonicalize_urls_appends_column():
    ds = canonicalize_urls(rd.from_pandas(_url_corpus()))
    df = ds.to_pandas()
    assert "canon_url" in df.columns and "n_chars" in df.columns
    assert df["canon_url"].isna().sum() == 1


@pytest.mark.usefixtures("ray_session")
def test_host_stats():
    out = (host_stats(rd.from_pandas(_url_corpus()),
                      agg_cols={"total_chars": ("n_chars", "sum")})
           .to_pandas().sort_values("host").reset_index(drop=True))
    assert out["host"].tolist() == ["a.example.org", "b.example.org"]
    assert out["n_docs"].tolist() == [2, 2]
    assert out["total_chars"].tolist() == [30, 70]


@pytest.mark.usefixtures("ray_session")
def test_host_filter_block_and_keep():
    ds = rd.from_pandas(_url_corpus())
    dropped = (host_filter(ds, ["a.example.org"])
               .to_pandas().sort_values("doc_id"))
    # unparsable-url row passes a blocklist (host NULL never matches)
    assert dropped["doc_id"].tolist() == [3, 4, 5]
    kept = (host_filter(ds, ["a.example.org"], keep=True)
            .to_pandas().sort_values("doc_id"))
    assert kept["doc_id"].tolist() == [1, 2]
    # empty blocklist: everything passes
    assert len(host_filter(ds, []).to_pandas()) == 5


@pytest.mark.usefixtures("ray_session")
def test_synth_url_python_equals_sql():
    """The adapter twins (synth_url_batch / synth_url_sql) must build
    the identical string — they are the queries' shared input."""
    import duckdb
    import __ray_entry__ as em
    sf = "/root/testdata/sf0.001"
    got = (em._docs_urls(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(
        f"SELECT doc_id, url FROM ({em.synth_url_sql('documents')}) "
        f"ORDER BY doc_id").df()
    assert (got["url"].to_numpy() == want["url"].to_numpy()).all()
    # and the synthetic corpus actually exercises the rules
    assert got["url"].str.contains("#sec-0").any()
    assert got["url"].str.contains("utm_source").any()
    assert got["url"].str.contains(":443").any()
    assert got["url"].str.contains("HTTPS://", regex=False).sum() == 0
    assert got["url"].str.match(r"https://H\d+\.EXAMPLE\.ORG").any()


@pytest.mark.usefixtures("ray_session")
def test_host_quality_filter():
    from ocr_model_ray.functions.url_ops import host_quality_filter
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "url": ["https://good.org/a", "https://good.org/b",
                "https://bad.org/a", "https://bad.org/b",
                "junk"],
        "text": ["five words in this doc", "four words right here",
                 "short", "tiny one", "plenty of words here too"],
    })
    out = (host_quality_filter(rd.from_pandas(docs),
                               min_mean_words=4.0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # good.org mean = 4.5 >= 4 -> kept; bad.org mean = 1.5 -> dropped;
    # the unparsable-url doc has no host -> dropped regardless of text
    assert out["doc_id"].tolist() == [1, 2]
    assert out["host"].tolist() == ["good.org", "good.org"]
    # threshold above every host: typed empty path
    none = host_quality_filter(rd.from_pandas(docs),
                               min_mean_words=99.0).to_pandas()
    assert len(none) == 0


@pytest.mark.usefixtures("ray_session")
def test_crawl_diff_semantics():
    from ocr_model_ray.functions.url_ops import crawl_diff
    old = pd.DataFrame({"url": ["u1", "u2", "u3"],
                        "fp": ["a", "b", "c"]})
    new = pd.DataFrame({"url": ["u2", "u3", "u4"],
                        "fp": ["b", "CHANGED", "d"]})
    out = (crawl_diff(rd.from_pandas(old), rd.from_pandas(new))
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert out["url"].tolist() == ["u1", "u2", "u3", "u4"]
    assert out["status"].tolist() == ["gone", "same", "changed", "new"]


@pytest.mark.usefixtures("ray_session")
def test_host_mirror_pairs_exact_jaccard():
    from ocr_model_ray.functions.url_ops import host_mirror_pairs
    # hostA = {k1..k4}; hostB = {k1,k2} (J=0.5); hostC = {k9} disjoint
    rows = pd.DataFrame({
        "host": ["A"] * 4 + ["B", "B", "C"],
        "h": ["k1", "k2", "k3", "k4", "k1", "k2", "k9"]})
    out = host_mirror_pairs(rd.from_pandas(rows),
                            threshold=0.3).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["host_a"], r["host_b"]) == ("A", "B")
    assert (r["n_inter"], r["n_a"], r["n_b"]) == (2, 4, 2)
    assert r["jaccard"] == 0.5
    # threshold above the overlap: empty
    assert host_mirror_pairs(rd.from_pandas(rows),
                             threshold=0.6).to_pandas().empty


@pytest.mark.usefixtures("ray_session")
def test_host_mirror_pairs_partition_independent_and_dedup():
    from ocr_model_ray.functions.url_ops import host_mirror_pairs
    # duplicate (host, key) rows must not inflate intersection counts
    rows = pd.DataFrame({
        "host": ["A", "A", "A", "B", "B", "B"],
        "h": ["k1", "k1", "k2", "k1", "k1", "k3"]})
    for parts in (1, 5):
        out = host_mirror_pairs(rd.from_pandas(rows).repartition(parts),
                                threshold=0.0).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["n_inter"] == 1
        assert out.iloc[0]["n_a"] == 2 and out.iloc[0]["n_b"] == 2


@pytest.mark.usefixtures("ray_session")
def test_host_mirror_pairs_hot_key_cap_logged():
    from ocr_model_ray.functions.url_ops import host_mirror_pairs
    # one boilerplate key shared by 10 hosts + one true mirror pair
    rows = pd.DataFrame({
        "host": [f"s{i}" for i in range(10)] + ["X", "X", "Y", "Y"],
        "h": ["boiler"] * 10 + ["k1", "k2", "k1", "k2"]})
    capped = host_mirror_pairs(rd.from_pandas(rows), threshold=0.0,
                               max_hosts_per_key=5).to_pandas()
    # the boilerplate key is dropped WHOLE; the X-Y pair survives
    assert len(capped) == 1
    assert (capped.iloc[0]["host_a"], capped.iloc[0]["host_b"]) == ("X", "Y")
    full = host_mirror_pairs(rd.from_pandas(rows),
                             threshold=0.0).to_pandas()
    assert len(full) == 45 + 1  # C(10,2) boilerplate pairs + X-Y


def test_parse_robots_groups_and_subset():
    from ocr_model_ray.functions.url_ops import parse_robots
    txt = ("# comment\n"
           "User-agent: badbot\n"
           "Disallow: /\n"
           "\n"
           "User-agent: GoodBot\n"
           "User-agent: otherbot\n"
           "Disallow: /a/\n"
           "Allow: /a/b\n"
           "Crawl-delay: 10\n"
           "\n"
           "User-agent: *\n"
           "Disallow: /x\n"
           "Disallow:\n"          # empty value: allow-all, no rule
           "Disallow: /wild/*\n"  # wildcard: kept (RFC 9309)
           "Allow: /end$\n")      # anchor: kept
    assert parse_robots(txt) == [(False, "/x"), (False, "/wild/*"),
                                 (True, "/end$")]
    # exact agent match (case-insensitive, multi-agent group) beats *
    assert parse_robots(txt, agent="goodbot") == \
        [(False, "/a/"), (True, "/a/b")]
    assert parse_robots(txt, agent="badbot") == [(False, "/")]
    assert parse_robots("", agent="*") == []
    assert parse_robots("Disallow: /loose\n") == []  # rule outside group


def test_robots_filter_longest_match_and_defaults(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocr_model_ray.functions.url_ops import robots_filter

    pages = rd.from_pandas(pd.DataFrame({"url": [
        "https://a.com/public/1",       # no matching rule -> keep
        "https://a.com/private/1",      # disallow -> drop
        "https://a.com/private/ok/1",   # longer allow -> keep
        "https://a.com/tmp/x",          # /tmp prefix -> drop
        "https://norobots.com/private/1",  # host without robots -> keep
        "https://a.com/",               # bare path -> keep
    ]}))
    robots = rd.from_pandas(pd.DataFrame({
        "host": ["a.com"],
        "robots_txt": ["User-agent: *\nDisallow: /private/\n"
                       "Allow: /private/ok/\nDisallow: /tmp\n"]}))
    kept = sorted(robots_filter(pages, robots).to_pandas()["url"])
    assert kept == ["https://a.com/",
                    "https://a.com/private/ok/1",
                    "https://a.com/public/1",
                    "https://norobots.com/private/1"]

    # equal-length allow vs disallow: Allow wins the tie (RFC 9309)
    # in BOTH file orders — the parse-time (len, allow) sort decides,
    # never file position (round-4 advice regression pin)
    for txt in ("User-agent: *\nDisallow: /p/\nAllow: /p/\n",
                "User-agent: *\nAllow: /p/\nDisallow: /p/\n"):
        robots2 = rd.from_pandas(pd.DataFrame({
            "host": ["a.com"], "robots_txt": [txt]}))
        kept2 = robots_filter(
            rd.from_pandas(pd.DataFrame({"url": ["https://a.com/p/z"]})),
            robots2).to_pandas()
        assert kept2["url"].tolist() == ["https://a.com/p/z"]


def test_robots_filter_wildcards_and_anchor(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocr_model_ray.functions.url_ops import robots_filter

    pages = rd.from_pandas(pd.DataFrame({"url": [
        "https://a.com/cgi/x.php",      # *.php$ -> drop
        "https://a.com/cgi/x.php5",     # $ anchor: .php5 not matched
        "https://a.com/dl/v1/secret/f", # /dl/*/secret/ -> drop
        "https://a.com/dl/secret/f",    # no middle segment: no match
        "https://a.com/dl/v2/secret/",  # wildcard matches v2 -> drop
        "https://a.com/star.live",      # literal $ mid-rule stays literal
    ]}))
    robots = rd.from_pandas(pd.DataFrame({
        "host": ["a.com"],
        "robots_txt": ["User-agent: *\n"
                       "Disallow: /*.php$\n"
                       "Disallow: /dl/*/secret/\n"]}))
    kept = sorted(robots_filter(pages, robots).to_pandas()["url"])
    assert kept == ["https://a.com/cgi/x.php5",
                    "https://a.com/dl/secret/f",
                    "https://a.com/star.live"]

    # a longer wildcard Allow overrides a shorter wildcard Disallow
    robots3 = rd.from_pandas(pd.DataFrame({
        "host": ["a.com"],
        "robots_txt": ["User-agent: *\n"
                       "Disallow: /m/*\n"
                       "Allow: /m/*/pub\n"]}))
    pages3 = rd.from_pandas(pd.DataFrame({"url": [
        "https://a.com/m/1/priv", "https://a.com/m/1/pub"]}))
    kept3 = sorted(robots_filter(pages3, robots3).to_pandas()["url"])
    assert kept3 == ["https://a.com/m/1/pub"]


def test_sitemap_entries_scan(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocr_model_ray.functions.url_ops import sitemap_entries

    xml_ok = ("<urlset><url><loc> https://a/1 </loc>"
              "<lastmod>2024-02-03</lastmod></url>"
              "<url><loc>https://a/2</loc></url>"
              "<url><lastmod>no-loc-dropped</lastmod></url></urlset>")
    ds = rd.from_pandas(pd.DataFrame({
        "host": ["a", "b"],
        "sitemap_xml": [xml_ok, "<notasitemap/>"]}))
    out = sitemap_entries(ds).to_pandas().sort_values("loc")
    assert out["loc"].tolist() == ["https://a/1", "https://a/2"]
    assert out["lastmod"].tolist()[0] == "2024-02-03"
    assert out["lastmod"].isna().tolist() == [False, True]
    assert out["host"].tolist() == ["a", "a"]


def test_registrable_domain_psl_semantics():
    """eTLD+1 kernel: longest listed suffix wins; bare-suffix hosts,
    unlisted TLDs and nulls yield NULL; subdomains collapse."""
    import pandas as pd
    from ocr_model_ray.functions.url_ops import (
        DEFAULT_PUBLIC_SUFFIXES, registrable_domain_series)
    S = frozenset(DEFAULT_PUBLIC_SUFFIXES)
    hosts = pd.Series([
        "www.s1.co.uk",        # 2-label suffix + subdomain
        "s1.co.uk",            # 2-label suffix exact depth
        "co.uk",               # host IS a suffix -> NULL
        "uk",                  # bare 1-label suffix -> NULL
        "b.uk",                # 1-label suffix ('b.uk' not listed)
        "blog.a.s2.github.io", # deep subdomain chain
        "cdn.static.s4.org",   # 1-label suffix, 2 subdomain labels
        "x.zz",                # unlisted TLD -> NULL
        "github.io",           # bare 2-label suffix -> NULL
        None,                  # null host -> NULL
        "a..com",              # empty label before suffix -> NULL
        ".co.uk",              # empty +1 label on 2-label suffix
        "x.co..uk",            # suffix window broken by empty label
    ])
    got = registrable_domain_series(hosts, S).tolist()
    assert got == ["s1.co.uk", "s1.co.uk", None, None, "b.uk",
                   "s2.github.io", "s4.org", None, None, None,
                   None, None, None]


def test_registrable_domain_wildcard_and_exception_rules():
    """Full PSL algorithm: '*.parent' wildcards, '!host' exceptions
    (which prevail over everything and ARE the registrable domain),
    wildcard label must be non-empty, deep rule sets set the window."""
    import pandas as pd
    from ocr_model_ray.functions.url_ops import registrable_domain_series
    rules = {"com", "*.ck", "!www.ck", "*.kawasaki.jp", "jp",
             "city.x.deep.example"}
    hosts = pd.Series([
        "foo.bar.ck",          # *.ck: 'bar.ck' is a suffix
        "bar.ck",              # host IS a wildcard suffix -> NULL
        "www.ck",              # exception: itself registrable
        "a.www.ck",            # exception beats *.ck: 'www.ck'
        "x.y.kawasaki.jp",     # *.kawasaki.jp -> 'x.y.kawasaki.jp'? no:
                               # suffix 'y.kawasaki.jp', +1 = whole host
        "y.kawasaki.jp",       # host IS the wildcard suffix -> NULL
        "shop.kawasaki.jp",    # suffix 'shop.kawasaki.jp'?? no — host
                               # IS 'shop.kawasaki.jp' (3 labels) -> NULL
        "v.city.x.deep.example",  # 4-label plain rule, window stretches
        ".ck",                 # empty wildcard label -> falls to NULL
        "sub.tokyo.jp",        # plain 'jp' -> 'tokyo.jp'
    ])
    got = registrable_domain_series(hosts, rules).tolist()
    assert got == ["foo.bar.ck", None, "www.ck", "www.ck",
                   "x.y.kawasaki.jp", None, None,
                   "v.city.x.deep.example", None, "tokyo.jp"]


def test_host_doc_cap_non_ascii_host(ray_session):
    """Raw IDN (non-ASCII) hosts route and cap without overflow."""
    import pandas as pd
    import ray.data as rd
    from ocr_model_ray.functions.url_ops import host_doc_cap
    df = pd.DataFrame({
        "doc_id": list(range(6)),
        "url": [f"https://пример.com/{i}" for i in range(3)]
             + [f"https://例え.jp/{i}" for i in range(3)]})
    out = host_doc_cap(rd.from_pandas(df), cap=2).to_pandas()
    assert len(out) == 4
    assert out.groupby("host").size().max() == 2


def test_registrable_domain_stats_rollup(ray_session):
    """Hosts sharing an eTLD+1 aggregate to one row; droppables gone."""
    import pandas as pd
    import ray.data as rd
    from ocr_model_ray.functions.url_ops import registrable_domain_stats
    df = pd.DataFrame({
        "url": ["https://www.a.co.uk/1", "https://blog.a.co.uk/2",
                "https://a.co.uk/3", "https://x.zz/4",
                "https://github.io/5"],
        "n_chars": [10, 20, 30, 40, 50]})
    out = (registrable_domain_stats(
        rd.from_pandas(df), agg_cols={"total_chars": ("n_chars", "sum")})
        .to_pandas().sort_values("etld1").reset_index(drop=True))
    assert out["etld1"].tolist() == ["a.co.uk"]
    assert int(out["n_docs"][0]) == 3 and int(out["total_chars"][0]) == 60


def test_host_doc_cap_deterministic_and_capped(ray_session):
    """Cap semantics: at most K per host, selection ranked by
    (md5(url), doc_id), partitioning-independent."""
    import hashlib
    import pandas as pd
    import ray.data as rd
    from ocr_model_ray.functions.url_ops import host_doc_cap
    rows = []
    for i in range(40):
        rows.append((i, f"https://h{i % 3}.ex.org/p/{i}"))
    rows.append((99, "not a url"))          # unparsable: dropped
    df = pd.DataFrame(rows, columns=["doc_id", "url"])

    def expect(k):
        d = df[df["url"].str.startswith("https")].copy()
        d["host"] = d["url"].str.extract(r"://([^/]*)")[0]
        d["mu"] = d["url"].map(
            lambda u: hashlib.md5(u.encode()).hexdigest())
        d = d.sort_values(["host", "mu", "doc_id"])
        d = d[d.groupby("host").cumcount() < k]
        return set(d["doc_id"])

    for nb in (1, 7):
        out = host_doc_cap(rd.from_pandas(df), cap=4,
                           num_buckets=nb).to_pandas()
        assert set(out["doc_id"]) == expect(4)
        assert out.groupby("host").size().max() == 4
        assert 99 not in set(out["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_path_templates_rules():
    """Digit masking, empty path -> '/', fragment/query exclusion,
    port stripping, host lowercasing, unparsable drop."""
    import ray.data as rd
    from ocr_model_ray.functions.url_ops import path_templates
    urls = [
        "https://A.example.com:443/product/123/view",
        "https://a.example.com/product/9/view?x=1#frag",
        "https://a.example.com",
        "https://a.example.com/#top",
        "not a url",
        "https://b.example.com/v2/x7y88z",
    ]
    ds = rd.from_items([{"url": u} for u in urls])
    out = (path_templates(ds).to_pandas()
           .sort_values(["host", "template"]).reset_index(drop=True))
    got = {(r.host, r.template): (r.depth, r.n_urls)
           for r in out.itertuples()}
    assert got[("a.example.com", "/product/{n}/view")] == (3, 2)
    assert got[("a.example.com", "/")] == (1, 2)
    assert got[("b.example.com", "/v{n}/x{n}y{n}z")] == (2, 1)
    assert out["n_urls"].sum() == 5  # the unparsable one dropped
