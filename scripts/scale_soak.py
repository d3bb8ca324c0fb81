"""Scale soak: run the document operators on a corpus ABOVE the
128 MB size cut, so every `mode='auto'` resolves to the DISTRIBUTED
plan on real volume (the pytest suite exercises those plans via
forced-mode flags on tiny inputs; this script proves they hold on a
million-document stream), and verify each result against DuckDB on
the very same generated parquet — a fully independent check at scale.

    python scripts/scale_soak.py [--replicas 250] [--ops all]

Corpus: sf0.1 documents replicated R times with every TOKEN suffixed
by the replica id (deterministic). Token-salting keeps each replica's
internal structure (exact-dup groups, near-dup pairs, Zipf shape)
while making replicas mutually disjoint — so dedup ops scale linearly
instead of exploding across replicas, exactly how a sharded web crawl
behaves. Prints one JSON line per op: {op, seconds, rows, match}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_DIR = "/tmp/ocr_model_ray_soak"


def build_corpus(replicas: int) -> str:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SOAK_DIR, f"docs_x{replicas}")
    marker = out + "._DONE"   # outside the dir: Ray reads the whole dir
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    base = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    n = len(base)
    for r in range(replicas):
        if os.path.exists(os.path.join(out, f"part_{r:04d}.parquet")):
            continue  # resumable build: a prior run's parts are final
        texts = base["text"].str.replace(
            r"(\S+)", rf"\1x{r}", regex=True)
        t = pa.table({
            "doc_id": pa.array(base["doc_id"].to_numpy() + r * n,
                               pa.int64()),
            "text": pa.array(texts.tolist(), pa.string()),
        })
        dst = os.path.join(out, f"part_{r:04d}.parquet")
        pq.write_table(t, dst + ".tmp")  # atomic: a killed build never
        os.replace(dst + ".tmp", dst)    # leaves a torn part behind
    open(marker, "w").write("ok")
    return out


WS = "[ \t\n\r\f\v]+"


def oracle(dir_: str, sql: str):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{dir_}/part_*.parquet')")
    return con.sql(sql).df()


def compare(got, want) -> bool:
    import numpy as np
    import pandas as pd
    got = got[sorted(got.columns)].sort_values(
        by=sorted(got.columns), kind="mergesort").reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), kind="mergesort").reset_index(drop=True)
    if len(got) != len(want) or sorted(got.columns) != sorted(want.columns):
        return False
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            if not np.array_equal(got[c].astype(float).values.view("int64"),
                                  want[c].astype(float).values.view("int64")):
                return False
        elif not (got[c] == want[c]).all():
            return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=250)
    ap.add_argument("--ops", default="all")
    args = ap.parse_args()
    global REPLICAS
    REPLICAS = args.replicas

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    corpus = build_corpus(args.replicas)
    ds = rd.read_parquet(corpus)
    from ocr_model_ray.functions.dedup_algos import _resolve_mode
    size = ds.size_bytes()
    mode = _resolve_mode(ds, "auto")
    print(json.dumps({"corpus": corpus, "size_bytes": size,
                      "auto_mode": mode}), flush=True)
    assert mode == "distributed", "soak corpus must exceed the size cut"

    def run(name, fn, sql):
        t = time.time()
        got = fn()
        sec = round(time.time() - t, 2)
        t = time.time()
        want = oracle(corpus, sql)
        osec = round(time.time() - t, 2)
        ok = compare(got, want)
        print(json.dumps({"op": name, "seconds": sec, "rows": len(got),
                          "match": bool(ok), "oracle_seconds": osec}),
              flush=True)
        return ok

    from ocr_model_ray.functions.corpus_stats import (
        bigram_lift, heavy_hitters, top_tokens, unigram_freq_score,
        vocab_size)
    from ocr_model_ray.functions.dedup_algos import exact_dedup
    from ocr_model_ray.functions.packing import sequence_pack

    fresh = lambda: rd.read_parquet(corpus)  # noqa: E731
    all_ok = True
    ops = {
        "top_tokens": (
            lambda: top_tokens(fresh(), k=50),
            f"""SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
                    SELECT unnest(list_filter(string_split_regex(
                        text, '{WS}'), x -> x <> '')) AS token
                    FROM documents)
                GROUP BY token ORDER BY n DESC, token LIMIT 50"""),
        "vocab_size": (
            lambda: vocab_size(fresh()),
            f"""SELECT CAST(count(DISTINCT token) AS BIGINT)
                       AS n_distinct_tokens FROM (
                    SELECT unnest(list_filter(string_split_regex(
                        text, '{WS}'), x -> x <> '')) AS token
                    FROM documents)"""),
        "heavy_hitters": (
            # phi sized so the salted vocabulary (each token's share
            # ~1.3e-4) actually crosses the threshold — a 0-row match
            # would verify nothing
            lambda: heavy_hitters(fresh(), phi=0.0001),
            f"""WITH tok AS (
                    SELECT unnest(list_filter(string_split_regex(
                        text, '{WS}'), x -> x <> '')) AS token
                    FROM documents),
                tot AS (SELECT count(*) AS T FROM tok)
                SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok
                GROUP BY token
                HAVING count(*) >= ceil(0.0001 * (SELECT T FROM tot))
                ORDER BY n DESC, token"""),
        "exact_dedup": (
            lambda: exact_dedup(fresh()).to_pandas(),
            """SELECT md5(text) AS h,
                      CAST(min(doc_id) AS BIGINT) AS keep_id,
                      CAST(count(*) AS BIGINT) AS n_dupes
               FROM documents GROUP BY md5(text)"""),
        "freq_score": (
            lambda: unigram_freq_score(fresh()),
            f"""WITH tok AS (
                    SELECT doc_id, unnest(list_filter(string_split_regex(
                        text, '{WS}'), x -> x <> '')) AS token
                    FROM documents),
                cnt AS (SELECT token, count(*) AS c FROM tok
                        GROUP BY token),
                tot AS (SELECT count(*) AS T FROM tok)
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS sum_freq,
                       CAST(count(*) AS BIGINT) AS n_tok,
                       CAST(sum(c) AS BIGINT)
                           / (CAST(count(*) AS BIGINT) * 1.0
                              * (SELECT T FROM tot)) AS avg_freq
                FROM tok JOIN cnt USING (token)
                GROUP BY doc_id ORDER BY doc_id"""),
        "sequence_pack": (
            lambda: sequence_pack(fresh()).to_pandas(),
            """WITH t AS (
                   SELECT doc_id,
                          CAST(coalesce(len(regexp_extract_all(
                               text, '\\S+')), 0) AS BIGINT) AS n_tokens
                   FROM documents)
               SELECT doc_id, n_tokens,
                      CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND
                           1 PRECEDING), 0) AS BIGINT) AS cum_before,
                      CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND
                           1 PRECEDING), 0) // 256 AS BIGINT) AS seq_id
               FROM t"""),
        "bigram_lift": (
            lambda: bigram_lift(fresh(), k=50, min_count=5),
            f"""WITH words AS (
                    SELECT doc_id, list_filter(string_split_regex(
                        text, '{WS}'), x -> x <> '') AS w
                    FROM documents),
                uni AS (SELECT unnest(w) AS token FROM words),
                ucnt AS (SELECT token, count(*) AS c FROM uni
                         GROUP BY token),
                tot AS (SELECT count(*) AS T FROM uni),
                bi AS (SELECT w[i] AS w1, w[i+1] AS w2
                       FROM words, LATERAL unnest(generate_series(
                           1, greatest(len(w) - 1, 0))) AS t(i)),
                bcnt AS (SELECT w1, w2, count(*) AS cab FROM bi
                         GROUP BY w1, w2),
                btot AS (SELECT count(*) AS TB FROM bi)
                SELECT w1, w2, CAST(cab AS BIGINT) AS n_pair,
                       (cab * 1.0 * (SELECT T FROM tot)
                            * (SELECT T FROM tot))
                       / ((SELECT TB FROM btot) * 1.0 * a.c * b.c)
                           AS lift
                FROM bcnt JOIN ucnt a ON a.token = w1
                JOIN ucnt b ON b.token = w2
                WHERE cab >= 5
                ORDER BY lift DESC, w1, w2 LIMIT 50"""),
    }

    # duplicate-line removal: the wrap adapter and its SQL twin are
    # IMPORTED from __ray_entry__ (single source of truth — the soak
    # verifies the exact transform the query suite does), forced
    # DISTRIBUTED plan (explode -> semi-mark join -> re-bucket by doc)
    import __ray_entry__ as _em
    _wrap = _em.wrap_tokens_batch

    def _run_line_dedup():
        from ocr_model_ray.functions.line_dedup import line_dedup
        wrapped = fresh().map_batches(_wrap, batch_format="pyarrow")
        return line_dedup(wrapped, min_docs=2, min_len=15,
                          mode="distributed").to_pandas()

    _wrap_src = _em.wrap_sql("documents")
    ops["line_dedup"] = (_run_line_dedup,
                         _em._line_dedup_sql(_wrap_src, "doc_id"))

    def _run_line_dedup_by_source():
        """Scoped (per-source) variant at volume: a synthetic
        source = 's<doc_id % 500>' splits each replica's dup groups
        across 500 scopes; forced distributed plan."""
        import pyarrow as pa
        from ocr_model_ray.functions.line_dedup import line_dedup

        def add_source(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            src = ["s" + str(i % 500)
                   for i in ids.to_numpy(zero_copy_only=False)]
            return t.append_column("source", pa.array(src, pa.string()))

        from functools import partial
        wrapped = (fresh().map_batches(add_source, batch_format="pyarrow")
                   .map_batches(partial(_wrap, keep=("source",)),
                                batch_format="pyarrow"))
        return line_dedup(wrapped, min_docs=2, min_len=15,
                          mode="distributed",
                          scope_col="source").to_pandas()

    _src_rel = ("(SELECT doc_id, text, "
                "'s' || CAST(doc_id % 500 AS VARCHAR) AS source "
                "FROM documents)")
    ops["line_dedup_by_source"] = (
        _run_line_dedup_by_source,
        _em._line_dedup_sql(_em.wrap_sql(_src_rel, keep=("source",)),
                            "doc_id", scope_col="source"))

    def _add_source(t):
        import pyarrow as pa
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        src = ["s" + str(i % 500)
               for i in ids.to_numpy(zero_copy_only=False)]
        return t.append_column("source", pa.array(src, pa.string()))

    def _run_source_vocab():
        from ocr_model_ray.functions.corpus_stats import source_vocab
        return source_vocab(
            fresh().map_batches(_add_source, batch_format="pyarrow"))

    ops["source_vocab"] = (
        _run_source_vocab,
        f"""SELECT 's' || CAST(doc_id % 500 AS VARCHAR) AS source,
                   CAST(count(DISTINCT token) AS BIGINT)
                       AS n_distinct_tokens
            FROM (SELECT doc_id, unnest(list_filter(string_split_regex(
                      text, '{WS}'), x -> x <> '')) AS token
                  FROM documents)
            GROUP BY 1""")

    def _run_mix_weights():
        from ocr_model_ray.functions.mixing import source_mix_weights
        return source_mix_weights(
            fresh().map_batches(_add_source, batch_format="pyarrow"))

    ops["source_mix_weights"] = (
        _run_mix_weights,
        """WITH base AS (SELECT doc_id, text,
                    's' || CAST(doc_id % 500 AS VARCHAR) AS source
                FROM documents),
        s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(coalesce(len(regexp_extract_all(
                          text, '\\S+')), 0)) AS BIGINT) AS n_tokens
              FROM base GROUP BY source),
        t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total,
                     count(*) AS ns FROM s)
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / t.total AS token_share,
               CASE WHEN n_tokens = 0 THEN 0.0
                    ELSE (1.0 / t.ns)
                         / (CAST(n_tokens AS DOUBLE) / t.total)
               END AS weight
        FROM s, t""")

    def _run_span_dedup():
        """Custom check (the gram-string SQL oracle OOMs DuckDB above
        ~100k docs): replicas are token-salted bijections of the base
        sf0.1 corpus, so within replica r gram equality <=> base gram
        equality and NO gram crosses replicas — every output row must
        equal the DuckDB-solved BASE expectation with tokens suffixed
        xr and doc_id shifted r*n. Full 1.25M-row compare (ints and
        texts), zero sampling."""
        import duckdb
        import numpy as np
        import pandas as pd
        from ocr_model_ray.functions.span_dedup import span_dedup

        t0 = time.time()
        got = (span_dedup(fresh(), n=10, min_docs=2,
                          mode="distributed")
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        sec = round(time.time() - t0, 2)

        t0 = time.time()
        con = duckdb.connect()
        con.sql("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.1/documents.parquet'")
        base = (con.sql(_em.oracle_sql()["docs_span_dedup"]).df()
                .sort_values("doc_id").reset_index(drop=True))
        nb = len(base)
        ok = len(got) == nb * REPLICAS
        if ok:
            rep = got["doc_id"].to_numpy() // nb
            base_id = got["doc_id"].to_numpy() % nb
            order = np.lexsort((base_id, rep))
            g = got.iloc[order].reset_index(drop=True)
            exp_nt = np.tile(base["n_tokens"].to_numpy(), REPLICAS)
            exp_nr = np.tile(base["n_removed"].to_numpy(), REPLICAS)
            ok = (np.array_equal(g["n_tokens"].to_numpy(), exp_nt)
                  and np.array_equal(g["n_removed"].to_numpy(), exp_nr))
            if ok:
                texts = g["text"].to_numpy()
                for r in range(REPLICAS):
                    exp_txt = base["text"].str.replace(
                        r"(\S+)", rf"\1x{r}", regex=True).to_numpy()
                    if not (texts[r * nb:(r + 1) * nb]
                            == exp_txt).all():
                        ok = False
                        break
        osec = round(time.time() - t0, 2)
        print(json.dumps({"op": "span_dedup", "seconds": sec,
                          "rows": len(got), "match": bool(ok),
                          "oracle_seconds": osec,
                          "check": "base-oracle x salted replicas"}),
              flush=True)
        return ok

    def _run_minhash_ingest():
        """Cross-run ingest at volume vs the one-shot operator: even
        docs ingest as run A, odd as run B; the ingest's verified
        cross pairs, normalized to text-hash pairs, must equal the
        one-shot near_dup_pairs' near pairs restricted to mixed
        parity, with bit-equal Jaccards; exact cross pairs must count
        exactly what DuckDB's md5 self-join says."""
        import tempfile

        import numpy as np
        import pandas as pd
        from ocr_model_ray.functions.dedup_algos import near_dup_pairs
        from ocr_model_ray.state.minhash_index import (
            minhash_ingest, minhash_ingest_verified)

        t0 = time.time()
        idx = tempfile.mkdtemp(prefix="mh_soak_")
        run_a = fresh().map_batches(
            lambda df: df[df["doc_id"] % 2 == 0], batch_format="pandas")
        run_b = fresh().map_batches(
            lambda df: df[df["doc_id"] % 2 == 1], batch_format="pandas")
        minhash_ingest(run_a, idx, "a").materialize()
        cand = minhash_ingest(run_b, idx, "b")
        got = (minhash_ingest_verified(fresh(), cand, threshold=0.8)
               .to_pandas())
        sec = round(time.time() - t0, 2)

        t0 = time.time()
        import duckdb
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus}/part_*.parquet')")
        h = con.sql("SELECT doc_id, md5(text) AS h FROM documents").df()
        hmap = dict(zip(h["doc_id"], h["h"]))
        # per text-hash: which parities (runs) its docs span, and size
        par = h.assign(p=h["doc_id"] % 2)
        pset = par.groupby("h")["p"].agg(set).to_dict()
        gsize = par.groupby(["h", "p"]).size().to_dict()

        def mixed_possible(ha, hb):
            # exists (a in group(ha), b in group(hb)) of opposite parity
            if ha == hb:
                return len(pset[ha]) == 2
            return (0 in pset[ha] and 1 in pset[hb]) or \
                   (1 in pset[ha] and 0 in pset[hb])

        def n_mixed(ha, hb):
            if ha == hb:
                return gsize.get((ha, 0), 0) * gsize.get((ha, 1), 0)
            return (gsize.get((ha, 0), 0) * gsize.get((hb, 1), 0)
                    + gsize.get((ha, 1), 0) * gsize.get((hb, 0), 0))

        def hkey(df):
            ha = df["doc_a"].map(hmap)
            hb = df["doc_b"].map(hmap)
            return list(map(tuple, np.sort(
                np.stack([ha.to_numpy(), hb.to_numpy()], axis=1),
                axis=1)))

        got_keys = hkey(got)
        got_set = set(got_keys)
        # expected: every one-shot pair's hash pair that CAN cross
        # runs, plus the exact groups that span both runs
        want = near_dup_pairs(fresh(), threshold=0.8)
        if not isinstance(want, pd.DataFrame):
            want = want.to_pandas()
        jw = {}
        for a, b, j in zip(want["doc_a"], want["doc_b"],
                           want["jaccard"]):
            jw[tuple(sorted((hmap[a], hmap[b])))] = j
        want_set = {k for k in jw if mixed_possible(*k)}
        ok = got_set == want_set
        # ingest emits EVERY mixed-parity member combo per hash pair
        if ok:
            from collections import Counter
            cnt = Counter(got_keys)
            ok = all(cnt[k] == n_mixed(*k) for k in want_set)
        # jaccard values bit-equal per hash pair
        if ok:
            jg = {k: j for k, j in zip(got_keys, got["jaccard"])}
            ok = all(jg[k] == jw[k] for k in want_set)
        osec = round(time.time() - t0, 2)
        print(json.dumps({"op": "minhash_ingest", "seconds": sec,
                          "rows": len(got), "match": bool(ok),
                          "hash_pairs": len(want_set),
                          "oracle_seconds": osec,
                          "check": "one-shot near_dup hash pairs x "
                                   "run-crossing expansion"}),
              flush=True)
        if not ok:
            print(json.dumps({
                "minhash_debug": {
                    "got_only": list(map(list, got_set - want_set))[:5],
                    "want_only": list(map(list, want_set - got_set))[:5],
                }}), flush=True)
        return ok

    sel = set(args.ops.split(","))
    chosen = ops if args.ops == "all" else {
        k: v for k, v in ops.items() if k in sel}
    for name, (fn, sql) in chosen.items():
        all_ok &= run(name, fn, sql)

    if args.ops == "all" or "minhash_ingest" in sel:
        all_ok &= _run_minhash_ingest()

    if args.ops == "all" or "span_dedup" in sel:
        all_ok &= _run_span_dedup()

    # --- driver-pair ops: reuse the queries()/oracle_sql() twins
    # verbatim on the soak corpus (documents.parquet symlinks to the
    # part-file dir so the sf_dir contract holds) -------------------
    DRIVER_PAIR = ["docs_decontaminate", "docs_pii_scrub",
                   "docs_normalize", "docs_quality", "docs_token_count",
                   "docs_bpe_token_count", "docs_hash_split",
                   "docs_weighted_sample", "docs_repetition",
                   # url family: synth urls derive from doc_id alone,
                   # so the (doc_id, text) soak corpus suffices; dedup
                   # exercises canonicalize + the bucketed exchange,
                   # latest_snapshot the argmax combiner, at volume
                   "url_dedup", "url_latest_snapshot",
                   "url_host_quality_filter", "url_crawl_diff",
                   # quality tiers: the histogram cuts + label passes
                   # need only (doc_id, text); at 1.25M docs the cut
                   # derivation still collects <=4096 counters
                   "docs_quality_tiers", "docs_tier_stats",
                   "docs_tier_sample", "docs_length_percent_rank",
                   "docs_gopher_flags", "docs_posting_lists",
                   "docs_doc_tfidf"]
    # (docs_group_tfidf needs the lang column the salted soak corpus
    # doesn't carry; its token-bucket exchange is covered by the
    # top_tokens/vocab ops above)
    wanted = DRIVER_PAIR if args.ops == "all" else [
        n for n in DRIVER_PAIR
        if n in args.ops.split(",") or n.removeprefix("docs_")
        in args.ops.split(",")]
    if wanted:
        import __ray_entry__ as em
        import tests.test_queries_oracle as tq
        wrap = corpus + "_sf"
        os.makedirs(wrap, exist_ok=True)
        link = os.path.join(wrap, "documents.parquet")
        if not os.path.lexists(link):
            os.symlink(corpus, link)
        qs, sqls = em.queries(), em.oracle_sql()
        for name in wanted:
            all_ok &= run(
                name.removeprefix("docs_"),
                lambda name=name: tq._to_pandas(qs[name](wrap)),
                sqls[name])

    # --- near-dup ops: no feasible SQL oracle at this size; verified
    # structurally instead, each check independent of the engine code --
    import numpy as np
    import pandas as pd

    def run_checked(name, fn, check):
        t = time.time()
        got = fn()
        sec = round(time.time() - t, 2)
        t = time.time()
        ok, detail = check(got)
        print(json.dumps({"op": name, "seconds": sec, "rows": len(got),
                          "match": bool(ok), "check_seconds":
                          round(time.time() - t, 2), **detail}),
              flush=True)
        return ok

    import duckdb
    import pyarrow.parquet as pq
    n_base = pq.ParquetFile(
        "/root/testdata/sf0.1/documents.parquet").metadata.num_rows

    def fetch_texts(ids):
        con = duckdb.connect()
        con.register("want", pd.DataFrame({"doc_id": sorted(ids)}))
        df = con.sql(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{corpus}/part_*.parquet') "
            f"JOIN want USING (doc_id)").df()
        return dict(zip(df["doc_id"], df["text"]))

    def true_jaccard(a: str, b: str, n: int = 3) -> float:
        def grams(t):
            w = t.split()
            k = min(n, len(w)) if w else 0
            return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)} \
                if k else set()
        ga, gb = grams(a), grams(b)
        u = len(ga | gb)
        # frozen spec: round(|A∩B|/|A∪B|, 6); two empty sets are equal
        return round(len(ga & gb) / u, 6) if u else 1.0

    def check_pairs(p):
        # (1) token salting makes replicas disjoint: every true pair is
        # within one replica
        same = (p["doc_a"] // n_base == p["doc_b"] // n_base)
        # (2) emitted jaccards equal an INDEPENDENT string-n-gram
        # recompute on the pair's texts, bit-exactly — all pairs up to
        # 100k, a deterministic every-k-th sample beyond (the pure-
        # Python recompute is the bottleneck, not the engine)
        chk = p if len(p) <= 100_000 else p.iloc[::len(p) // 100_000]
        ids = set(chk["doc_a"]) | set(chk["doc_b"])
        texts = fetch_texts(ids)
        tj = np.array([true_jaccard(texts[a], texts[b])
                       for a, b in zip(chk["doc_a"], chk["doc_b"])])
        exact = np.array_equal(tj.view("int64"),
                               chk["jaccard"].to_numpy().view("int64"))
        # (3) volume: pair count per replica tracks the base-run count
        per_rep = p.groupby(p["doc_a"] // n_base).size()
        return bool(same.all() and exact and len(per_rep) == REPLICAS), {
            "cross_replica": int((~same).sum()),
            "jaccard_exact": bool(exact),
            "replicas_with_pairs": int(len(per_rep)),
            "pairs_per_replica_minmax":
                [int(per_rep.min()), int(per_rep.max())]}

    def check_clusters(c):
        # independent driver union-find over the emitted pairs: the
        # engine's distributed min-label propagation must agree exactly
        p = pairs_holder[0]
        parent = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(p["doc_a"], p["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for node in set(p["doc_a"]) | set(p["doc_b"]):
            want[int(node)] = find(int(node))
        got_map = dict(zip(c["doc_id"].astype(int),
                           c["cluster_id"].astype(int)))
        ok = got_map == want
        return bool(ok), {"nodes": len(want),
                          "union_find_equal": bool(ok)}

    if args.ops == "all" or sel & {"near_dup", "near_dup_clusters"}:
        from ocr_model_ray.functions.dedup_algos import (
            min_label_propagation, near_dup_pairs)
        pairs_holder = []

        def _pairs():
            p = near_dup_pairs(fresh())
            pairs_holder.append(p)
            return p

        def _clusters():
            out = min_label_propagation(pairs_holder[0])
            return out if isinstance(out, pd.DataFrame) else out.to_pandas()

        all_ok &= run_checked("near_dup", _pairs, check_pairs)
        all_ok &= run_checked("near_dup_clusters", _clusters,
                              check_clusters)
    print(json.dumps({"soak": "PASS" if all_ok else "FAIL"}))
    ray.shutdown()
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
