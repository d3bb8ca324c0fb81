"""Inverted-index construction: (token -> posting list) with a
document-frequency band.

Engine extension (no reference counterpart): building a search index
over a crawl is the canonical "wide" text shuffle — every (token,
doc_id) pair moves to its token's partition. This module implements
the build as ONE hash-bucketed exchange with per-block combining:

* per block, pairs are deduplicated to distinct (doc, token) BEFORE
  the exchange (a token repeated 100x in one doc ships once);
* the exchange is bucketed by token hash (``_bucket_ids``), so skewed
  tokens spread only as far as their bucket, and each bucket resolves
  its tokens' document frequencies locally;
* a df band [min_df, max_df] filters at the bucket: singleton tokens
  (min_df) are noise for retrieval, and stop-tokens above max_df would
  dominate the output volume — both bounds are part of the operator's
  contract (logged, not silent).

Output: (token, df:int64, doc_id:int64) exploded posting pairs —
partition-friendly (write_parquet keyed on the token bucket gives a
resumable sharded index). At 100 TB the exchange volume is the index
size itself, which is the irreducible cost of an index build.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .corpus_stats import WS_SPLIT

log = logging.getLogger("ocr_model_ray.inverted_index")


def _distinct_pairs_block(t: pa.Table, id_col: str,
                          text_col: str) -> pa.Table:
    """Distinct (doc_id, token) pairs for one batch of whole docs."""
    lists = pc.split_pattern_regex(t[text_col], WS_SPLIT)
    flat = pc.list_flatten(lists)
    par = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tok = flat.to_numpy(zero_copy_only=False)
    keep = tok != ""
    tok, par = tok[keep], par[keep]
    if tok.size:
        # distinct within each doc: one row IS one whole doc, so
        # in-block distinct == per-doc distinct
        df = pd.DataFrame({"doc_id": ids[par], "token": tok})
        df = df.drop_duplicates()
        return pa.table({"token": pa.array(df["token"].to_numpy(),
                                           pa.string()),
                         "doc_id": pa.array(df["doc_id"].to_numpy(),
                                            pa.int64())})
    return pa.table({"token": pa.array([], pa.string()),
                     "doc_id": pa.array([], pa.int64())})


def inverted_postings(ds: rd.Dataset, min_df: int = 2,
                      max_df: int = 1_000_000_000,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_buckets: int = 64) -> rd.Dataset:
    """Posting pairs (token, df, doc_id) for tokens whose distinct-doc
    frequency lies in [min_df, max_df]. One bucketed exchange of
    per-block-distinct pairs; df resolves and filters inside each
    bucket — nothing collects on the driver."""
    from .bucketed import _bucket_ids

    def explode(t: pa.Table) -> pa.Table:
        pairs = _distinct_pairs_block(t, id_col, text_col)
        return pairs.append_column(
            "__b", _bucket_ids(pairs, ["token"], num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_per_tok = g.groupby("token")["doc_id"].transform("size")
        kept = g[(df_per_tok >= min_df) & (df_per_tok <= max_df)]
        n_drop = len(g) - len(kept)
        if n_drop:
            log.info("inverted_postings: df band [%d, %d] dropped %d "
                     "of %d pairs in bucket", min_df, max_df, n_drop,
                     len(g))
        out = pd.DataFrame({
            "token": kept["token"].to_numpy(),
            "df": df_per_tok[kept.index].to_numpy().astype(np.int64),
            "doc_id": kept["doc_id"].to_numpy().astype(np.int64),
        })
        return out

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    return (pairs.groupby("__b")
            .map_groups(per_bucket, batch_format="pandas"))


def bm25_stats(ds: rd.Dataset, terms, id_col: str = "doc_id",
               text_col: str = "text"):
    """Corpus statistics for BM25 over ``terms``: (N, total_len,
    df_per_term) folded from per-block partials — one streaming pass,
    a k+2-number reduce on the driver, nothing else leaves the
    workers. NULL-text docs are excluded from N and the length sum
    (the SQL twin's WHERE text IS NOT NULL)."""
    terms = list(terms)

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        valid = pc.is_valid(texts)
        texts = texts.filter(valid)
        lists = pc.split_pattern_regex(texts, WS_SPLIT)
        flat = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
        tok = flat.to_numpy(zero_copy_only=False)
        keep = tok != ""
        tok, par = tok[keep], par[keep]
        n = int(pc.sum(valid).as_py() or 0)
        total_len = int(tok.size)
        dfs = []
        for term in terms:
            dfs.append(int(np.unique(par[tok == term]).size))
        return pa.table({"n": pa.array([n], pa.int64()),
                         "total_len": pa.array([total_len], pa.int64()),
                         **{f"df_{i}": pa.array([d], pa.int64())
                            for i, d in enumerate(dfs)}})

    n = 0
    total_len = 0
    dfs = np.zeros(len(terms), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        import pyarrow.compute as _pc
        n += int(_pc.sum(b["n"]).as_py() or 0)
        total_len += int(_pc.sum(b["total_len"]).as_py() or 0)
        for i in range(len(terms)):
            dfs[i] += int(_pc.sum(b[f"df_{i}"]).as_py() or 0)
    return n, total_len, dfs


def bm25_topk(ds: rd.Dataset, terms, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id",
              text_col: str = "text") -> pd.DataFrame:
    """BM25 ranked retrieval: top-k docs for a bag-of-terms query.

    Two streaming passes, zero shuffles:

      1. ``bm25_stats`` folds (N, avgdl, df per term) from per-block
         partials;
      2. the scoring pass re-reads the corpus with the k+2 scalars
         broadcast, computes each candidate's score VECTORIZED (one
         is_in + per-doc bincounts per block), and only each block's
         local top-k rows travel (``functions.topk`` doctrine).

    The score is the standard Lucene-shaped BM25:
    ``idf_t = ln((N - df + 0.5)/(df + 0.5) + 1)``,
    ``contrib = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``,
    summed over the query terms IN GIVEN ORDER (left-to-right float64
    adds, matching the SQL twin's literal expression — aggregation-
    order-free, so bit-exact against DuckDB). Ties break by doc_id
    ascending. Output: (doc_id, score) pandas frame, k rows."""
    from .topk import topk as _topk

    terms = list(terms)
    n, total_len, dfs = bm25_stats(ds, terms, id_col=id_col,
                                   text_col=text_col)
    if n == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = float(total_len) / float(n)
    import math
    # math.log = libm ln (same kernel DuckDB's ln calls); numpy's
    # vectorized log can differ in the last ulp
    idfs = [math.log((n - int(df) + 0.5) / (int(df) + 0.5) + 1.0)
            for df in dfs]

    def score_block(t: pa.Table) -> pd.DataFrame:
        texts = t[text_col]
        valid_mask = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        # keep the id column's native dtype (string doc ids — e.g.
        # urls — must survive the round trip)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        lists = pc.split_pattern_regex(pc.fill_null(texts, ""), WS_SPLIT)
        flat = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
        tok = flat.to_numpy(zero_copy_only=False)
        keep = tok != ""
        tok, par = tok[keep], par[keep]
        dl = np.bincount(par, minlength=len(t)).astype(np.float64)
        score = np.zeros(len(t), dtype=np.float64)
        any_tf = np.zeros(len(t), dtype=bool)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        for term, idf in zip(terms, idfs):
            tf = np.bincount(par[tok == term],
                             minlength=len(t)).astype(np.float64)
            contrib = np.where(
                tf > 0, idf * tf * (k1 + 1.0) / (tf + denom_base), 0.0)
            score = score + contrib
            any_tf |= tf > 0
        cand = any_tf & valid_mask
        return pd.DataFrame({id_col: ids[cand], "score": score[cand]})

    scored = ds.map_batches(score_block, batch_format="pyarrow")
    out = _topk(scored, by=["score", id_col], k=k,
                descending=[True, False])
    return out.reset_index(drop=True)
