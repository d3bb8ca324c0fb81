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
