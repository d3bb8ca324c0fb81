"""Domain-mixture reweighting: per-source token shares -> sampling
weights -> a deterministic rebalanced corpus.

Engine extension (no reference counterpart): LLM training corpora mix
sources (web crawl, code, reference text) toward a TARGET distribution
rather than the crawl's natural one (data-mixing recipes from the
Pile/DoReMi line of work). The primitive pair:

* ``source_mix_weights``: one streaming pass of per-block partial sums
  (source, n_docs, n_tokens) -> one bucketed 3-column exchange keyed
  on source -> tiny driver frame with ``token_share`` and
  ``weight = target_share / token_share``. Default target is uniform
  across observed sources. The exchange moves one row per
  (block x source) — never text.
* ``mix_rebalance``: realize the weights as a DOWNSAMPLE (keep
  probability ``p = min(weight, 1)``; oversampling needs row
  repetition and is intentionally out of scope — a weight > 1 keeps
  everything). Keep rule is deterministic content hashing, the
  docs_deterministic_sample family rule: keep iff
  ``int(md5(text)[:8], 16) < floor(p * 2^32)`` — stable across reruns,
  partitionings and engines; null text never keeps (md5(NULL)=NULL).

Both halves are mirrored exactly by SQL oracles in ``__ray_entry__``
(identical operation order on doubles)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def source_mix_weights(ds: rd.Dataset, target: dict | None = None,
                       source_col: str = "source",
                       text_col: str = "text",
                       num_buckets: int = 16) -> pd.DataFrame:
    """Per-source corpus shares and mixing weights.

    Output (driver frame, one row per source): (source, n_docs:int64,
    n_tokens:int64, token_share:float64, weight:float64) where
    ``weight = target_share / token_share`` (0.0 for a tokenless
    source). ``target`` maps source -> desired token share; sources
    absent from a provided target get share 0. Default: uniform over
    observed sources."""
    from .bucketed import bucketed_agg
    from .tiers import _word_counts

    def partial(t: pa.Table) -> pa.Table:
        n = _word_counts(t, text_col)
        src = t[source_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        sv = src.to_numpy(zero_copy_only=False)
        if sv.size == 0:
            return pa.table({source_col: pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        u, inv = np.unique(sv, return_inverse=True)
        nd = np.bincount(inv).astype(np.int64)
        nt = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table({source_col: pa.array(u, pa.string()),
                         "n_docs": pa.array(nd),
                         "n_tokens": pa.array(nt)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    agg = bucketed_agg(partials, source_col,
                       {"n_docs": ("n_docs", "sum"),
                        "n_tokens": ("n_tokens", "sum")},
                       num_buckets=num_buckets)
    pdf = agg.to_pandas()
    if pdf.empty or source_col not in pdf.columns:
        return pd.DataFrame({source_col: pd.array([], dtype="string"),
                             "n_docs": pd.array([], dtype="int64"),
                             "n_tokens": pd.array([], dtype="int64"),
                             "token_share": pd.array([], dtype="float64"),
                             "weight": pd.array([], dtype="float64")})
    pdf = pdf.sort_values(source_col).reset_index(drop=True)
    pdf["n_docs"] = pdf["n_docs"].astype("int64")
    pdf["n_tokens"] = pdf["n_tokens"].astype("int64")
    total = float(pdf["n_tokens"].sum())
    nt = pdf["n_tokens"].to_numpy().astype(np.float64)
    # same op order as the oracle: CAST(n AS DOUBLE) / total
    share = nt / total if total > 0 else np.zeros(len(pdf))
    if target is None:
        tshare = np.full(len(pdf), 1.0 / len(pdf))
    else:
        tshare = pdf[source_col].map(
            lambda s: float(target.get(s, 0.0))).to_numpy()
    with np.errstate(divide="ignore", invalid="ignore"):
        weight = np.where(share > 0, tshare / share, 0.0)
    pdf["token_share"] = share
    pdf["weight"] = weight
    return pdf


def mix_rebalance(ds: rd.Dataset, weights: pd.DataFrame,
                  id_col: str = "doc_id", source_col: str = "source",
                  text_col: str = "text",
                  oversample: bool = False) -> rd.Dataset:
    """Deterministic sampling realizing mixing weights.

    Downsample (default): keep a doc of source s iff
    ``int(md5(text)[:8], 16) < floor(min(weight_s, 1) * 2^32)``
    (weights > 1 keep everything). Output: (id_col, source_col).

    With ``oversample=True``, weights > 1 REPEAT documents (epoch-style
    upsampling): a doc of weight w appears ``floor(w)`` times plus one
    more iff its hash passes the fractional part —
    ``int(md5(text)[:8], 16) < floor((w - floor(w)) * 2^32)``. Output
    gains a ``copy`` column (0-based repeat index) so downstream
    shuffles can distinguish the repeats.

    Weights frame comes from ``source_mix_weights``; per-source ints
    ride the task closure. Streaming either way."""
    from .text_stats import md5_hex

    base = {s: int(np.floor(float(w)))
            for s, w in zip(weights[source_col], weights["weight"])}
    frac_thr = {
        s: int(np.floor((float(w) - np.floor(float(w))) * 4294967296.0))
        for s, w in zip(weights[source_col], weights["weight"])
    }
    down_thr = {
        s: int(np.floor(min(float(w), 1.0) * 4294967296.0))
        for s, w in zip(weights[source_col], weights["weight"])
    }

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        hx = md5_hex(df[text_col]).str[:8]
        h = hx.map(lambda v: int(v, 16) if isinstance(v, str) else None)
        t = df[source_col].map(lambda s: down_thr.get(s, 0))
        mask = pd.Series(
            [hv is not None and hv < tv for hv, tv in zip(h, t)],
            index=df.index)
        out = df.loc[mask, [id_col, source_col]].copy()
        out[id_col] = out[id_col].astype("int64")
        return out

    def repeat(df: pd.DataFrame) -> pd.DataFrame:
        hx = md5_hex(df[text_col]).str[:8]
        h = hx.map(lambda v: int(v, 16) if isinstance(v, str) else None)
        nb = df[source_col].map(lambda s: base.get(s, 0)).to_numpy()
        ft = df[source_col].map(lambda s: frac_thr.get(s, 0))
        extra = np.array(
            [hv is not None and hv < tv for hv, tv in zip(h, ft)])
        copies = (nb + extra).astype(np.int64)
        ids = np.repeat(df[id_col].to_numpy().astype(np.int64), copies)
        srcs = np.repeat(df[source_col].to_numpy(), copies)
        starts = np.concatenate([[0], np.cumsum(copies)[:-1]])
        copy_idx = (np.arange(int(copies.sum()), dtype=np.int64)
                    - np.repeat(starts, copies))
        return pd.DataFrame({id_col: ids, source_col: srcs,
                             "copy": copy_idx})

    return ds.map_batches(repeat if oversample else keep,
                          batch_format="pandas")
