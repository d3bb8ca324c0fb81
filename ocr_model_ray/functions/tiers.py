"""Quality-tier extraction: corpus-relative tier labels from exact
rank cuts over an integer per-document score.

Engine extension (no reference counterpart): LLM-corpus pipelines
bucket documents into quality tiers before sampling/mixing — CCNet
splits by perplexity terciles, FineWeb publishes score-bucketed dumps,
and data-mixing recipes weight tiers differently. The primitive is
"label every document with its corpus-relative quantile bucket",
which naively needs a global sort (NTILE over 10^12 rows).

This module gets EXACT rank cuts with no sort and no shuffle of
document data, by exploiting the score being a small integer
(whitespace word count, clamped):

* pass 1 streams the corpus once, emitting per-block score histograms
  (<= cap+1 distinct (s, n) rows per block) — an order-independent,
  mergeable, EXACT sketch; one bounded groupby-sum merges them
  (key domain <= cap+1 regardless of corpus size);
* cuts derive on the driver from the <=4096-row histogram:
  ``cut_q = min{ s : cum_count(s) >= q * N }`` (percentile_disc by
  rank; the ``cum >= q*N`` comparison is done in float64 with the
  exact same arithmetic as the SQL oracle);
* pass 2 streams the corpus again, labeling each doc
  ``tier = 1 + |{q : clamp(score) > cut_q}|`` — ties AT a cut fall
  into the lower tier. Tiers are 1..len(qs)+1, 1 = shortest docs.

Clamping at ``cap`` (default 4095) bounds the histogram; it can only
merge docs above the top cut into the top tier, never reorder tiers
(cuts themselves clamp identically on both sides).

Semantics mirrored exactly by the SQL oracle in ``__ray_entry__``:
score = ``len(regexp_extract_all(text, '\\S+'))`` (whitespace token
count, the docs_token_count rule); null text counts 0 words.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

#: tier quantile cut points (quartiles -> 4 tiers)
TIER_QS = (0.25, 0.5, 0.75)
#: histogram clamp: scores above this merge into the top bin
SCORE_CAP = 4095


def _word_counts(t: pa.Table, text_col: str) -> np.ndarray:
    """Whitespace token count per row — maximal ``\\S+`` runs, the
    exact docs_token_count rule; nulls count 0."""
    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = pc.count_substring_regex(arr, r"\S+")
    n = pc.fill_null(n, 0)
    return n.to_numpy(zero_copy_only=False).astype(np.int64)


def word_count_cuts(ds: rd.Dataset, text_col: str = "text",
                    qs: tuple = TIER_QS, cap: int = SCORE_CAP,
                    mode: str = "auto") -> list[int]:
    """Exact rank cuts over the clamped word-count distribution: ONE
    streaming histogram pass (bounded key domain <= cap+1), driver
    finish over the tiny merged histogram. Empty corpus -> all-zero
    cuts (every doc of a later pass would land in tier 1)."""
    from .dedup_algos import _resolve_mode

    def partial(t: pa.Table) -> pa.Table:
        s = np.minimum(_word_counts(t, text_col), cap)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"s": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    if _resolve_mode(ds, mode) == "local":
        merged = partials.to_pandas()
        if merged.empty or "s" not in merged.columns:
            merged = pd.DataFrame({"s": [], "n": []})
        merged = merged.groupby("s", as_index=False)["n"].sum()
    else:
        from ray.data.aggregate import Sum
        merged = (partials.groupby("s")
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    if merged.empty:
        return [0] * len(qs)
    merged = merged.sort_values("s")
    s = merged["s"].to_numpy()
    cum = np.cumsum(merged["n"].to_numpy()).astype(np.float64)
    total = cum[-1]
    # same float64 comparison as the oracle:
    # CAST(cum AS DOUBLE) >= q * CAST(total AS DOUBLE)
    return [int(s[np.argmax(cum >= q * total)]) for q in qs]


def quality_tiers(ds: rd.Dataset, id_col: str = "doc_id",
                  text_col: str = "text", qs: tuple = TIER_QS,
                  cap: int = SCORE_CAP, with_hash: bool = False,
                  mode: str = "auto") -> rd.Dataset:
    """Label every document with its corpus-relative quality tier.

    Output: (id_col, n_words:int64 [unclamped], tier:int32
    [1..len(qs)+1]); with ``with_hash``, an extra ``h`` column of
    md5(text) hex for downstream deterministic per-tier sampling
    (computed in the same pass so no join is needed later).

    Two streaming passes over the corpus (histogram, then label); the
    cuts are three ints captured in the closure — nothing broadcast,
    nothing shuffled."""
    cuts = word_count_cuts(ds, text_col=text_col, qs=qs, cap=cap,
                           mode=mode)

    def label(t: pa.Table) -> pa.Table:
        n = _word_counts(t, text_col)
        s = np.minimum(n, cap)
        tier = np.ones(len(n), dtype=np.int32)
        for c in cuts:
            tier += (s > c).astype(np.int32)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        cols = {id_col: ids,
                "n_words": pa.array(n),
                "tier": pa.array(tier, pa.int32())}
        if with_hash:
            from .text_stats import md5_hex
            txt = t[text_col]
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            h = md5_hex(pd.Series(txt.to_pandas()))
            cols["h"] = pa.array(h.to_numpy(), pa.string())
        return pa.table(cols)

    return ds.map_batches(label, batch_format="pyarrow")


def length_percent_rank(ds: rd.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", cap: int = SCORE_CAP,
                        mode: str = "auto") -> rd.Dataset:
    """Exact global SQL PERCENT_RANK() of every doc by (clamped) word
    count — the window function that naively needs a full sort of the
    corpus, computed instead from the same bounded integer histogram
    as the tier cuts: peer-first rank(s) = cum_before(s), so
    ``pr = cum_before(clamp(score)) / (N - 1)`` (0.0 when N <= 1).
    Docs above ``cap`` share the top peer group (the documented clamp
    trade-off). One histogram pass + one label pass; no sort.

    Output: (id_col, n_words:int64 [unclamped], pr:float64)."""
    from .dedup_algos import _resolve_mode

    def partial(t: pa.Table) -> pa.Table:
        s = np.minimum(_word_counts(t, text_col), cap)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"s": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    if _resolve_mode(ds, mode) == "local":
        merged = partials.to_pandas()
        if merged.empty or "s" not in merged.columns:
            merged = pd.DataFrame({"s": [], "n": []})
        merged = merged.groupby("s", as_index=False)["n"].sum()
    else:
        from ray.data.aggregate import Sum
        merged = (partials.groupby("s")
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    cum_before = np.zeros(cap + 1, dtype=np.float64)
    total = 0
    if not merged.empty:
        merged = merged.sort_values("s")
        sv = merged["s"].to_numpy()
        nv = merged["n"].to_numpy()
        total = int(nv.sum())
        cb = np.concatenate([[0], np.cumsum(nv)[:-1]])
        cum_before[sv] = cb
        # propagate: scores between observed values rank above all
        # smaller observed scores (no such docs exist, but keep the
        # array monotone for safety)
        cum_before = np.maximum.accumulate(cum_before)
    denom = float(total - 1)

    def label(t: pa.Table) -> pa.Table:
        n = _word_counts(t, text_col)
        s = np.minimum(n, cap)
        pr = (cum_before[s] / denom if total > 1
              else np.zeros(len(n), dtype=np.float64))
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: ids,
                         "n_words": pa.array(n),
                         "pr": pa.array(pr, pa.float64())})

    return ds.map_batches(label, batch_format="pyarrow")


def tier_stats(tiers: rd.Dataset) -> pd.DataFrame:
    """Per-tier corpus stats over a quality_tiers output: (tier,
    n_docs, total_words, mean_words). Bounded key domain (<= 4 tiers)
    -> per-block partial sums, tiny driver finish."""
    def partial(t: pa.Table) -> pa.Table:
        tier = t["tier"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_words"].to_numpy(zero_copy_only=False).astype(np.int64)
        if tier.size == 0:
            return pa.table({"tier": pa.array([], pa.int32()),
                             "n_docs": pa.array([], pa.int64()),
                             "total_words": pa.array([], pa.int64())})
        u, inv = np.unique(tier, return_inverse=True)
        nd = np.bincount(inv)
        tw = np.bincount(inv, weights=w).astype(np.int64)
        return pa.table({"tier": pa.array(u.astype(np.int32)),
                         "n_docs": pa.array(nd.astype(np.int64)),
                         "total_words": pa.array(tw)})

    pdf = (tiers.map_batches(partial, batch_format="pyarrow",
                             batch_size=None).to_pandas())
    if pdf.empty or "tier" not in pdf.columns:
        return pd.DataFrame({"tier": pd.array([], dtype="int32"),
                             "n_docs": pd.array([], dtype="int64"),
                             "total_words": pd.array([], dtype="int64"),
                             "mean_words": pd.array([], dtype="float64")})
    out = pdf.groupby("tier", as_index=False).sum()
    out["tier"] = out["tier"].astype("int32")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_words"] = out["total_words"].astype("int64")
    # same IEEE op as CAST(sum AS DOUBLE) / count
    out["mean_words"] = (out["total_words"].to_numpy().astype(np.float64)
                         / out["n_docs"].to_numpy().astype(np.float64))
    return out
