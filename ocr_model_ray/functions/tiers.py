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


def _id_md5(ids: np.ndarray) -> np.ndarray:
    """md5 hex of each id's decimal string — the deterministic,
    engine-independent order key (SQL: md5(CAST(id AS VARCHAR)))."""
    import hashlib
    return np.fromiter(
        (hashlib.md5(str(int(v)).encode()).hexdigest() for v in ids),
        count=len(ids), dtype=object)


#: hex-prefix bins for the distributed budget cut (3 hex digits)
_BUDGET_BINS = 4096


def token_budget_select(ds: rd.Dataset, budget: int,
                        id_col: str = "doc_id",
                        text_col: str = "text", qs: tuple = TIER_QS,
                        cap: int = SCORE_CAP,
                        mode: str = "auto") -> rd.Dataset:
    """Token-budget corpus selection — the tier-extraction endgame:
    given a global token budget, keep documents best-tier-first until
    the budget is exhausted, cutting INSIDE the marginal tier
    deterministically.

    Frozen total order (mirrored by the SQL twin's window):
    ``(tier DESC, md5(CAST(id AS VARCHAR)), id)`` — higher quality
    tiers are consumed first, and within a tier the md5 order is a
    deterministic, rerun- and partitioning-stable shuffle. A document
    is kept iff its INCLUSIVE running token total is <= ``budget``
    (``SUM(n_words) OVER (ORDER BY ...) <= budget`` — prefix
    semantics: the first doc that overflows is dropped and so is
    everything after it, even later docs that would individually fit).

    Output: (id_col, n_words:int64, tier:int32) for the kept docs.

    Distributed plan (the 10^12-doc shape) — no sort, no shuffle of
    document data, ONE tiny combiner exchange:

    1. ``quality_tiers`` labels the stream (its two histogram passes);
    2. one more streaming pass emits per-batch partial token sums
       keyed by (tier, first-3-hex-digits-of-md5) — a bounded
       (n_tiers x 4096)-row sketch, folded on the driver;
    3. the driver prefix-sums the bins in order: bins fully inside
       the budget become a broadcast boolean mask; the ONE threshold
       bin is resolved exactly by collecting just its rows
       (expected corpus/(tiers x 4096) docs — recurse the hex prefix
       if a corpus ever needs a tighter bound) and replaying the
       window over them;
    4. the final pass keeps docs via mask lookup + threshold-bin id
       set (broadcast), streaming.

    Integer token counts end-to-end -> bit-equal across plans,
    partitionings, and vs the SQL window replay."""
    from .dedup_algos import _resolve_mode

    labeled = quality_tiers(ds, id_col=id_col, text_col=text_col,
                            qs=qs, cap=cap, mode=mode)
    n_tiers = len(qs) + 1
    empty = pd.DataFrame({
        id_col: pd.Series([], dtype="int64"),
        "n_words": pd.Series([], dtype="int64"),
        "tier": pd.Series([], dtype="int32")})

    if _resolve_mode(ds, mode) == "local":
        frame = labeled.to_pandas()
        if frame.empty or "tier" not in frame.columns:
            return rd.from_pandas(empty)
        h = _id_md5(frame[id_col].to_numpy())
        order = np.lexsort((frame[id_col].to_numpy(), h,
                            -frame["tier"].to_numpy().astype(np.int64)))
        o = frame.iloc[order]
        keep = np.cumsum(o["n_words"].to_numpy().astype(np.int64)) \
            <= budget
        out = o[keep][[id_col, "n_words", "tier"]]
        return rd.from_pandas(out.reset_index(drop=True)
                              .astype({"n_words": "int64",
                                       "tier": "int32"}))

    def binned_partial(t: pa.Table) -> pa.Table:
        tier = t["tier"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_words"].to_numpy(zero_copy_only=False).astype(np.int64)
        if tier.size == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "tok": pa.array([], pa.int64())})
        h = _id_md5(t[id_col].to_numpy(zero_copy_only=False))
        b = np.fromiter((int(x[:3], 16) for x in h),
                        count=len(h), dtype=np.int64)
        k = tier * _BUDGET_BINS + b
        u, inv = np.unique(k, return_inverse=True)
        tok = np.bincount(inv, weights=w).astype(np.int64)
        return pa.table({"k": pa.array(u), "tok": pa.array(tok)})

    folded = (labeled.map_batches(binned_partial,
                                  batch_format="pyarrow",
                                  batch_size=None).to_pandas())
    if folded.empty or "k" not in folded.columns:
        return rd.from_pandas(empty)
    folded = folded.groupby("k", as_index=False)["tok"].sum()
    k = folded["k"].to_numpy()
    tok = folded["tok"].to_numpy().astype(np.int64)
    tier_of = k // _BUDGET_BINS
    bin_of = k % _BUDGET_BINS
    # consume order: tier DESC, bin ASC
    order = np.lexsort((bin_of, -tier_of))
    cum = np.cumsum(tok[order])
    full = cum <= budget
    # bins fully inside the budget -> broadcast boolean mask
    keep_mask = np.zeros((n_tiers + 2) * _BUDGET_BINS, dtype=bool)
    for i in np.nonzero(full)[0]:
        keep_mask[int(k[order[i]])] = True
    # the ONE threshold bin (first not-full bin in consume order),
    # if any budget remains for it
    thr_ids: np.ndarray | None = None
    thr_key = -1
    not_full = np.nonzero(~full)[0]
    if not_full.size:
        j = int(not_full[0])
        thr_key = int(k[order[j]])
        residual = int(budget) - int(cum[j - 1] if j else 0)
        if residual > 0:
            t_tier = thr_key // _BUDGET_BINS
            t_bin = thr_key % _BUDGET_BINS

            def only_thr(t: pa.Table) -> pa.Table:
                tier = t["tier"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                ids = t[id_col].to_numpy(zero_copy_only=False)
                h = _id_md5(ids)
                b = np.fromiter((int(x[:3], 16) for x in h),
                                count=len(h), dtype=np.int64)
                sel = (tier == t_tier) & (b == t_bin)
                return pa.table({
                    id_col: pa.array(ids[sel].astype(np.int64)),
                    "h": pa.array(h[sel], pa.string()),
                    "w": pa.array(t["n_words"].to_numpy(
                        zero_copy_only=False)[sel].astype(np.int64))})

            thr = labeled.map_batches(only_thr,
                                      batch_format="pyarrow").to_pandas()
            if not thr.empty:
                o = thr.sort_values(["h", id_col], kind="mergesort")
                kk = np.cumsum(o["w"].to_numpy()) <= residual
                thr_ids = np.sort(o[kk][id_col].to_numpy()
                                  .astype(np.int64))

    import ray
    mref = ray.put(keep_mask)
    iref = ray.put(thr_ids if thr_ids is not None
                   else np.empty(0, dtype=np.int64))

    def final(t: pa.Table) -> pa.Table:
        km = ray.get(mref)
        ti = ray.get(iref)
        tier = t["tier"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if tier.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64()),
                             "tier": pa.array([], pa.int32())})
        h = _id_md5(ids)
        b = np.fromiter((int(x[:3], 16) for x in h),
                        count=len(h), dtype=np.int64)
        sel = km[tier * _BUDGET_BINS + b]
        if ti.size:
            pos = np.searchsorted(ti, ids)
            np.minimum(pos, ti.size - 1, out=pos)
            sel |= ti[pos] == ids
        return pa.table({
            id_col: pa.array(ids[sel]),
            "n_words": pa.array(t["n_words"].to_numpy(
                zero_copy_only=False)[sel].astype(np.int64)),
            "tier": pa.array(t["tier"].to_numpy(
                zero_copy_only=False)[sel].astype(np.int32),
                pa.int32())})

    return labeled.map_batches(final, batch_format="pyarrow")
