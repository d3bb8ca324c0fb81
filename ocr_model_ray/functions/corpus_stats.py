"""Corpus-level statistics over a document table: token frequencies,
vocabulary size (exact + HyperLogLog approximate), all shaped for
10^12-doc inputs.

* Tokenization is ``pc.split_pattern_regex`` over an explicit ASCII
  whitespace class — pyarrow's RE2 is the same engine DuckDB uses, so
  the SQL oracles split byte-for-byte identically (``\\s`` differs
  between engines; an explicit class doesn't).
* ``top_tokens`` / ``vocab_size`` follow the combiner pattern: exact
  per-batch partial counts (pa.Table.group_by inside ``map_batches``)
  shrink each block to its local vocabulary BEFORE the one token
  shuffle — raw token streams never move. Small inputs (pure reads
  under the dedup_algos size cut) skip the shuffle and finish the
  partials in-process, pinned equal by test.
* ``approx_vocab_size`` is a HyperLogLog sketch (Flajolet et al. 2007,
  the standard 2^p-register formulation) as a Ray ``AggregateFnV2``:
  each block folds its token hashes into a 16 KB register vector,
  vectors combine by elementwise max (associative + commutative, so
  Ray's tree combine is exact), and finalize applies the
  bias-corrected estimate. The whole corpus reduces to 16 KB of state
  — the sketch path exists because exact distinct-count at 10^12 docs
  shuffles the full vocabulary while the sketch moves one register
  vector per block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .dedup_algos import _resolve_mode

#: ASCII whitespace split class, shared verbatim with the SQL oracles
WS_SPLIT = "[ \t\n\r\f\v]+"


def _token_counts_block(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(token, n) partial counts for one batch — the combiner."""
    flat = pc.list_flatten(pc.split_pattern_regex(t[text_col], WS_SPLIT))
    tbl = pa.table({"token": flat})
    tbl = tbl.filter(pc.not_equal(tbl["token"], ""))
    g = tbl.group_by("token").aggregate([([], "count_all")])
    return g.select(["token", "count_all"]).rename_columns(["token", "n"])


def top_tokens(ds: rd.Dataset, k: int = 50, text_col: str = "text",
               mode: str = "auto") -> pd.DataFrame:
    """Global top-k tokens by count (ties broken token-ascending).
    One shuffle over (token, partial-count) rows; local plan for small
    pure reads."""
    partials = ds.map_batches(
        lambda t: _token_counts_block(t, text_col),
        batch_format="pyarrow", batch_size=None)
    if _resolve_mode(ds, mode) == "local":
        merged = (partials.to_pandas()
                  .groupby("token", as_index=False)["n"].sum())
        out = (merged.sort_values(["n", "token"],
                                  ascending=[False, True], kind="mergesort")
               .head(k).reset_index(drop=True))
    else:
        from .bucketed import bucketed_agg
        from .topk import topk
        summed = bucketed_agg(partials, "token", {"n": ("n", "sum")})
        out = topk(summed, ["n", "token"], k=k, descending=[True, False])
    if out.empty or "n" not in out.columns:
        # token-free corpus: Ray's all-empty collect loses the schema
        return pd.DataFrame({"token": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out[["token", "n"]]


def vocab_size(ds: rd.Dataset, text_col: str = "text",
               mode: str = "auto") -> pd.DataFrame:
    """Exact distinct-token count. Per-batch partials already collapse
    each block to its unique tokens; the distributed plan counts
    distinct keys with one groupby shuffle."""
    partials = ds.map_batches(
        lambda t: _token_counts_block(t, text_col).select(["token"]),
        batch_format="pyarrow", batch_size=None)
    if _resolve_mode(ds, mode) == "local":
        n = int(partials.to_pandas()["token"].nunique())
    else:
        from .bucketed import bucketed_distinct
        n = bucketed_distinct(partials, "token").count()
    return pd.DataFrame({"n_distinct_tokens": pd.Series([n], dtype="int64")})


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
HLL_P = 14
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: 50-bit mask: hash bits not used for the register index feed the rank
_REST_BITS = 64 - HLL_P
_REST_MASK = np.uint64((1 << _REST_BITS) - 1)


def hll_fold(hashes: np.ndarray, regs: np.ndarray | None = None) -> np.ndarray:
    """Fold uint64 hashes into a register vector (elementwise-max
    update). Top p bits pick the register; the rank is the position of
    the first set bit in the remaining 50 (all-zero rest -> rank 51).
    The rest fits float64's 52-bit mantissa, so the log2-based
    bit-length is exact."""
    if regs is None:
        regs = np.zeros(HLL_M, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    idx = (hashes >> np.uint64(_REST_BITS)).astype(np.int64)
    rest = hashes & _REST_MASK
    bitlen = np.zeros(len(rest), dtype=np.int64)
    nz = rest > 0
    bitlen[nz] = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64) + 1
    rank = (_REST_BITS + 1 - bitlen).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected cardinality estimate with the small-range
    (linear-counting) correction; the 64-bit hash space needs no
    large-range correction at any realistic vocabulary."""
    e = _ALPHA * HLL_M * HLL_M / np.sum(np.exp2(-regs.astype(np.float64)))
    if e <= 2.5 * HLL_M:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return float(HLL_M * np.log(HLL_M / zeros))
    return float(e)


def _token_hashes_block(block: pa.Table, text_col: str) -> np.ndarray:
    flat = pc.list_flatten(pc.split_pattern_regex(block[text_col], WS_SPLIT))
    toks = flat.to_numpy(zero_copy_only=False)
    toks = toks[toks != ""]
    if toks.size == 0:
        return np.empty(0, dtype=np.uint64)
    # siphash with pandas' fixed default key: deterministic across
    # processes, so partial sketches from different workers agree
    return pd.util.hash_array(toks.astype(object))


try:
    from ray.data.aggregate import AggregateFnV2

    class HllVocab(AggregateFnV2):
        """Distributed HLL distinct-token sketch: 16 KB accumulator per
        block, elementwise-max combine, estimate on finalize."""

        def __init__(self, text_col: str = "text",
                     name: str = "approx_vocab") -> None:
            self._text_col = text_col
            super().__init__(name,
                             zero_factory=lambda: np.zeros(HLL_M, np.uint8),
                             on=None, ignore_nulls=True)

        def aggregate_block(self, block):
            if isinstance(block, pd.DataFrame):
                block = pa.Table.from_pandas(block)
            return hll_fold(_token_hashes_block(block, self._text_col))

        def combine(self, current_accumulator, new):
            return np.maximum(current_accumulator, new)

        def finalize(self, accumulator):
            return hll_estimate(accumulator)
except ImportError:  # older ray: expose the fold/estimate pieces only
    HllVocab = None


def approx_vocab_size(ds: rd.Dataset, text_col: str = "text") -> float:
    """HLL estimate of the distinct-token count (one 16 KB reduction;
    relative error ~1.04/sqrt(2^14) = 0.8%)."""
    if HllVocab is None:
        raise NotImplementedError("ray.data.aggregate.AggregateFnV2 required")
    out = ds.aggregate(HllVocab(text_col=text_col))
    return float(out["approx_vocab"])


def numeric_histogram(ds: rd.Dataset, col: str, lo: float, hi: float,
                      nbins: int = 20, mode: str = "auto") -> pd.DataFrame:
    """Fixed-width histogram over a numeric column: per-batch bin
    counts (one small row per occupied bin per batch) -> grouped sum.
    Out-of-range values clamp into the edge bins, so every row is
    counted exactly once. Bin rule (shared verbatim with the SQL
    oracle): ``clamp(floor((x - lo) / w), 0, nbins-1)``.
    Output: (bin, bin_lo, bin_hi, n) for every bin, zeros included."""
    w = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        # nulls and NaNs diverge in the SQL rule and must here too
        # (verified live): least(greatest(floor(NULL),0),19) -> 0
        # (greatest/least IGNORE NULL args), while NaN orders greatest
        # -> top bin. numpy conversion collapses both to NaN, so take
        # the null mask from arrow first. Without the explicit mapping
        # the float->int64 cast of NaN is UB and rows silently vanish.
        nulls = pc.is_null(arr, nan_is_null=False).to_numpy(
            zero_copy_only=False)
        x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((x - lo) / w), 0, nbins - 1)
        b = np.where(np.isnan(b), nbins - 1, b)
        b = np.where(nulls, 0, b).astype(np.int64)
        idx, n = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(idx, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
    if _resolve_mode(ds, mode) == "local":
        merged = partials.to_pandas().groupby("bin", as_index=False)["n"].sum()
    else:
        from ray.data.aggregate import Sum
        merged = (partials.groupby("bin")
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    full = pd.DataFrame({"bin": np.arange(nbins, dtype=np.int64)})
    out = full.merge(merged, on="bin", how="left").fillna({"n": 0})
    out["n"] = out["n"].astype("int64")
    out["bin_lo"] = lo + out["bin"] * w
    out["bin_hi"] = lo + (out["bin"] + 1) * w
    return out[["bin", "bin_lo", "bin_hi", "n"]]


def approx_quantiles(ds: rd.Dataset, col: str, lo: float, hi: float,
                     qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                     nbins: int = 256, mode: str = "auto") -> pd.DataFrame:
    """Mergeable approximate quantiles: ONE streaming histogram pass
    (order-independent int64 bin counts — the merge is a plain sum, so
    the sketch combines across any number of workers/nodes) plus a
    driver-side interpolation over the <=nbins-row result. This is the
    100-TB path for percentiles: exact quantiles need a global sort or
    a holistic map_groups; the histogram sketch needs neither and its
    error is bounded by one bin width.

    Estimate for quantile q: pick the first occupied bin whose
    cumulative count reaches q*N, then interpolate linearly inside it.
    The arithmetic (operation order included) is shared verbatim with
    the SQL oracle, so results are bit-identical doubles:
    ``lo + bin*w + w*((q*N - cum_before)/n_bin)``.

    Output: (q, value_est) per requested quantile."""
    hist = numeric_histogram(ds, col, lo, hi, nbins, mode)
    w = (hi - lo) / nbins
    rows = _interp_quantiles(hist["n"].to_numpy(), lo, w, qs)
    return pd.DataFrame(rows, columns=["q", "value_est"])


def _interp_quantiles(n: np.ndarray, lo: float, w: float,
                      qs: tuple) -> list:
    """Linear interpolation over full (zeros included) bin counts —
    the arithmetic the SQL oracles replicate verbatim."""
    total = int(n.sum())
    cum_before = np.concatenate([[0], np.cumsum(n)[:-1]])
    rows = []
    for q in qs:
        target = q * float(total)
        reach = (n > 0) & (cum_before + n >= target)
        if total == 0 or not reach.any():
            rows.append((q, None))
            continue
        b = int(np.argmax(reach))
        est = lo + b * w + w * ((q * float(total) - float(cum_before[b]))
                                / float(n[b]))
        rows.append((q, est))
    return rows


def grouped_approx_quantiles(ds: rd.Dataset, group_col: str, col: str,
                             lo: float, hi: float,
                             qs: tuple = (0.25, 0.5, 0.9),
                             nbins: int = 256,
                             mode: str = "auto") -> pd.DataFrame:
    """Per-group histogram-sketch quantiles: one streaming pass emits
    (group, bin, n) partials — at most groups x occupied-bins tiny rows
    per batch — merged by an int64 sum (order-independent), then the
    same bit-stable interpolation as ``approx_quantiles`` runs per
    group on the driver over a groups x nbins panel. No sort and no
    per-group materialization of raw values, so group skew costs
    nothing: a group with 10^10 rows still contributes nbins counters.

    Output: (group_col, q, value_est) per group per quantile."""
    w = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        nulls = pc.is_null(arr, nan_is_null=False).to_numpy(
            zero_copy_only=False)
        x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((x - lo) / w), 0, nbins - 1)
        b = np.where(np.isnan(b), nbins - 1, b)
        b = np.where(nulls, 0, b).astype(np.int64)
        df = pd.DataFrame({group_col: t[group_col].to_numpy(
            zero_copy_only=False), "bin": b})
        g = df.groupby([group_col, "bin"], sort=False).size() \
              .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
    if _resolve_mode(ds, mode) == "local":
        merged = (partials.to_pandas()
                  .groupby([group_col, "bin"], as_index=False)["n"].sum())
    else:
        from ray.data.aggregate import Sum
        merged = (partials.groupby([group_col, "bin"])
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for grp, gdf in merged.groupby(group_col, sort=True):
        full = np.zeros(nbins, dtype=np.int64)
        full[gdf["bin"].to_numpy()] = gdf["n"].to_numpy()
        rows.extend((grp, q, est)
                    for q, est in _interp_quantiles(full, lo, w, qs))
    return (pd.DataFrame(rows, columns=[group_col, "q", "value_est"])
            .sort_values([group_col, "q"]).reset_index(drop=True))


#: marker row carrying a batch's TOTAL token count through the heavy-
#: hitter partials (the empty string can never be a real token: the
#: counts block filters token <> '')
_HH_TOTAL_KEY = ""


def _mg_block(t: pa.Table, k: int, text_col: str) -> pa.Table:
    """Per-batch Misra-Gries summary with k counters: exact batch
    counts, minus the (k+1)-th largest count, positives kept (the
    mergeable-summaries formulation — Agarwal et al., PODS'12: merged
    pruned summaries undercount any token by at most total/(k+1), so
    every token with true count >= total/(k+1) SURVIVES). One extra
    row ('', batch_total) carries the denominator."""
    g = _token_counts_block(t, text_col)
    tok = g["token"].to_pandas()
    n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n.sum())
    if len(n) > k:
        sub = np.partition(n, len(n) - k - 1)[len(n) - k - 1]
        keep = n - sub > 0
        tok, n = tok[keep], n[keep] - sub
    return pa.table({
        "token": pa.array(list(tok) + [_HH_TOTAL_KEY], pa.string()),
        "n": pa.array(list(n) + [total], pa.int64())})


def heavy_hitters(ds: rd.Dataset, phi: float = 0.001,
                  text_col: str = "text", mode: str = "auto"
                  ) -> pd.DataFrame:
    """EXACT phi-heavy hitters: every token whose count >=
    ceil(phi * total_tokens), with exact counts — SQL-oracle-checkable
    (HAVING count >= threshold), unlike a bare sketch.

    Two passes, both streaming:

    1. **Candidate sketch**: per-batch Misra-Gries summaries with
       k = ceil(1/phi) counters (<= k+1 rows leave each block no
       matter its vocabulary), summed via groupby (or in-process for
       small reads), then pruned once more to k counters. The
       mergeable-MG guarantee makes the surviving set a SUPERSET of
       all true phi-heavy tokens; at most k candidates remain, so the
       broadcast side is bounded by the parameter, never the corpus.
    2. **Exact rescreen**: candidates broadcast into a second pass
       that counts ONLY candidate tokens per batch (is_in filter
       before the group_by), one tiny (token, n) reduce, then the
       exact threshold filter — false positives drop, counts exact.

    Small pure-read inputs skip the sketch entirely: exact one-pass
    counts + threshold give the identical rows (pinned by test).

    Returns (token, n) sorted n desc, token asc."""
    import math

    import ray

    k = max(1, math.ceil(1.0 / phi))
    if _resolve_mode(ds, mode) == "local":
        # small-input plan: the full (token, n) partials fit in memory,
        # so exact counts in ONE pass subsume both the MG candidate
        # sketch and the rescreen — same rows, same counts, half the
        # pipeline launches. The sketch is a bound on what leaves each
        # block; with a provably small input there is nothing to bound.
        merged = (ds.map_batches(
            lambda t: _token_counts_block(t, text_col),
            batch_format="pyarrow")
            .to_pandas().groupby("token", as_index=False)["n"].sum())
        total = int(merged["n"].sum())
        thr = max(1, math.ceil(phi * total))
        out = merged[merged["n"] >= thr]
        out = out.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        return out[["token", "n"]]
    partials = ds.map_batches(
        lambda t: _mg_block(t, k, text_col),
        batch_format="pyarrow", batch_size=None)
    # distributed merge: bucketed groupby-sum stays in Ray; the driver
    # sees only the top k+1 merged counters (per-block prune via topk)
    # plus the one total row — O(k) rows, never the summary union
    from .bucketed import bucketed_agg
    from .topk import topk
    partials = partials.materialize()
    merged_ds = bucketed_agg(partials, "token", {"n": ("n", "sum")})
    total = int(merged_ds.map_batches(
        lambda t: t.filter(pc.equal(t["token"], _HH_TOTAL_KEY)),
        batch_format="pyarrow").sum("n") or 0)
    top = topk(merged_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["token"], _HH_TOTAL_KEY)),
        batch_format="pyarrow"), ["n", "token"], k=k + 1,
        descending=[True, False])
    if total == 0 or top.empty or "n" not in top.columns:
        # token-free corpus: nothing can be phi-heavy
        return pd.DataFrame({"token": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    # prune rule: subtract the (k+1)-th largest merged counter;
    # every strictly-positive residual is within the returned top
    sub = 0 if len(top) <= k else int(top["n"].iloc[-1])
    cand = top[top["n"] - sub > 0]
    thr = max(1, math.ceil(phi * total))
    if cand.empty or total == 0:
        return pd.DataFrame({"token": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    cand_ref = ray.put(pa.array(sorted(cand["token"]), pa.string()))

    def exact_block(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(t[text_col], WS_SPLIT))
        tbl = pa.table({"token": flat})
        tbl = tbl.filter(pc.is_in(tbl["token"],
                                  value_set=ray.get(cand_ref)))
        g = tbl.group_by("token").aggregate([([], "count_all")])
        return g.select(["token", "count_all"]) \
                .rename_columns(["token", "n"])

    exact = (ds.map_batches(exact_block, batch_format="pyarrow")
             .to_pandas().groupby("token", as_index=False)["n"].sum())
    out = exact[exact["n"] >= thr]
    out = out.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out[["token", "n"]]


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — point frequency
# estimates: the sketch family's fourth member (HLL = distinct count,
# Misra-Gries = heavy-hitter candidates, histogram = quantiles, CMS =
# per-item frequency upper bounds). depth x width int64 counters per
# block, elementwise-SUM combine (associative + commutative, so Ray's
# tree combine is exact); estimate(token) = min over rows — always an
# UPPER bound on the true count, over by at most total/width per row
# w.p. >= 1 - 2^-depth.
# ---------------------------------------------------------------------------
CMS_WIDTH = 2048
CMS_DEPTH = 4
#: odd multipliers for the d row-hash mixes (splitmix-style)
_CMS_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                     0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5],
                    dtype=np.uint64)


def cms_fold(hashes: np.ndarray, rows: np.ndarray | None = None,
             width: int = CMS_WIDTH, depth: int = CMS_DEPTH) -> np.ndarray:
    """Fold uint64 item hashes into a (depth, width) counter matrix."""
    if rows is None:
        rows = np.zeros((depth, width), dtype=np.int64)
    if hashes.size == 0:
        return rows
    with np.errstate(over="ignore"):
        for d in range(depth):
            mixed = hashes * _CMS_MIX[d]
            mixed ^= mixed >> np.uint64(29)
            idx = (mixed % np.uint64(width)).astype(np.int64)
            np.add.at(rows[d], idx, 1)
    return rows


def cms_estimate(rows: np.ndarray, token_hashes: np.ndarray,
                 width: int = CMS_WIDTH) -> np.ndarray:
    """Point estimates (min over depth rows) for each queried hash."""
    depth = rows.shape[0]
    est = np.full(len(token_hashes), np.iinfo(np.int64).max, dtype=np.int64)
    with np.errstate(over="ignore"):
        for d in range(depth):
            mixed = token_hashes * _CMS_MIX[d]
            mixed ^= mixed >> np.uint64(29)
            idx = (mixed % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, rows[d][idx])
    return est


def token_hashes(tokens) -> np.ndarray:
    """Deterministic cross-process token hashes (same keyed hash the
    HLL sketch uses, so one tokenize pass can feed both sketches)."""
    arr = np.asarray(list(tokens), dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr)


if HllVocab is not None:
    from ray.data.aggregate import AggregateFnV2

    class CmsTokenCounts(AggregateFnV2):
        """Distributed CMS over a text column's tokens: 64 KB
        accumulator per block, elementwise-sum combine, raw counter
        matrix on finalize (query it with cms_estimate)."""

        def __init__(self, text_col: str = "text",
                     name: str = "cms") -> None:
            self._text_col = text_col
            super().__init__(
                name,
                zero_factory=lambda: np.zeros((CMS_DEPTH, CMS_WIDTH),
                                              np.int64),
                on=None, ignore_nulls=True)

        def aggregate_block(self, block):
            if isinstance(block, pd.DataFrame):
                block = pa.Table.from_pandas(block)
            return cms_fold(_token_hashes_block(block, self._text_col))

        def combine(self, current_accumulator, new):
            return current_accumulator + new

        def finalize(self, accumulator):
            return accumulator
else:
    CmsTokenCounts = None


def cms_token_counts(ds: rd.Dataset, text_col: str = "text") -> np.ndarray:
    """One-pass distributed CMS build: the whole corpus reduces to a
    64 KB counter matrix regardless of vocabulary size."""
    if CmsTokenCounts is None:
        raise NotImplementedError(
            "ray.data.aggregate.AggregateFnV2 required")
    out = ds.aggregate(CmsTokenCounts(text_col=text_col))
    return out["cms"]


#: vocabularies at or under this many distinct tokens broadcast as one
#: object-store map instead of a token-bucket join (a few hundred MB —
#: real web-crawl vocabularies blow past it and take the join plan)
VOCAB_BROADCAST_ROWS = 2_000_000


def unigram_freq_score(ds: rd.Dataset, text_col: str = "text",
                       doc_col: str = "doc_id",
                       mode: str = "auto",
                       vocab_broadcast_rows: int = VOCAB_BROADCAST_ROWS
                       ) -> pd.DataFrame:
    """Unigram corpus-frequency score per document — the
    division-exact cousin of LM-perplexity quality filtering (CCNet
    style): score(d) = (Σ_{token instances t in d} count(t)) /
    (n_tokens(d) · total_tokens). Rare-word-heavy documents score low,
    boilerplate scores high. All numerators/denominators are int64
    sums, so the one float division per doc is bit-identical to the
    SQL oracle's identical integer expression.

    Two streaming passes: (1) corpus token counts (the same combiner
    pattern as ``top_tokens``); (2) per-(doc, token) multiplicity
    partials join the counts — broadcast (``ray.put`` once, read in
    every task) when the vocabulary fits ``vocab_broadcast_rows``,
    token-bucketed ``hash_bucket_join`` at web-crawl vocabularies —
    and reduce per doc. The broadcast plan is shuffle-free: each input
    batch holds whole documents, so its per-(doc, token) partials are
    already complete and fold to final per-doc rows in place. The join
    plan's doc-level reduce is itself bucketed by ``doc_id`` so the
    driver receives exactly one row per document, never the per-bucket
    partials (measured 42 s -> 12 s at the 1.25M-doc soak).
    """
    import ray

    from .dedup_algos import _resolve_mode as _rm

    counts_partials = ds.map_batches(
        lambda t: _token_counts_block(t, text_col),
        batch_format="pyarrow")

    def doc_tok_partial(t: pa.Table) -> pa.Table:
        """(token, doc_id, m) multiplicities + n_tok rides as m sums"""
        toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docs = np.repeat(
            t[doc_col].to_numpy(zero_copy_only=False), reps)
        tb = pa.table({"token": flat,
                       "doc_id": pa.array(docs, pa.int64())})
        tb = tb.filter(pc.not_equal(tb["token"], ""))
        g = (tb.group_by(["token", "doc_id"])
             .aggregate([([], "count_all")]))
        return g.select(["token", "doc_id", "count_all"]) \
                .rename_columns(["token", "doc_id", "m"])

    doc_toks = ds.map_batches(doc_tok_partial, batch_format="pyarrow",
                              batch_size=None)

    if _rm(ds, mode) == "local":
        cnt = (counts_partials.to_pandas()
               .groupby("token", as_index=False)["n"].sum())
        total = int(cnt["n"].sum())
        dt = (doc_toks.to_pandas()
              .groupby(["token", "doc_id"], as_index=False)["m"].sum())
        merged = dt.merge(cnt, on="token")
        per_doc = (merged.assign(wf=merged["m"] * merged["n"])
                   .groupby("doc_id", as_index=False)
                   .agg(sum_freq=("wf", "sum"), n_tok=("m", "sum")))
    else:
        from .bucketed import bucketed_agg
        from .joins import hash_bucket_join
        counts = bucketed_agg(counts_partials, "token",
                              {"n": ("n", "sum")}).materialize()
        csch = counts.schema()
        if csch is None or "n" not in csch.names:
            # token-free corpus
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "sum_freq": pd.Series([], dtype="int64"),
                "n_tok": pd.Series([], dtype="int64"),
                "avg_freq": pd.Series([], dtype="float64")})
        total = int(counts.sum("n") or 0)

        if counts.count() <= vocab_broadcast_rows:
            # broadcast plan: one object-store put of the (token -> n)
            # map; every task reads it, folds its own complete docs,
            # and no second exchange happens at all
            cnt_pd = counts.to_pandas()
            cnt_ref = ray.put(pd.Series(
                cnt_pd["n"].to_numpy(dtype=np.int64),
                index=cnt_pd["token"]))

            def fold(t: pa.Table) -> pa.Table:
                g = doc_tok_partial(t)
                s = ray.get(cnt_ref)
                n = s.reindex(g["token"].to_pandas()) \
                     .to_numpy(dtype=np.int64)
                m = g["m"].to_numpy(zero_copy_only=False)
                part = (pd.DataFrame({
                    "doc_id": g["doc_id"].to_numpy(zero_copy_only=False),
                    "sum_freq": m * n, "n_tok": m})
                    .groupby("doc_id", as_index=False).sum())
                # strip the pandas schema metadata: blocks with and
                # without it hash-differ and trip Ray's schema-unify
                # warning once per block downstream
                return pa.Table.from_pandas(
                    part, preserve_index=False) \
                    .replace_schema_metadata(None)

            per_doc = ds.map_batches(fold, batch_format="pyarrow",
                            batch_size=None) \
                        .to_pandas()
        else:
            def complete_left(lf: pa.Table) -> pa.Table:
                g = (lf.group_by(["token", "doc_id"])
                     .aggregate([("m", "sum")]))
                return g.select(["token", "doc_id", "m_sum"]) \
                        .rename_columns(["token", "doc_id", "m"])

            def post(mg: pa.Table) -> pa.Table:
                wf = pc.multiply(mg["m"], mg["n"])
                g = (pa.table({"doc_id": mg["doc_id"], "sum_freq": wf,
                               "n_tok": mg["m"]})
                     .group_by("doc_id")
                     .aggregate([("sum_freq", "sum"), ("n_tok", "sum")]))
                return g.select(["doc_id", "sum_freq_sum", "n_tok_sum"]) \
                        .rename_columns(["doc_id", "sum_freq", "n_tok"])

            joined = hash_bucket_join(
                doc_toks, counts, on="token", num_buckets=32,
                left_agg=complete_left, post_merge=post)

            # doc-level reduce stays distributed: bucket by doc_id so
            # the collect is one final row per doc, not 32 partials
            def tag_doc(t: pa.Table) -> pa.Table:
                b = pc.cast(pc.bit_wise_and(t["doc_id"], 31), pa.int32())
                return t.append_column("__db", b)

            def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
                return (g.groupby("doc_id", as_index=False)
                        [["sum_freq", "n_tok"]].sum())

            per_doc = (joined.map_batches(tag_doc, batch_format="pyarrow")
                       .groupby("__db")
                       .map_groups(reduce_bucket, batch_format="pandas")
                       .to_pandas())
    if per_doc.empty or "sum_freq" not in per_doc.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "sum_freq": pd.Series([], dtype="int64"),
            "n_tok": pd.Series([], dtype="int64"),
            "avg_freq": pd.Series([], dtype="float64")})
    per_doc["sum_freq"] = per_doc["sum_freq"].astype("int64")
    per_doc["n_tok"] = per_doc["n_tok"].astype("int64")
    per_doc["avg_freq"] = (per_doc["sum_freq"]
                           / (per_doc["n_tok"] * 1.0 * total))
    return (per_doc[["doc_id", "sum_freq", "n_tok", "avg_freq"]]
            .astype({"doc_id": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def bigram_lift(ds: rd.Dataset, k: int = 50, min_count: int = 5,
                text_col: str = "text", mode: str = "auto"
                ) -> pd.DataFrame:
    """Collocation extraction: top-k word bigrams by LIFT =
    P(w1 w2) / (P(w1) P(w2)) — the log-free PMI variant, so every
    factor is an integer count and the one float expression per bigram
    is bit-identical to the SQL oracle (log/exp vary across libms;
    ratios don't). High lift = words that co-occur far more than
    independence predicts ("New York"), the standard phrase-mining
    primitive (Manning & Schütze ch. 5).

    Plan: one pass emits per-batch partial counts for unigrams AND
    bigrams (two group_bys inside the same map — the text is tokenized
    once); bigram totals ride as one extra row. Small reads finish the
    merge in-process; at scale the bigram table joins the unigram
    counts twice through token-bucket shuffles, and only pairs with
    count >= min_count enter the join (the Zipf tail never moves)."""
    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        # per-token doc index makes the boundary mask trivial: a
        # bigram is valid iff both tokens share a doc (split empties —
        # only ever at text edges — drop first, same as the oracle's
        # list_filter-then-pair order)
        docix = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = words != ""
        words2, docix2 = words[keep], docix[keep]
        uni = pd.Series(words2).value_counts()
        out_tok = ["\x00TOTAL\x00"] + list(uni.index)
        out_n = [len(words2)] + list(uni.to_numpy())
        ug = pa.table({"w1": pa.array(out_tok, pa.string()),
                       "w2": pa.array([""] * len(out_tok), pa.string()),
                       "n": pa.array(np.asarray(out_n, np.int64)),
                       "kind": pa.array(["u"] * len(out_tok))})
        if len(words2) >= 2:
            valid = docix2[:-1] == docix2[1:]
            b1, b2 = words2[:-1][valid], words2[1:][valid]
            bdf = (pd.DataFrame({"w1": b1, "w2": b2})
                   .groupby(["w1", "w2"], as_index=False).size())
            bg = pa.table({
                "w1": pa.array(["\x00TOTAL\x00"] + list(bdf["w1"]),
                               pa.string()),
                "w2": pa.array([""] + list(bdf["w2"]), pa.string()),
                "n": pa.array(np.concatenate(
                    [[int(valid.sum())],
                     bdf["size"].to_numpy()]).astype(np.int64)),
                "kind": pa.array(["b"] * (len(bdf) + 1))})
            return pa.concat_tables([ug, bg])
        return ug

    parts = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
    # both plans complete the counts the same way; the distributed one
    # shuffles by (kind, w1, w2) first so no single node sees the
    # full vocabulary
    _empty_lift = pd.DataFrame({"w1": pd.Series([], dtype="object"),
                                "w2": pd.Series([], dtype="object"),
                                "n_pair": pd.Series([], dtype="int64"),
                                "lift": pd.Series([], dtype="float64")})
    if _resolve_mode(ds, mode) == "local":
        allp = parts.to_pandas()
        if allp.empty or "kind" not in allp.columns:
            return _empty_lift
        allp = allp.groupby(["kind", "w1", "w2"],
                            as_index=False)["n"].sum()
        uni = allp[(allp["kind"] == "u")
                   & (allp["w1"] != "\x00TOTAL\x00")]
        T = int(allp.loc[(allp["kind"] == "u")
                         & (allp["w1"] == "\x00TOTAL\x00"), "n"].sum())
        TB = int(allp.loc[(allp["kind"] == "b")
                          & (allp["w1"] == "\x00TOTAL\x00"), "n"].sum())
        bi = allp[(allp["kind"] == "b")
                  & (allp["w1"] != "\x00TOTAL\x00")]
        bi = bi[bi["n"] >= min_count]
        cmap = dict(zip(uni["w1"], uni["n"].astype("int64")))
    else:
        import ray

        from .bucketed import bucketed_agg
        merged = bucketed_agg(parts, ["kind", "w1", "w2"],
                              {"n": ("n", "sum")}).materialize()
        msch = merged.schema()
        if msch is None or "kind" not in msch.names:
            return _empty_lift
        # the merged (kind, w1, w2) table is vocabulary-sized — it
        # NEVER collects whole. The driver receives: the two TOTAL
        # rows, the min_count-surviving bigrams, and only the unigram
        # rows whose token appears in a surviving bigram (a broadcast
        # membership filter) — all min_count-bounded.
        tot = merged.map_batches(
            lambda t: t.filter(pc.equal(t["w1"], "\x00TOTAL\x00")),
            batch_format="pyarrow").to_pandas()
        T = int(tot.loc[tot["kind"] == "u", "n"].sum())
        TB = int(tot.loc[tot["kind"] == "b", "n"].sum())
        bi = merged.map_batches(
            lambda t: t.filter(
                pc.and_(pc.and_(pc.equal(t["kind"], "b"),
                                pc.not_equal(t["w1"], "\x00TOTAL\x00")),
                        pc.greater_equal(t["n"], min_count))),
            batch_format="pyarrow").to_pandas()
        if bi.empty:
            return _empty_lift  # no bigram survives min_count
        need = ray.put(pa.array(sorted(set(bi["w1"]) | set(bi["w2"])),
                                pa.string()))
        uni = merged.map_batches(
            lambda t: t.filter(
                pc.and_(pc.equal(t["kind"], "u"),
                        pc.is_in(t["w1"], value_set=ray.get(need)))),
            batch_format="pyarrow").to_pandas()
        cmap = dict(zip(uni["w1"], uni["n"].astype("int64")))
    if bi.empty or T == 0 or TB == 0:
        return pd.DataFrame({"w1": pd.Series([], dtype="object"),
                             "w2": pd.Series([], dtype="object"),
                             "n_pair": pd.Series([], dtype="int64"),
                             "lift": pd.Series([], dtype="float64")})
    ca = bi["w1"].map(cmap).astype("int64")
    cb = bi["w2"].map(cmap).astype("int64")
    cab = bi["n"].astype("int64")
    lift = (cab * 1.0 * T * T) / (TB * 1.0 * ca * cb)
    out = pd.DataFrame({"w1": bi["w1"].to_numpy(),
                        "w2": bi["w2"].to_numpy(),
                        "n_pair": cab.to_numpy(), "lift": lift.to_numpy()})
    return (out.sort_values(["lift", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="mergesort")
            .head(k).reset_index(drop=True))


def group_tfidf(ds: rd.Dataset, group_col: str = "lang", k: int = 10,
                text_col: str = "text", mode: str = "auto"
                ) -> pd.DataFrame:
    """Top-k DISTINGUISHING terms per group (tf-idf lift): score(t, g)
    = tf(t, g) * n_groups / df(t), where df is the number of groups
    containing the term — terms every group shares score low, group-
    specific vocabulary floats to the top (the corpus-analysis view a
    domain-mixture builder wants per source/language).

    Shape: per-batch (group, token, n) combiners; ONE token-bucketed
    exchange computes complete per-group counts AND per-token df
    together (all rows of a token land in one bucket); per-group top-k
    prunes per block so the driver sees k x groups rows. Float spec:
    score = ((tf * 1.0) * n_groups) / df — the SQL oracle's
    `n * 1.0 * g / df` evaluation order, one rounding per step,
    bit-identical."""
    from .dedup_algos import _resolve_mode as _rm

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        grp = np.repeat(t[group_col].to_numpy(zero_copy_only=False), reps)
        tb = pa.table({group_col: pa.array(grp), "token": flat})
        tb = tb.filter(pc.not_equal(tb["token"], ""))
        gb = (tb.group_by([group_col, "token"])
              .aggregate([([], "count_all")]))
        return gb.select([group_col, "token", "count_all"]) \
                 .rename_columns([group_col, "token", "n"])

    def uniq_groups(t: pa.Table) -> pa.Table:
        return pa.table({group_col: pc.unique(t[group_col])})

    _ug = ds.map_batches(uniq_groups, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    n_groups = int(_ug[group_col].nunique()) \
        if group_col in _ug.columns else 0

    def score_frame(tf: pd.DataFrame) -> pd.DataFrame:
        df_per_tok = tf.groupby("token")[group_col].transform("size")
        score = (tf["n"].to_numpy() * 1.0) * n_groups \
            / df_per_tok.to_numpy()
        return tf.assign(score=score)

    partials_ds = ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
    _empty_tfidf = pd.DataFrame({
        group_col: pd.Series([], dtype="object"),
        "token": pd.Series([], dtype="object"),
        "n": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float64")})
    if _rm(ds, mode) == "local":
        tf = partials_ds.to_pandas()
        if tf.empty or "token" not in tf.columns:
            return _empty_tfidf
        tf = tf.groupby([group_col, "token"], as_index=False)["n"].sum()
        scored = score_frame(tf)
        out = (scored.sort_values(["score", "token"],
                                  ascending=[False, True],
                                  kind="mergesort")
               .groupby(group_col, sort=False).head(k))
        out = out.sort_values([group_col, "score", "token"],
                              ascending=[True, False, True],
                              kind="mergesort").reset_index(drop=True)
    else:
        from .bucketed import _bucket_ids
        from .topk import grouped_topk

        def tag(t: pa.Table) -> pa.Table:
            return t.append_column("__b", _bucket_ids(t, ["token"], 64))

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            tf = (g.groupby([group_col, "token"], as_index=False)
                  ["n"].sum())
            return score_frame(tf)

        scored_ds = (partials_ds.map_batches(tag, batch_format="pyarrow")
                     .groupby("__b").map_groups(per_bucket,
                                                batch_format="pandas"))
        out = grouped_topk(scored_ds, [group_col], ["score", "token"],
                           k=k, descending=[True, False])
    if n_groups == 0 or out.empty or "n" not in out.columns:
        return _empty_tfidf
    out["n"] = out["n"].astype("int64")
    return out[[group_col, "token", "n", "score"]]


def source_vocab(ds: rd.Dataset, source_col: str = "source",
                 text_col: str = "text",
                 num_buckets: int = 64) -> pd.DataFrame:
    """Exact distinct-token count per source (per-domain vocabulary):
    per-block-distinct (source, token) pairs go through ONE bucketed
    exchange keyed on the pair; each pair lives in exactly one bucket,
    so per-bucket distinct counts sum exactly — the driver merges one
    tiny (source, n) row per (bucket x source). The high-cardinality
    side (tokens) never groups globally."""
    from .bucketed import _bucket_ids

    def pairs(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        flat = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
        tok = flat.to_numpy(zero_copy_only=False)
        src_col = t[source_col]
        if isinstance(src_col, pa.ChunkedArray):
            src_col = src_col.combine_chunks()
        src = src_col.to_numpy(zero_copy_only=False)
        keep = tok != ""
        df = pd.DataFrame({source_col: src[par[keep]],
                           "token": tok[keep]}).drop_duplicates()
        tbl = pa.table({source_col: pa.array(df[source_col].to_numpy(),
                                             pa.string()),
                        "token": pa.array(df["token"].to_numpy(),
                                          pa.string())})
        return tbl.append_column(
            "__b", _bucket_ids(tbl, [source_col, "token"], num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([source_col, "token"])
        out = d.groupby(source_col, as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket,
                                        batch_format="pandas"))
    pdf = parts.to_pandas()
    if pdf.empty or source_col not in pdf.columns:
        return pd.DataFrame({source_col: pd.Series([], dtype="object"),
                             "n_distinct_tokens": pd.Series([],
                                                            dtype="int64")})
    out = (pdf.groupby(source_col, as_index=False)["n"].sum()
           .rename(columns={"n": "n_distinct_tokens"}))
    out["n_distinct_tokens"] = out["n_distinct_tokens"].astype("int64")
    return out


def doc_top_tfidf(ds: rd.Dataset, k: int = 2, id_col: str = "doc_id",
                  text_col: str = "text", num_buckets: int = 64,
                  n_docs: int | None = None) -> rd.Dataset:
    """Top-k tf-idf terms PER DOCUMENT (keyword extraction):
    ``score = tf * N / df`` (lift form, shared with group_tfidf; no
    log so the doubles replay exactly in SQL). Fully streaming: the
    (doc, token, tf) triples take ONE token-bucketed join against the
    token dfs, then ONE doc-bucketed reduce does the per-doc top-k —
    no per-doc frame ever collects on the driver (unlike grouped_topk,
    whose driver merge holds k x groups rows).

    Output Dataset: (id_col, token, tf:int64, df:int64,
    score:float64), <=k rows per doc, ties broken token-ascending.

    Plan: exactly TWO exchanges, the minimum for a (token-global,
    doc-local) computation. A (doc, token) triple is globally unique
    (a doc lives whole in one block), so df(token) = the row count of
    its token inside the token-hash bucket — no separate df aggregate,
    no join. The second exchange re-buckets scored rows by doc for the
    per-doc top-k."""
    from .bucketed import _bucket_ids

    if n_docs is None:
        n_docs = ds.count()
    n_f = float(n_docs)

    def triples(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        flat = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
        tok = flat.to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = tok != ""
        df = (pd.DataFrame({id_col: ids[par[keep]], "token": tok[keep]})
              .groupby([id_col, "token"], as_index=False, sort=False)
              .size().rename(columns={"size": "tf"}))
        return pa.table({id_col: pa.array(df[id_col].to_numpy(),
                                          pa.int64()),
                         "token": pa.array(df["token"].to_numpy(),
                                           pa.string()),
                         "tf": pa.array(df["tf"].to_numpy()
                                        .astype(np.int64))})

    def tag_token(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None).append_column(
            "__b", _bucket_ids(t, ["token"], num_buckets))

    def score_in_token_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all of a token's (globally unique) triples are in this
        # bucket, so its row count IS df
        dfv = (g.groupby("token")["tf"].transform("size")
               .to_numpy().astype(np.float64))
        tf = g["tf"].to_numpy().astype(np.float64)
        out = g[[id_col, "token", "tf"]].copy()
        out["df"] = dfv.astype(np.int64)
        out["score"] = tf * 1.0 * n_f / dfv  # same op order as oracle
        return out

    scored = (ds.map_batches(triples, batch_format="pyarrow")
              .map_batches(tag_token, batch_format="pyarrow")
              .groupby("__b").map_groups(score_in_token_bucket,
                                         batch_format="pandas"))

    def tag_doc(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None).append_column(
            "__db", _bucket_ids(t, [id_col], num_buckets))

    def per_doc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values([id_col, "score", "token"],
                             ascending=[True, False, True],
                             kind="mergesort")
               .groupby(id_col, sort=False).head(k))
        cols = [id_col, "token", "tf", "df", "score"]
        out = out[cols].copy()
        out["tf"] = out["tf"].astype("int64")
        out["df"] = out["df"].astype("int64")
        return out

    return (scored.map_batches(tag_doc, batch_format="pyarrow")
            .groupby("__db").map_groups(per_doc_bucket,
                                        batch_format="pandas"))


def top_ngrams(ds: rd.Dataset, n: int = 3, k: int = 50,
               text_col: str = "text", mode: str = "auto"
               ) -> pd.DataFrame:
    """Corpus-level top-k word n-grams by total occurrence count — the
    boilerplate-discovery primitive (the "most common 13-gram" style
    audit of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better": high-count long n-grams are navigation
    chrome, cookie banners and licence footers, the phrases a span
    dedup or a filter list should target).

    Plan (same shape as ``top_tokens``): each block tokenizes once,
    emits its LOCAL (gram, count) partials via shifted arrow takes +
    one arrow group_by — raw gram streams never move — then one
    token-bucketed exchange sums the partials and a tree top-k reduces
    to the driver. Boundary semantics match the SQL twin exactly:
    empty split tokens drop FIRST, then grams form within each doc
    (``list_filter`` before the positional slice)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    shift = n - 1

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docix = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        docix = docix[keep]
        if len(flat) <= shift:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        if shift:
            valid = docix[:-shift] == docix[shift:]
        else:
            valid = np.ones(len(flat), dtype=bool)
        idx = np.nonzero(valid)[0]
        if idx.size == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cols = [flat.take(pa.array(idx + i)) for i in range(n)]
        gram = cols[0] if n == 1 else pc.binary_join_element_wise(
            *cols, " ")
        g = (pa.table({"gram": gram}).group_by("gram")
             .aggregate([([], "count_all")]))
        return g.select(["gram", "count_all"]).rename_columns(
            ["gram", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    if _resolve_mode(ds, mode) == "local":
        merged = partials.to_pandas()
        if merged.empty or "gram" not in merged.columns:
            out = merged
        else:
            out = (merged.groupby("gram", as_index=False)["n"].sum()
                   .sort_values(["n", "gram"], ascending=[False, True],
                                kind="mergesort")
                   .head(k).reset_index(drop=True))
    else:
        from .bucketed import bucketed_agg
        from .topk import topk
        summed = bucketed_agg(partials, "gram", {"n": ("n", "sum")})
        out = topk(summed, ["n", "gram"], k=k, descending=[True, False])
    if out.empty or "n" not in out.columns:
        return pd.DataFrame({"gram": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out[["gram", "n"]].reset_index(drop=True)


def bigram_fluency(ds: rd.Dataset, text_col: str = "text",
                   doc_col: str = "doc_id",
                   thresh_num: int = 1, thresh_den: int = 64,
                   mode: str = "auto",
                   vocab_broadcast_rows: int = VOCAB_BROADCAST_ROWS
                   ) -> pd.DataFrame:
    """Per-document word-transition fluency — the division-exact
    bigram cousin of CCNet's LM-perplexity quality filter (Wenzek et
    al. 2019 filter by per-doc LM score; the reference's quality gate
    is per-doc confidence thresholds, spec.py M15/G6 semantics family).
    For every document with at least one word bigram:

      n_bigrams   — bigram instances in the doc
      sum_bi      — Σ corpus count of each bigram instance (int64)
      n_rare      — instances whose MLE conditional probability
                    c(w1 w2)/c(w1) < thresh_num/thresh_den, decided by
                    the integer cross-multiply
                    ``c_bi * thresh_den < c_uni * thresh_num`` (the
                    docs_weighted_sample doctrine: no float compare)
      rare_ratio  — n_rare / (n_bigrams * 1.0)
      avg_bi_freq — sum_bi / (n_bigrams * 1.0 * TB), TB = corpus
                    bigram instances

    Gibberish / word-salad text has a high rare_ratio (its transitions
    almost never recur in the corpus); fluent and boilerplate text
    scores low. Every aggregate is an int64 sum and the two float
    expressions evaluate in the SQL oracle's exact order, so the
    result is bit-identical to DuckDB's (no logs — libm-free, per the
    bigram_lift doctrine). Documents with fewer than two tokens yield
    no bigram and are absent, matching the oracle's inner join.

    Plan (two streaming passes, unigram_freq_score's shape): pass 1
    emits per-batch (kind, key, n) combiners for unigrams AND bigrams
    (the text tokenizes once) into one (kind, key)-bucketed exchange.
    Pass 2 re-reads the docs: when the merged vocabulary fits
    ``vocab_broadcast_rows`` the two count maps ride the object store
    once (``ray.put``) and each batch folds its own complete documents
    shuffle-free (rows are whole docs, so per-doc partials are final);
    above it, per-(doc, gram) multiplicities bucket-join the bigram
    counts on the gram key, then the unigram counts on w1, and a
    doc_id-bucketed reduce hands the driver one row per document.
    Tokens cannot contain a space (WS_SPLIT splits on it), so
    ``w1 || ' ' || w2`` is an unambiguous gram key — the same key the
    jaccard oracle uses."""
    import ray

    from .bucketed import bucketed_agg
    from .joins import hash_bucket_join

    _empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "n_bigrams": pd.Series([], dtype="int64"),
        "sum_bi": pd.Series([], dtype="int64"),
        "n_rare": pd.Series([], dtype="int64"),
        "rare_ratio": pd.Series([], dtype="float64"),
        "avg_bi_freq": pd.Series([], dtype="float64")})

    def counts_partial(t: pa.Table) -> pa.Table:
        """(kind, key, n) combiner: kind 'u' keys are tokens, 'b' keys
        are 'w1 w2' grams — one tokenization for both."""
        toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docix = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = words != ""
        words, docix = words[keep], docix[keep]
        uni = pd.Series(words).value_counts()
        keys = list(uni.index)
        ns = list(uni.to_numpy())
        kinds = ["u"] * len(keys)
        if len(words) >= 2:
            valid = docix[:-1] == docix[1:]
            if valid.any():
                grams = (pd.Series(words[:-1][valid], dtype="object")
                         + " "
                         + pd.Series(words[1:][valid], dtype="object"))
                bi = grams.value_counts()
                keys += list(bi.index)
                ns += list(bi.to_numpy())
                kinds += ["b"] * len(bi)
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "key": pa.array(keys, pa.string()),
                         "n": pa.array(np.asarray(ns, np.int64))})

    def doc_gram_partial(t: pa.Table) -> pa.Table:
        """per-(doc, gram) multiplicities with the w1 context column"""
        toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
        words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = t[doc_col].to_numpy(zero_copy_only=False)
        docix = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = words != ""
        words, docix = words[keep], docix[keep]
        if len(words) < 2:
            return pa.table({"g": pa.array([], pa.string()),
                             "w1": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        valid = docix[:-1] == docix[1:]
        w1 = words[:-1][valid]
        g = (pd.Series(w1, dtype="object") + " "
             + pd.Series(words[1:][valid], dtype="object")).to_numpy()
        doc = ids[docix[:-1][valid]]
        df = (pd.DataFrame({"g": g, "w1": w1, "doc_id": doc})
              .groupby(["g", "w1", "doc_id"], as_index=False).size()
              .rename(columns={"size": "m"}))
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def finish(per_doc: pd.DataFrame, tb_total: int) -> pd.DataFrame:
        if per_doc.empty or "n_bigrams" not in per_doc.columns:
            return _empty
        for c in ("doc_id", "n_bigrams", "sum_bi", "n_rare"):
            per_doc[c] = per_doc[c].astype("int64")
        per_doc["rare_ratio"] = (per_doc["n_rare"]
                                 / (per_doc["n_bigrams"] * 1.0))
        per_doc["avg_bi_freq"] = (per_doc["sum_bi"]
                                  / (per_doc["n_bigrams"] * 1.0
                                     * tb_total))
        return (per_doc[["doc_id", "n_bigrams", "sum_bi", "n_rare",
                         "rare_ratio", "avg_bi_freq"]]
                .sort_values("doc_id").reset_index(drop=True))

    counts_parts = ds.map_batches(counts_partial, batch_format="pyarrow",
                                  batch_size=None)

    if _resolve_mode(ds, mode) == "local":
        cnt = counts_parts.to_pandas()
        if cnt.empty or "kind" not in cnt.columns:
            return _empty
        cnt = cnt.groupby(["kind", "key"], as_index=False)["n"].sum()
        bi = cnt[cnt["kind"] == "b"]
        if bi.empty:
            return _empty
        tb_total = int(bi["n"].sum())
        cb_map = pd.Series(bi["n"].to_numpy(np.int64),
                           index=bi["key"])
        uni = cnt[cnt["kind"] == "u"]
        cu_map = pd.Series(uni["n"].to_numpy(np.int64),
                           index=uni["key"])
        dg = (ds.map_batches(doc_gram_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas())
        if dg.empty or "g" not in dg.columns:
            return _empty
        dg = dg.groupby(["g", "w1", "doc_id"], as_index=False)["m"].sum()
        cb = cb_map.reindex(dg["g"]).to_numpy(np.int64)
        cu = cu_map.reindex(dg["w1"]).to_numpy(np.int64)
        m = dg["m"].to_numpy(np.int64)
        rare = (cb * thresh_den < cu * thresh_num).astype(np.int64)
        per_doc = (pd.DataFrame({"doc_id": dg["doc_id"].to_numpy(),
                                 "n_bigrams": m, "sum_bi": m * cb,
                                 "n_rare": m * rare})
                   .groupby("doc_id", as_index=False).sum())
        return finish(per_doc, tb_total)

    merged = bucketed_agg(counts_parts, ["kind", "key"],
                          {"n": ("n", "sum")}).materialize()
    msch = merged.schema()
    if msch is None or "kind" not in msch.names:
        return _empty
    bi_counts = merged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "b"))
                   .select(["key", "n"]).rename_columns(["g", "cb"]),
        batch_format="pyarrow")
    tb_total = int(bi_counts.sum("cb") or 0)
    if tb_total == 0:
        return _empty

    if merged.count() <= vocab_broadcast_rows:
        # broadcast plan: both count maps ride plasma once; each batch
        # holds whole documents so its per-doc fold is final — zero
        # exchanges in pass 2
        cnt = merged.to_pandas()
        bi = cnt[cnt["kind"] == "b"]
        uni = cnt[cnt["kind"] == "u"]
        maps_ref = ray.put((
            pd.Series(bi["n"].to_numpy(np.int64), index=bi["key"]),
            pd.Series(uni["n"].to_numpy(np.int64), index=uni["key"])))

        def fold(t: pa.Table) -> pa.Table:
            dg = doc_gram_partial(t).to_pandas()
            if dg.empty:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "sum_bi": pa.array([], pa.int64()),
                    "n_rare": pa.array([], pa.int64())})
            cb_map, cu_map = ray.get(maps_ref)
            cb = cb_map.reindex(dg["g"]).to_numpy(np.int64)
            cu = cu_map.reindex(dg["w1"]).to_numpy(np.int64)
            m = dg["m"].to_numpy(np.int64)
            rare = (cb * thresh_den < cu * thresh_num).astype(np.int64)
            part = (pd.DataFrame({"doc_id": dg["doc_id"].to_numpy(),
                                  "n_bigrams": m, "sum_bi": m * cb,
                                  "n_rare": m * rare})
                    .groupby("doc_id", as_index=False).sum())
            return pa.Table.from_pandas(part, preserve_index=False) \
                .replace_schema_metadata(None)

        per_doc = ds.map_batches(fold, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
        return finish(per_doc, tb_total)

    # join plan: gram-bucketed join to the bigram counts, then a
    # w1-bucketed join to the unigram counts, then a doc_id-bucketed
    # reduce — the driver receives one row per document
    uni_counts = merged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "u"))
                   .select(["key", "n"]).rename_columns(["w1", "cu"]),
        batch_format="pyarrow")
    doc_grams = ds.map_batches(doc_gram_partial, batch_format="pyarrow",
                               batch_size=None)

    def complete_left(lf: pa.Table) -> pa.Table:
        g = (lf.group_by(["g", "w1", "doc_id"]).aggregate([("m", "sum")]))
        return g.select(["g", "w1", "doc_id", "m_sum"]) \
                .rename_columns(["g", "w1", "doc_id", "m"])

    j1 = hash_bucket_join(doc_grams, bi_counts, on="g", num_buckets=32,
                          left_agg=complete_left)

    def post(mg: pa.Table) -> pa.Table:
        m = mg["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = mg["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        cu = mg["cu"].to_numpy(zero_copy_only=False).astype(np.int64)
        rare = (cb * thresh_den < cu * thresh_num).astype(np.int64)
        part = (pd.DataFrame({
            "doc_id": mg["doc_id"].to_numpy(zero_copy_only=False),
            "n_bigrams": m, "sum_bi": m * cb, "n_rare": m * rare})
            .groupby("doc_id", as_index=False).sum())
        return pa.Table.from_pandas(part, preserve_index=False) \
            .replace_schema_metadata(None)

    j2 = hash_bucket_join(j1, uni_counts, on="w1", num_buckets=32,
                          post_merge=post)

    def tag_doc(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["doc_id"], 31), pa.int32())
        return t.append_column("__db", b)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("doc_id", as_index=False)
                [["n_bigrams", "sum_bi", "n_rare"]].sum())

    per_doc = (j2.map_batches(tag_doc, batch_format="pyarrow")
               .groupby("__db")
               .map_groups(reduce_bucket, batch_format="pandas")
               .to_pandas())
    return finish(per_doc, tb_total)
