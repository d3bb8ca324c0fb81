"""DSIR-style hashed-feature importance weighting + deterministic
resampling (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — the hashed-n-gram variant, rationalized for
exact cross-engine verification).

Pipeline shape (two streaming passes, no driver materialization of
documents):

1. ``importance_bucket_counts`` — ONE pass emits per-batch partial
   occurrence counts of hashed word-bigram features into ``B`` buckets,
   split source-vs-target; the partials are tiny (≤ B rows each) and
   fold to two int64 arrays of length B on the driver (the classic
   combiner shape — the corpus never collects).
2. ``importance_weights`` — second pass scores every document against
   the broadcast arrays:  num = Σ_b c_b·T_b,  den = Σ_b c_b·S_b (pure
   int64 sums — order-free, so bit-identical across partitionings and
   to the SQL oracle), then ONE float expression
   ``(num/den) * (S_tot/T_tot)`` — an estimate of
   p_target(doc)/p_source(doc) under the bucketed unigram-of-bigrams
   model. True DSIR uses a log-likelihood ratio; the ratio-of-linear-
   estimators form here keeps every intermediate an integer (log/exp
   vary across libms in the last ulp, which a value-hash gate would
   flag) while preserving the ranking behavior at the corpus level.
3. ``importance_resample`` — keep a document iff
   ``md5-uniform(doc_id) < floor(min(1, rate·weight) · 10^6)`` — the
   same shuffle-free content-hash acceptance rule as
   ``text_stats.hash_split_batch``: deterministic, rerun-stable, and
   replayed verbatim by the oracle.

Feature = RAW whitespace word bigram (no case folding: Unicode
lowercasing differs subtly between Arrow and DuckDB's ICU — skipping
it keeps the two implementations exactly equivalent), bucketed by
``int(md5(w1 + ' ' + w2)[:4], 16) % B``.

Int64 overflow bound: ``num``/``den`` ≤ (features per doc) × (corpus
bucket count) — safe through ~10^9-document corpora per bucket; beyond
that, widen SCALE-side counts to per-shard partials before the fold.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .corpus_stats import WS_SPLIT

#: feature-hash bucket count (fits int32 everywhere; 2^8 keeps the
#: broadcast arrays trivially small while separating topic mass)
NUM_BUCKETS = 256

#: acceptance-rule resolution (uniform = md5(doc_id) % RESOLUTION)
RESOLUTION = 1_000_000


def _bigram_buckets(texts, num_buckets: int = NUM_BUCKETS
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, bucket) per bigram occurrence in an Arrow string
    array — vectorized token split; md5 runs once per UNIQUE bigram in
    the batch (Zipf makes uniques ≪ occurrences)."""
    toks = pc.split_pattern_regex(pc.cast(texts, pa.string()), WS_SPLIT)
    words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).fill_null(0) \
        .to_numpy(zero_copy_only=False)
    docix = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = words != ""
    words, docix = words[keep], docix[keep]
    if len(words) < 2:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    adj = docix[:-1] == docix[1:]
    w1, w2, dix = words[:-1][adj], words[1:][adj], docix[:-1][adj]
    if len(w1) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    grams = pd.Series(w1).str.cat(pd.Series(w2), sep=" ")
    codes, uniq = pd.factorize(grams)
    ub = np.fromiter(
        (int(hashlib.md5(g.encode("utf-8")).hexdigest()[:4], 16)
         % num_buckets for g in uniq),
        count=len(uniq), dtype=np.int64)
    return dix, ub[codes]


def importance_bucket_counts(ds: rd.Dataset, target_col: str = "lang",
                             target_not: str = "en",
                             text_col: str = "text",
                             num_buckets: int = NUM_BUCKETS
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Per-bucket bigram occurrence counts: (source = whole corpus,
    target = rows where ``target_col != target_not``). Returns two
    int64 arrays of length ``num_buckets``."""
    def partial(t: pa.Table) -> pa.Table:
        dix, b = _bigram_buckets(t[text_col], num_buckets)
        is_tgt = pc.invert(pc.equal(t[target_col], target_not)) \
            .fill_null(False).to_numpy(zero_copy_only=False)
        s_n = np.bincount(b, minlength=num_buckets)
        t_n = np.bincount(b[is_tgt[dix]], minlength=num_buckets)
        return pa.table({
            "b": pa.array(np.arange(num_buckets, dtype=np.int64)),
            "s_n": pa.array(s_n.astype(np.int64)),
            "t_n": pa.array(t_n.astype(np.int64))})

    folded = (ds.map_batches(partial, batch_format="pyarrow")
              .to_pandas().groupby("b")[["s_n", "t_n"]].sum())
    s = np.zeros(num_buckets, dtype=np.int64)
    t = np.zeros(num_buckets, dtype=np.int64)
    s[folded.index.to_numpy()] = folded["s_n"].to_numpy()
    t[folded.index.to_numpy()] = folded["t_n"].to_numpy()
    return s, t


def importance_weights(ds: rd.Dataset, src_counts: np.ndarray,
                       tgt_counts: np.ndarray,
                       id_col: str = "doc_id", text_col: str = "text",
                       num_buckets: int = NUM_BUCKETS) -> rd.Dataset:
    """(doc_id, num, den, weight) per document. ``weight`` is NULL for
    documents with no bigram feature (< 2 tokens or NULL text)."""
    s_tot = int(src_counts.sum())
    t_tot = int(tgt_counts.sum())
    ratio = float(s_tot) / float(t_tot) if t_tot else float("nan")
    src = src_counts.astype(np.int64)
    tgt = tgt_counts.astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        n = t.num_rows
        dix, b = _bigram_buckets(t[text_col], num_buckets)
        num = np.zeros(n, dtype=np.int64)
        den = np.zeros(n, dtype=np.int64)
        np.add.at(num, dix, tgt[b])
        np.add.at(den, dix, src[b])
        w = np.where(den > 0,
                     (num.astype(np.float64)
                      / np.where(den > 0, den, 1).astype(np.float64))
                     * ratio, np.nan)
        return pa.table({
            id_col: t[id_col],
            "num": pa.array(num), "den": pa.array(den),
            "weight": pa.array(w, pa.float64(),
                               mask=~(den > 0))})

    return ds.map_batches(score, batch_format="pyarrow")


def importance_resample(weights: rd.Dataset, rate: float = 0.5,
                        id_col: str = "doc_id") -> rd.Dataset:
    """Deterministic importance resample over an ``importance_weights``
    output: keep iff md5-uniform(doc_id) < floor(min(1, rate·weight) ·
    RESOLUTION). Weight-NULL documents are dropped (no feature mass to
    score them with). Output: the kept (doc_id, weight) rows."""
    def cut(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].astype("int64")
        u = ids.map(lambda v: int(
            hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
            % RESOLUTION).to_numpy()
        w = df["weight"].to_numpy(np.float64)
        thresh = np.floor(np.minimum(1.0, rate * w) * RESOLUTION)
        keep = ~np.isnan(w) & (u < thresh)
        return df.loc[keep, [id_col, "weight"]]

    return weights.map_batches(cut, batch_format="pandas")
