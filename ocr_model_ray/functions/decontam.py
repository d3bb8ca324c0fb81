"""Benchmark decontamination: flag corpus documents that share token
n-grams with a held-out evaluation set.

Engine extension (no reference counterpart): before training on a web
corpus you must remove documents that leak benchmark content — the
standard recipe (GPT-3 appendix C / PaLM) is exact n-gram collision
against the eval set's token n-grams.

Scale shape: the eval side is small by construction (benchmarks are
KB–MB where the corpus is TB), so its distinct n-gram set broadcasts
once (``ray.put``) and the corpus side streams through ONE
``map_batches`` pass — no shuffle, no join.

Above ``bloom_threshold`` distinct grams the broadcast switches to the
BLOOM plan (round-3 verdict #4, backed by ``joins.BloomFilter``):

1. the gram set compresses to a bit array (~1.5 bytes/gram instead of
   a ~60-byte Python string per gram in every worker process);
2. one corpus pass emits only the (doc_id, gram) rows the filter says
   MIGHT collide — bounded by true hits + the false-positive tail;
3. the maybe-hits rescreen EXACTLY against the true gram set (which
   the caller already holds) on the driver, so false positives can
   never flag a document — output is bit-identical to the exact plan
   (pinned by test);
4. a second streaming pass attaches the per-doc exact counts (a tiny
   broadcast dict) to every corpus row.

Tokenization is whitespace ``\\S+`` runs, identical to
``text_stats.token_count_batch`` and the SQL oracles.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

log = logging.getLogger("ocr_model_ray.decontam")

#: eval-gram sets larger than this take the Bloom plan (a set of this
#: many ~8-token gram strings costs workers ~1 GB deserialized; the
#: bloom bit array for the same set is ~45 MB)
BLOOM_THRESHOLD = 5_000_000


def ngram_set(texts, n: int = 8) -> set:
    """Distinct space-joined token n-grams over an iterable of texts."""
    grams: set = set()
    for t in texts:
        if not isinstance(t, str):
            continue
        toks = t.split()
        grams.update(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))
    return grams


def _doc_grams(t, n: int) -> set:
    if not isinstance(t, str):
        return set()
    toks = t.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _hash_grams(grams) -> np.ndarray:
    """Deterministic 64-bit hashes for gram strings (pandas' cython
    siphash with its fixed default key — stable across processes)."""
    arr = np.asarray(list(grams), dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


def contamination(ds: rd.Dataset, eval_grams: set, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bloom_threshold: int = BLOOM_THRESHOLD) -> rd.Dataset:
    """Per-document contamination flags: (id_col, n_contaminated
    [distinct colliding n-grams], contaminated). Streaming,
    shuffle-free; plan picked by eval-set size (module docstring)."""
    if len(eval_grams) > bloom_threshold:
        return _contamination_bloom(ds, eval_grams, n, id_col, text_col)
    ref = ray.put(eval_grams)

    def flag(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        df = batch.select([id_col, text_col]).to_pandas()
        hits = [len(_doc_grams(t, n) & grams) for t in df[text_col]]
        return pa.table({
            id_col: pa.array(df[id_col].astype("int64")),
            "n_contaminated": pa.array(hits, pa.int64()),
            "contaminated": pa.array([h > 0 for h in hits], pa.bool_()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def _contamination_bloom(ds: rd.Dataset, eval_grams: set, n: int,
                         id_col: str, text_col: str) -> rd.Dataset:
    """The TB-eval-set plan: bloom pre-screen + exact rescreen of the
    maybe-hits. Output bit-identical to the exact plan."""
    from .joins import BloomFilter

    bf = BloomFilter(capacity=max(len(eval_grams), 1))
    bf.add(_hash_grams(eval_grams).view(np.int64))
    bref = ray.put(bf)
    log.info("decontamination: bloom plan over %d eval grams "
             "(%.1f MB filter)", len(eval_grams), bf.bits.nbytes / 1e6)

    def maybe_hits(batch: pa.Table) -> pa.Table:
        f = ray.get(bref)
        df = batch.select([id_col, text_col]).to_pandas()
        out_ids, out_grams = [], []
        for i, t in zip(df[id_col].astype("int64"), df[text_col]):
            dg = np.array(sorted(_doc_grams(t, n)), dtype=object)
            if dg.size == 0:
                continue
            mask = f.might_contain(
                pd.util.hash_array(dg, categorize=False)
                .astype(np.uint64))
            if mask.any():
                sel = dg[mask]
                out_ids.append(np.full(sel.size, int(i), np.int64))
                out_grams.append(sel)
        if not out_ids:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string())})
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids), pa.int64()),
            "gram": pa.array(np.concatenate(out_grams), pa.string())})

    maybe = ds.map_batches(maybe_hits, batch_format="pyarrow").to_pandas()
    # bounded by true collisions + the FP tail (~2% of distinct doc
    # grams at the default 12 bits/key); exact rescreen on the driver,
    # which already holds the true gram set
    if maybe.empty or "gram" not in maybe.columns:
        counts: dict[int, int] = {}
    else:
        log.info("decontamination: %d bloom maybe-hit gram rows "
                 "rescreening exactly", len(maybe))
        true_hits = maybe[maybe["gram"].isin(eval_grams)]
        counts = true_hits.groupby(id_col)["gram"].size().to_dict()
    cref = ray.put(counts)

    def flag(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hits = np.fromiter((c.get(int(i), 0) for i in ids),
                           dtype=np.int64, count=len(ids))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_contaminated": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0, pa.bool_()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def split_leakage(ds: rd.Dataset, holdout_mod: int = 10,
                  threshold: float = 0.8, ngram: int = 3,
                  mode: str = "auto", num_buckets: int = 64,
                  max_df: int | None = None) -> pd.DataFrame:
    """Cross-split leakage audit for an ID-KEYED train/heldout split
    (heldout = ``doc_id % holdout_mod == 0``): one row per TRAIN doc
    that leaks heldout content, via exact text duplication (md5
    collision — catches short texts with no word n-grams) and/or
    word-``ngram`` Jaccard >= ``threshold``. Output: (doc_id,
    exact_leak, max_jaccard) — max_jaccard is NULL for exact-only
    leaks. This is the audit that shows why content-keyed splitting
    (``hash_split_batch``) matters: an id-keyed split leaks every
    duplicated document across the boundary.

    Scale shape: the exact side is one bucketed exchange of
    (md5, doc_id, held) rows — texts never move; the near side is the
    exact Jaccard join (``jaccard_similarity_join``), the bounded-
    corpus oracle-verifiable baseline — at web scale swap in the
    MinHash path (``near_dup_pairs``) and apply the identical
    cross-split pair filter; only leaking ids reach the driver."""
    from .dedup_algos import jaccard_similarity_join
    from .text_stats import md5_hex
    from .window import hash_partitioned_window

    def project(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hex(df["text"])
        keep = h.notna().to_numpy()
        hv = h.to_numpy()[keep]
        ids = df["doc_id"].to_numpy()[keep].astype(np.int64)
        hb = np.fromiter((int(x[:8], 16) for x in hv),
                         dtype=np.int64, count=len(hv))
        return pd.DataFrame({"hb": hb, "h": hv, "doc_id": ids,
                             "held": ids % holdout_mod == 0})

    def kern(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        anyheld = g.groupby("h")["held"].transform("any").to_numpy()
        out = g[anyheld & ~g["held"].to_numpy()]
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy()})

    exact_ds = hash_partitioned_window(
        ds.map_batches(project, batch_format="pandas"),
        "hb", ["h"], kern, num_buckets=num_buckets)
    exact_pd = exact_ds.to_pandas()
    exact_ids = (exact_pd["doc_id"].to_numpy().astype(np.int64)
                 if "doc_id" in exact_pd.columns else
                 np.array([], dtype=np.int64))

    pairs = jaccard_similarity_join(ds, threshold=threshold,
                                    ngram=ngram, mode=mode,
                                    num_buckets=num_buckets,
                                    max_df=max_df)
    if len(pairs):
        a = pairs["doc_a"].to_numpy()
        b = pairs["doc_b"].to_numpy()
        cross = (a % holdout_mod == 0) != (b % holdout_mod == 0)
        train = np.where(a % holdout_mod == 0, b, a)[cross]
        near = (pd.DataFrame({"doc_id": train,
                              "j": pairs["jaccard"].to_numpy()[cross]})
                .groupby("doc_id", as_index=False)["j"].max()
                .rename(columns={"j": "max_jaccard"}))
    else:
        near = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "max_jaccard": pd.Series([], dtype="float64")})

    ex = pd.DataFrame({"doc_id": np.unique(exact_ids)})
    ex["exact_leak"] = True
    out = ex.merge(near, on="doc_id", how="outer")
    if out.empty:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "exact_leak": pd.Series([], dtype="bool"),
            "max_jaccard": pd.Series([], dtype="float64")})
    out["exact_leak"] = out["exact_leak"].eq(True)
    out["max_jaccard"] = out["max_jaccard"].astype("float64")
    return (out.astype({"doc_id": "int64"})
            .sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "exact_leak", "max_jaccard"]])
