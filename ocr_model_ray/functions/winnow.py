"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS local fingerprinting algorithm).

Per document: hash every character k-gram, slide a window of ``w``
consecutive gram hashes, and select the RIGHTMOST minimum of each
window. The selected (position, hash) set is the fingerprint sketch;
the paper's guarantee: any substring match of length >= w + k - 1
between two documents shares at least one fingerprint. This is the
local-dedup / plagiarism-detection primitive the MinHash family can't
provide (MinHash is document-global; winnowing localizes the match).

Exact-parity choices (the repo's SQL-twin doctrine):

* Gram hash is a Karp-Rabin polynomial over CODEPOINTS, evaluated
  directly: ``h_i = (sum_j cp(text[i+j]) * B^(k-1-j)) % M`` with
  ``B = 1_000_003`` and ``M = 2_147_483_647`` (Mersenne 2^31-1) — all
  int64-exact (term < 2^52, k-term sum < 2^55), so DuckDB computes the
  IDENTICAL hash from ``unicode(substr(...))`` and literal power-mod
  constants. 31 bits is below the paper's 64-bit suggestion; hash
  collisions only add spurious shared fingerprints (they never lose
  the guarantee), and the exact SQL twin is worth the trade here — a
  production corpus can raise M once no oracle is required.
* Tie-break is the paper's rightmost-minimum, made deterministic in
  both engines (numpy: argmin over the REVERSED window picks the
  rightmost; SQL: ``row_number() ORDER BY h ASC, i DESC``).
* Documents with fewer than ``w + k - 1`` characters have no full
  window and yield no fingerprints, matching the SQL inner join.

Scale shape: fingerprinting is ONE ``map_batches`` pass — each row is
a whole document, per-doc work is numpy over its codepoint array
(``sliding_window_view`` over the gram-hash array), and no shuffle
happens at all; the output is ~n_grams/w rows per doc. The pair query
exchanges DISTINCT (hash, doc) rows bucketed by hash — the posting
list per hash is winnow-thinned (only selected fingerprints move, not
raw grams), and ``max_df`` drops hotter-than-N hashes with a logged
count per the no-silent-caps rule (boilerplate banners select the
same fingerprints in every copy — exactly the hashes that explode the
pair join).

Reference semantics anchor: the reference dedups documents by whole-
content hash (worker/processors cache lookup, see stages/dedup.py
citations); winnowing extends that surface to PARTIAL-overlap
detection as SURVEY §2's D1 family does for exact dups.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .dedup_algos import _resolve_mode

logger = logging.getLogger(__name__)

#: doc-count cut below which the per-doc fingerprint-set-size table
#: broadcasts for the ratio cut (5M rows = 80 MB in plasma) instead
#: of the two bucketed joins — the small-dim broadcast doctrine.
BROADCAST_DOCS = 5_000_000

#: Karp-Rabin base / modulus — shared verbatim with the SQL oracles.
KR_BASE = 1_000_003
KR_MOD = 2_147_483_647

#: default gram size / window size (guarantee threshold t = w + k - 1)
DEFAULT_K = 5
DEFAULT_W = 8


def _kr_constants(k: int) -> np.ndarray:
    """B^(k-1-j) % M for j = 0..k-1 (int64)."""
    return np.array([pow(KR_BASE, k - 1 - j, KR_MOD) for j in range(k)],
                    dtype=np.int64)


def _doc_fingerprints(text: str, k: int, w: int,
                      consts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(positions 1-based, hashes) of the winnowing selection for one
    document — numpy end to end over the doc's codepoint array."""
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.int64)
    n = len(cp) - k + 1
    if n < w:  # no full window
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    # gram hashes: k shifted multiply-adds, one % at the end (term sum
    # < k * 2^52 — int64-safe, same order as the SQL expression)
    h = np.zeros(n, dtype=np.int64)
    for j in range(k):
        h += cp[j:j + n] * consts[j]
    h %= KR_MOD
    # rightmost minimum per window: argmin over the reversed window
    # axis returns the FIRST minimum of the reversal = rightmost of
    # the original
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(win), dtype=np.int64) + (w - 1) - rev_arg
    sel = np.unique(pos)
    return sel + 1, h[sel]  # 1-based positions (SQL substr indexing)


def fingerprint_rows(ds: rd.Dataset, k: int = DEFAULT_K,
                     w: int = DEFAULT_W, text_col: str = "text",
                     doc_col: str = "doc_id") -> rd.Dataset:
    """(doc_id, pos, h) winnowing fingerprints — one streaming pass,
    no shuffle. ``pos`` is the 1-based gram start; ``h`` the 31-bit
    Karp-Rabin gram hash."""
    consts = _kr_constants(k)

    def batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[doc_col].to_numpy(zero_copy_only=False)
        out_id, out_pos, out_h = [], [], []
        for i, txt in enumerate(texts):
            if not txt:
                continue
            pos, h = _doc_fingerprints(txt, k, w, consts)
            if len(pos):
                out_id.append(np.full(len(pos), ids[i], dtype=np.int64))
                out_pos.append(pos)
                out_h.append(h)
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id)),
            "pos": pa.array(np.concatenate(out_pos)),
            "h": pa.array(np.concatenate(out_h))})

    return ds.map_batches(batch, batch_format="pyarrow", batch_size=None)


def fingerprint_summary(ds: rd.Dataset, k: int = DEFAULT_K,
                        w: int = DEFAULT_W, text_col: str = "text",
                        doc_col: str = "doc_id") -> pd.DataFrame:
    """Per-doc sketch summary: (doc_id, n_fp, sum_h, min_pos, max_pos).

    Rows are whole documents, so each batch's per-doc aggregate is
    final — the driver concatenates one small frame per block, never
    the fingerprint rows themselves. ``sum_h`` <= n_grams * 2^31
    (int64-safe at any document length that fits memory) and pins the
    exact selection set, not just its size."""
    consts = _kr_constants(k)

    def batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[doc_col].to_numpy(zero_copy_only=False)
        rows = {"doc_id": [], "n_fp": [], "sum_h": [],
                "min_pos": [], "max_pos": []}
        for i, txt in enumerate(texts):
            if not txt:
                continue
            pos, h = _doc_fingerprints(txt, k, w, consts)
            if len(pos):
                rows["doc_id"].append(ids[i])
                rows["n_fp"].append(len(pos))
                rows["sum_h"].append(int(h.sum()))
                rows["min_pos"].append(int(pos.min()))
                rows["max_pos"].append(int(pos.max()))
        return pa.table({c: pa.array(np.asarray(v, np.int64))
                         for c, v in rows.items()})

    out = ds.map_batches(batch, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                             ["doc_id", "n_fp", "sum_h",
                              "min_pos", "max_pos"]})
    return (out.astype("int64").sort_values("doc_id")
            .reset_index(drop=True))


def _distinct_postings(ds: rd.Dataset, k: int, w: int,
                       text_col: str, doc_col: str) -> rd.Dataset:
    """Lazy distinct (h, doc_id) posting rows — the winnow-thinned
    sketch both plans consume (each doc's rows live in one block, so
    the per-block distinct fold is complete per doc)."""
    def distinct_block(t: pa.Table) -> pa.Table:
        g = t.group_by(["h", "doc_id"]).aggregate([])
        return g.select(["h", "doc_id"])

    return fingerprint_rows(ds, k=k, w=w, text_col=text_col,
                            doc_col=doc_col) \
        .map_batches(distinct_block, batch_format="pyarrow")


def _count_pairs(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """(doc_a, doc_b, n) multiplicities — packed-uint64 np.unique
    when ids fit 32 bits (C-speed on tens of millions of pairs),
    pandas groupby otherwise."""
    if len(a) and max(int(a.max()), int(b.max())) < 2**31 \
            and min(int(a.min()), int(b.min())) >= 0:
        key = (a.astype(np.uint64) << np.uint64(32)) \
            | b.astype(np.uint64)
        u, n = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "doc_a": (u >> np.uint64(32)).astype(np.int64),
            "doc_b": (u & np.uint64(0xFFFFFFFF)).astype(np.int64),
            "n": n.astype(np.int64)})
    return (pd.DataFrame({"doc_a": a, "doc_b": b})
            .groupby(["doc_a", "doc_b"], as_index=False).size()
            .rename(columns={"size": "n"}))


def _pairs_of(frame: pd.DataFrame) -> pd.DataFrame:
    """COUNTED pairs (doc_a, doc_b, n) from complete per-hash
    posting lists (frame holds every row of each hash it contains;
    hot hashes are already excluded globally). ``n`` counts shared
    hashes WITHIN this frame — a combiner partial when frames are
    hash buckets, the final count on a whole-corpus frame.

    Pair generation is vectorized by DISTINCT GROUP SIZE: groups
    of equal size m stack into a (G, m) matrix and one
    triu_indices gather emits all their pairs — the Python loop is
    O(#distinct sizes), never O(#hashes) or O(#pairs)."""
    out_empty = pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64")})
    if frame.empty:
        return out_empty
    f = frame.drop_duplicates(["h", "doc_id"])
    f = f.sort_values(["h", "doc_id"], kind="mergesort")
    h = f["h"].to_numpy()
    d = f["doc_id"].to_numpy(dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    sizes = np.r_[starts[1:], len(h)] - starts
    starts, sizes = starts[sizes >= 2], sizes[sizes >= 2]
    if not len(starts):
        return out_empty
    aa, bb = [], []
    for m in np.unique(sizes):
        gs = starts[sizes == m]
        docs = d[gs[:, None] + np.arange(m)]      # (G, m)
        iu, ju = np.triu_indices(int(m), 1)
        aa.append(docs[:, iu].ravel())
        bb.append(docs[:, ju].ravel())
    return _count_pairs(np.concatenate(aa), np.concatenate(bb))


def _make_score_cut(metric: str, jq_num: int, jq_den: int):
    """(ns, na, nb) -> (keep mask, score) — integer cross-multiply
    cut, one float division; denominator is the union (jaccard) or
    the smaller set size (overlap)."""
    def score_and_cut(ns: np.ndarray, na: np.ndarray,
                      nb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        denom = (na + nb - ns) if metric == "jaccard" \
            else np.minimum(na, nb)
        keep = ns * jq_den >= jq_num * denom
        return keep, ns / (denom * 1.0)
    return score_and_cut


def _empty_pairs(score_col: str) -> pd.DataFrame:
    return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                         "doc_b": pd.Series([], dtype="int64"),
                         "n_shared": pd.Series([], dtype="int64"),
                         score_col: pd.Series([], dtype="float64")})


def shared_fingerprint_pairs_ds(ds: rd.Dataset, k: int = DEFAULT_K,
                                w: int = DEFAULT_W, min_shared: int = 2,
                                jq_num: int = 1, jq_den: int = 2,
                                max_df: int = 1000,
                                text_col: str = "text",
                                doc_col: str = "doc_id",
                                num_buckets: int = 32,
                                metric: str = "jaccard") -> rd.Dataset:
    """The fully distributed winnow-pair plan, returning the
    qualifying-pair DATASET — pairs never materialize on the driver
    (round-4 verdict #1: at 10^12 docs with web-typical partial-dup
    rates the qualifying set is O(dup mass) and must stay in the
    object store, consumable by ``write_parquet`` or
    ``label_propagation_ds``). Semantics identical to
    ``shared_fingerprint_pairs`` (its docstring is normative); the
    pandas wrapper is the driver-compare shim over this plan.

    Plan (each step one exchange or one streaming pass): fingerprint
    scan -> narrow distinct (h, doc) checkpoint -> bucketed df pass ->
    broadcast hot-hash filter -> per-bucket pair combiner -> pair-
    bucketed count -> min_shared prefilter -> ratio cut (broadcast
    size table below ``BROADCAST_DOCS``, two bucketed joins above)."""
    if metric not in ("jaccard", "overlap"):
        raise ValueError(f"unknown metric {metric!r}")
    score_col = "jaccard" if metric == "jaccard" else "overlap"
    score_and_cut = _make_score_cut(metric, jq_num, jq_den)
    empty = _empty_pairs(score_col)

    import ray
    import pyarrow.compute as pc

    from .bucketed import bucketed_agg
    from .joins import hash_bucket_join

    # The pair plan consumes ``dist`` through FOUR DAG branches (df
    # pass, pair pass, the two set-size joins); without a checkpoint
    # Ray re-executes the fingerprint text scan once per branch.
    # Materialize the NARROW distinct (h, doc_id) rows once —
    # ~n_chars/w postings/doc at 16 B each, the winnow-thinned sketch,
    # never the text — so the scan runs exactly once (measured 9.6 ->
    # ~3 s at sf0.1; the packing family's narrow-checkpoint doctrine).
    dist = _distinct_postings(ds, k, w, text_col, doc_col).materialize()

    # hot-hash set: one bucketed df pass; the driver frame is bounded
    # by total_postings / max_df (pigeonhole)
    dfs = bucketed_agg(dist, "h", {"df": ("doc_id", "size")})
    dsch = dfs.schema()
    if dsch is None or "df" not in dsch.names:
        return rd.from_pandas(empty)
    hot = dfs.map_batches(
        lambda t: t.filter(pc.greater(t["df"], max_df)).select(["h"]),
        batch_format="pyarrow").to_pandas()
    if len(hot):
        logger.warning(
            "winnow pairs: excluding %d hashes with df > %d "
            "(boilerplate guard)", len(hot), max_df)
        hot_ref = ray.put(pa.array(hot["h"].to_numpy(np.int64)))
        # checkpoint the filtered postings too: three branches (pairs
        # + both count sides) read them
        dist = dist.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(
                t["h"], value_set=ray.get(hot_ref)))),
            batch_format="pyarrow").materialize()

    def tag(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["h"], num_buckets - 1),
                    pa.int32())
        return t.append_column("__b", b)

    # _pairs_of emits COUNTED (doc_a, doc_b, n) partials — the pair
    # combiner: a pair sharing many hashes collapses inside each
    # bucket, so the exchange ships counted rows, never the raw
    # per-shared-hash pair stream (28M raw pair rows -> ~1M counted
    # partials on the sf0.1 bench corpus)
    pair_parts = (dist.map_batches(tag, batch_format="pyarrow")
                  .groupby("__b")
                  .map_groups(_pairs_of, batch_format="pandas"))
    agg = bucketed_agg(pair_parts, ["doc_a", "doc_b"],
                       {"n_shared": ("n", "sum")})
    sch = agg.schema()
    if sch is None or "n_shared" not in sch.names:
        return rd.from_pandas(empty)
    survivors = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_shared"], min_shared)),
        batch_format="pyarrow")
    # distinct-hash count per doc: a doc's fingerprint rows live in
    # one block, so the per-block fold is final. Materialized ONCE:
    # both regimes below consume it (count + collect, or the two join
    # sides) — without the checkpoint the count() and the consumer
    # each re-execute the aggregation (round-4 ADVICE).
    counts = dist.map_batches(
        lambda t: t.group_by("doc_id").aggregate([([], "count_all")])
                   .select(["doc_id", "count_all"])
                   .rename_columns(["doc_id", "nf"]),
        batch_format="pyarrow").materialize()
    # The ratio cut needs each side's fingerprint-set size. The size
    # table is ONE narrow row per doc: below ``broadcast_docs`` it
    # rides the object store once and the cut is a single streaming
    # pass over the survivors (two sorted-array gathers — measured
    # 5.6 s of bucket joins -> ~0.5 s on 6.7M survivors at sf0.1);
    # above it (the 10^12-doc shape) the two bucketed joins stand.
    n_docs = counts.count()
    if n_docs <= BROADCAST_DOCS:
        cf = counts.to_pandas()
        order = np.argsort(cf["doc_id"].to_numpy())
        size_ref = ray.put((
            cf["doc_id"].to_numpy(np.int64)[order],
            cf["nf"].to_numpy(np.int64)[order]))

        def bcast_cut(t: pa.Table) -> pa.Table:
            sid, snf = ray.get(size_ref)
            ns = t["n_shared"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            da = t["doc_a"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            db = t["doc_b"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            na = snf[np.searchsorted(sid, da)]
            nb = snf[np.searchsorted(sid, db)]
            keep, score = score_and_cut(ns, na, nb)
            return pa.table({
                "doc_a": pa.array(da[keep]),
                "doc_b": pa.array(db[keep]),
                "n_shared": pa.array(ns[keep]),
                score_col: pa.array(score[keep])})

        return survivors.map_batches(bcast_cut, batch_format="pyarrow")

    counts_a = counts.map_batches(
        lambda t: t.select(["doc_id", "nf"])
                   .rename_columns(["doc_a", "n_a"]),
        batch_format="pyarrow")
    counts_b = counts.map_batches(
        lambda t: t.select(["doc_id", "nf"])
                   .rename_columns(["doc_b", "n_b"]),
        batch_format="pyarrow")
    j1 = hash_bucket_join(survivors, counts_a, on="doc_a",
                          num_buckets=num_buckets)
    j2 = hash_bucket_join(j1, counts_b, on="doc_b",
                          num_buckets=num_buckets)

    def ratio_cut(t: pa.Table) -> pa.Table:
        ns = t["n_shared"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep, score = score_and_cut(ns, na, nb)
        return pa.table({
            "doc_a": pa.array(t["doc_a"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]),
            "doc_b": pa.array(t["doc_b"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]),
            "n_shared": pa.array(ns[keep]),
            score_col: pa.array(score[keep])})

    return j2.map_batches(ratio_cut, batch_format="pyarrow")


def shared_fingerprint_pairs(ds: rd.Dataset, k: int = DEFAULT_K,
                             w: int = DEFAULT_W, min_shared: int = 2,
                             jq_num: int = 1, jq_den: int = 2,
                             max_df: int = 1000,
                             text_col: str = "text",
                             doc_col: str = "doc_id",
                             num_buckets: int = 32,
                             mode: str = "auto",
                             metric: str = "jaccard") -> pd.DataFrame:
    """Near-dup pairs by fingerprint-set Jaccard: pairs whose DISTINCT
    shared fingerprint hashes satisfy BOTH ``n_shared >= min_shared``
    and ``jaccard = n_shared / (n_a + n_b - n_shared) >=
    jq_num/jq_den``, decided by the integer cross-multiply
    ``n_shared * jq_den >= jq_num * (n_a + n_b - n_shared)`` (no float
    compare). Output: (doc_a, doc_b, n_shared, jaccard), doc_a < doc_b,
    ``jaccard`` the one bit-exact float division.

    ``metric='overlap'`` switches to the OVERLAP COEFFICIENT
    ``n_shared / min(n_a, n_b)`` (Szymkiewicz-Simpson) with the cut
    ``n_shared * jq_den >= jq_num * min(n_a, n_b)`` — the
    quote/containment detector: a short document pasted inside a long
    one scores ~1.0 here while its Jaccard stays near 0 (the union is
    dominated by the long doc). Winnowing's guarantee makes this the
    right sketch for it: every shared substring of length >= w + k - 1
    contributes shared fingerprints regardless of either document's
    total size. Output column is ``overlap`` instead of ``jaccard``.

    A raw shared-count cut is not discriminative on a corpus with a
    shared vocabulary (common char-grams make nearly every pair share
    a few fingerprints — measured 12.4M of 12.5M possible pairs at 5k
    docs); the set-Jaccard cut at 1/2 isolates the true partial-copy
    pairs (257 of 12.5M on the same corpus).

    ``max_df``: hashes selected in more than that many documents
    (site-wide boilerplate — exactly the postings that explode the
    pair join quadratically) are excluded from the sketch BEFORE both
    the intersections and the set sizes, with one logged drop count
    (no-silent-caps rule); the exclusion is part of the operator's
    definition and the SQL twin applies the identical ``HAVING
    count(*) <= max_df`` cut. The hot-hash set is globally bounded by
    ``total_postings / max_df`` entries (pigeonhole), so it broadcasts
    via ``ray.put`` — raise ``max_df`` proportionally at extreme
    corpus sizes to keep it small.

    Distributed plan: one bucketed df pass finds the hot hashes; the
    broadcast-filtered distinct (h, doc) rows bucket by hash and each
    bucket emits its pairs (posting lists are winnow-thinned), a
    pair-bucketed aggregation counts shared hashes, the ``min_shared``
    prefilter cuts the quadratic tail BEFORE the two set-size joins
    (doc_a then doc_b, one bucketed exchange each), and only
    ratio-qualifying pairs reach the driver — and in the distributed
    regime they don't even do that inside the plan: this wrapper is
    the driver-compare shim over ``shared_fingerprint_pairs_ds``,
    which returns the pair DATASET for scale consumers."""
    if metric not in ("jaccard", "overlap"):
        raise ValueError(f"unknown metric {metric!r}")
    score_col = "jaccard" if metric == "jaccard" else "overlap"
    empty = _empty_pairs(score_col)

    if _resolve_mode(ds, mode) == "local":
        score_and_cut = _make_score_cut(metric, jq_num, jq_den)
        frame = _distinct_postings(ds, k, w, text_col,
                                   doc_col).to_pandas()
        if frame.empty or "h" not in frame.columns:
            return empty
        frame = frame.drop_duplicates(["h", "doc_id"])
        sizes = frame.groupby("h")["doc_id"].transform("size")
        n_hot = int((sizes > max_df).sum())
        if n_hot:
            logger.warning(
                "winnow pairs: excluded %d postings across %d hashes "
                "with df > %d (boilerplate guard)", n_hot,
                frame.loc[sizes > max_df, "h"].nunique(), max_df)
            frame = frame[sizes <= max_df]
        if frame.empty:
            return empty
        nf = frame.groupby("doc_id")["h"].size()
        counted = _pairs_of(frame).rename(columns={"n": "n_shared"})
        counted = counted[counted["n_shared"] >= min_shared]
        if counted.empty:
            return empty
        na = nf.reindex(counted["doc_a"]).to_numpy(dtype=np.int64)
        nb = nf.reindex(counted["doc_b"]).to_numpy(dtype=np.int64)
        ns = counted["n_shared"].to_numpy(dtype=np.int64)
        keep, score = score_and_cut(ns, na, nb)
        out = pd.DataFrame({
            "doc_a": counted["doc_a"].to_numpy(dtype=np.int64)[keep],
            "doc_b": counted["doc_b"].to_numpy(dtype=np.int64)[keep],
            "n_shared": ns[keep],
            score_col: score[keep]})
        return (out.sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))

    out = shared_fingerprint_pairs_ds(
        ds, k=k, w=w, min_shared=min_shared, jq_num=jq_num,
        jq_den=jq_den, max_df=max_df, text_col=text_col,
        doc_col=doc_col, num_buckets=num_buckets,
        metric=metric).to_pandas()
    if out.empty or "n_shared" not in out.columns:
        return empty
    return (out.sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
            [["doc_a", "doc_b", "n_shared", score_col]])


def winnow_dedup_clusters(ds: rd.Dataset, k: int = DEFAULT_K,
                          w: int = DEFAULT_W, min_shared: int = 2,
                          jq_num: int = 1, jq_den: int = 2,
                          max_df: int = 1000,
                          metric: str = "jaccard",
                          mode: str = "auto") -> pd.DataFrame:
    """Partial-overlap dedup clusters: the winnowing pair detector
    composed with min-label connected components — the end-to-end
    "group every document that shares a substantial substring" op
    (quote chains, mirrored article families, template litter).
    Output: (doc_id, cluster_id = min doc id of the component), docs
    in no qualifying pair absent (the recursive-CTE twin's inner
    semantics).

    Distributed plan (the near_dup_clusters doctrine): the pair
    Dataset from ``shared_fingerprint_pairs_ds`` feeds
    ``label_propagation_ds`` DIRECTLY — pairs never surface on the
    driver; only the O(clustered docs) label table collects at the
    end (it IS the result). Below 50k pairs the label rounds run on
    the driver frame instead (each Ray round costs seconds of fixed
    shuffle time that swamps a tiny graph; the pair count is metadata
    on the materialized pair set, not an extra pass)."""
    from .dedup_algos import (_resolve_mode, label_propagation_ds,
                              min_label_propagation)
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cluster_id": pd.Series([], dtype="int64")})
    if _resolve_mode(ds, mode) == "local":
        pairs = shared_fingerprint_pairs(
            ds, k=k, w=w, min_shared=min_shared, jq_num=jq_num,
            jq_den=jq_den, max_df=max_df, metric=metric, mode="local")
        if pairs.empty:
            return empty
        return min_label_propagation(pairs[["doc_a", "doc_b"]])
    pairs_ds = shared_fingerprint_pairs_ds(
        ds, k=k, w=w, min_shared=min_shared, jq_num=jq_num,
        jq_den=jq_den, max_df=max_df, metric=metric).materialize()
    if pairs_ds.count() < 50_000:
        frame = pairs_ds.to_pandas()
        if frame.empty or "doc_a" not in frame.columns:
            return empty
        return min_label_propagation(frame[["doc_a", "doc_b"]])
    final = (label_propagation_ds(pairs_ds).to_pandas()
             .sort_values("node").reset_index(drop=True)
             .astype({"node": "int64", "label": "int64"}))
    return pd.DataFrame({"doc_id": final["node"],
                         "cluster_id": final["label"]})
