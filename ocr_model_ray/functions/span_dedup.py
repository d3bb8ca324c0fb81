"""Duplicate-SPAN removal: cut every token n-gram span that repeats
across documents (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" — the substring-granularity dedup; their
suffix-array plan is replaced by a hash-count plan that Ray Data can
shuffle).

Semantics (mirrored exactly by the SQL oracle):

* tokens are whitespace runs (``text_stats`` convention);
* an n-gram (default ``n=10``) is "duplicate" if it occurs in
  >= ``min_docs`` DISTINCT documents;
* in every document, each token covered by ANY duplicate-gram
  occurrence is removed (drop-all, both/all copies — repeated content
  is noise wherever it appears);
* output text is the surviving tokens joined by single spaces
  (tokenization is not whitespace-preserving, same as the oracle).

Engine shape:

* Tokens are exploded ONCE per batch with Arrow kernels
  (``split_pattern_regex`` -> flatten -> parent indices; empty runs
  masked out) — no per-row Python split.
* Gram hashes are O(tokens), not O(tokens x n): with token hashes
  ``h[j]`` and an odd mixing constant ``M`` (invertible mod 2^64),
  the prefix sums ``P[i] = sum h[j] M^j (j < i)`` give every gram hash
  as ``(P[i+n] - P[i]) * Minv^i`` — three vectorized uint64 ops per
  position, wraparound arithmetic doing the modular reduction for
  free. Grams never cross documents (positions where the parent doc
  changes within the window are masked).
* Pass 1 counts distinct docs per gram hash exactly like
  ``line_dedup``: per-batch distinct-(doc, gram) partials, one
  bucketed 8-byte-row exchange (``bucketed_agg``). Text never moves.
* Pass 2 ``broadcast``: the dup-hash set ships once (``ray.put``); a
  second streaming pass marks covered tokens with a +1/-1 difference
  cumsum (grams are doc-local, so one global cumsum per batch is
  correct) and rewrites each doc.
* Pass 2 ``distributed`` (dup set too big to broadcast): gram-hit
  candidate rows are (doc_id, pos, hash) — 24 bytes, NO text — bloom
  pre-screened (~1.5 bytes/key bit array; measured 150 -> 125 s at
  1.25M docs / 81M gram rows, the win growing with the non-dup share)
  then confirmed exactly by an inner ``hash_bucket_join`` against the
  dup set, a bucketed list-agg folds hits to one row per hit doc, and
  ONE text exchange (left join docs x hit-lists, rewrite in
  ``post_merge``) rebuilds the corpus. Driver holds nothing.

The SQL oracle counts literal gram strings where the engine counts
rolling 64-bit hashes — equivalent up to collisions (~N^2/2^65), the
same contract as ``line_dedup`` and the bucket exchanges.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

log = logging.getLogger("ocr_model_ray.span_dedup")

_M = np.uint64(0x9E3779B97F4A7C15)          # odd -> invertible mod 2^64
_MINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))

#: same rationale as line_dedup's cut: 8-byte hash rows broadcast
#: fine into the hundreds of millions; above that the distributed
#: confirm join takes over. Measured at 1.25M docs (81M gram rows):
#: broadcast 16.0 s vs distributed 114.5 s — the gram-row exchange +
#: text exchange cost ~7x, so broadcast wins whenever it fits.
BROADCAST_MAX_HASHES = 50_000_000

_WS = "[ \\t\\n\\r\\f\\v]+"


def _token_stream(t: pa.Table, text_col: str):
    """Whitespace tokens for one Arrow batch, vectorized: returns
    (tokens object ndarray, parent doc index ndarray) with empty runs
    removed, order preserved."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(col, _WS)
    flat = pc.list_flatten(lists)
    par = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    obj = flat.to_numpy(zero_copy_only=False)
    return obj[keep], par[keep]


def _gram_hashes(obj: np.ndarray, par: np.ndarray, n: int):
    """O(tokens) rolling gram hashes. Returns (g, gpar, gpos, starts):
    hash, doc index, in-doc position and global flat start index of
    every n-gram that lies wholly inside one document."""
    total = obj.size
    if total < n:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64), np.empty(0, np.int64))
    h = pd.util.hash_array(obj, categorize=False).astype(np.uint64)
    powers = np.empty(total, dtype=np.uint64)
    powers[0] = np.uint64(1)
    np.multiply.accumulate(np.full(total, _M, np.uint64)[:-1],
                           out=powers[1:])
    inv = np.empty(total, dtype=np.uint64)
    inv[0] = np.uint64(1)
    np.multiply.accumulate(np.full(total, _MINV, np.uint64)[:-1],
                           out=inv[1:])
    pref = np.zeros(total + 1, dtype=np.uint64)
    np.cumsum(h * powers, out=pref[1:])
    starts = np.arange(total - n + 1)
    g = (pref[starts + n] - pref[starts]) * inv[starts]
    same_doc = par[starts] == par[starts + n - 1]
    starts = starts[same_doc]
    g = g[same_doc]
    gpar = par[starts]
    doc_start = np.searchsorted(par, gpar)   # par non-decreasing
    gpos = starts - doc_start
    return g, gpar, gpos, starts


def dup_gram_counts(ds: rd.Dataset, text_col: str = "text",
                    n: int = 10, num_buckets: int = 64) -> rd.Dataset:
    """Distinct-document counts per gram hash: Dataset of
    (h:int64 [uint64 view], n_docs:int64)."""
    from .bucketed import bucketed_agg

    def partial(t: pa.Table) -> pa.Table:
        obj, par = _token_stream(t, text_col)
        g, gpar, _, _ = _gram_hashes(obj, par, n)
        if g.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((g, gpar))
        gs, ps = g[order], gpar[order]
        first = np.ones(gs.size, dtype=bool)
        first[1:] = (gs[1:] != gs[:-1]) | (ps[1:] != ps[:-1])
        uh, counts = np.unique(gs[first], return_counts=True)
        return pa.table({"h": pa.array(uh.view(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_agg(partials, "h", {"n_docs": ("n", "sum")},
                        num_buckets=num_buckets)


def _covered_mask(total: int, hit_starts: np.ndarray, n: int):
    """Token coverage from gram-hit start indices via +1/-1 cumsum
    (grams are doc-local, so one global cumsum is correct)."""
    diff = np.zeros(total + 1, dtype=np.int64)
    np.add.at(diff, hit_starts, 1)
    np.add.at(diff, hit_starts + n, -1)
    return np.cumsum(diff[:-1]) > 0


def _rebuild(ids, obj, par, covered, n_docs: int, id_col: str):
    n_tokens = np.bincount(par, minlength=n_docs)
    n_removed = np.bincount(par[covered], minlength=n_docs)
    kobj, kpar = obj[~covered], par[~covered]
    starts = np.searchsorted(kpar, np.arange(n_docs))
    ends = np.searchsorted(kpar, np.arange(n_docs), side="right")
    texts = [" ".join(kobj[s:e]) for s, e in zip(starts, ends)]
    return pa.table({
        id_col: ids,
        "text": pa.array(texts, pa.string()),
        "n_tokens": pa.array(n_tokens.astype(np.int64)),
        "n_removed": pa.array(n_removed.astype(np.int64)),
    })


def span_dedup(ds: rd.Dataset, id_col: str = "doc_id",
               text_col: str = "text", n: int = 10, min_docs: int = 2,
               mode: str = "auto", num_buckets: int = 64) -> rd.Dataset:
    """Remove every token covered by an n-gram shared by >=
    ``min_docs`` documents. Output: (id_col, text [rewritten],
    n_tokens, n_removed) — one row per input document, streaming."""
    counts = dup_gram_counts(ds, text_col=text_col, n=n,
                             num_buckets=num_buckets)

    def only_dups(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_docs" not in t.column_names:
            return pa.table({"h": pa.array([], pa.int64()),
                             "__dup": pa.array([], pa.bool_())})
        kept = t.filter(
            pc.greater_equal(t["n_docs"], min_docs)).select(["h"])
        return kept.append_column("__dup", pa.array(
            np.ones(kept.num_rows, dtype=bool)))

    dup_ds = counts.map_batches(only_dups, batch_format="pyarrow")

    if mode == "auto":
        dup_ds = dup_ds.materialize()
        n_dup = dup_ds.count()
        mode = ("broadcast" if n_dup <= BROADCAST_MAX_HASHES
                else "distributed")
        log.info("span_dedup auto: %d dup gram hashes -> %s plan",
                 n_dup, mode)

    if mode == "distributed":
        return _span_dedup_distributed(ds, dup_ds, id_col, text_col,
                                       n, num_buckets)

    dup_pdf = dup_ds.to_pandas()
    if dup_pdf.empty or "h" not in dup_pdf.columns:
        dup_sorted = np.empty(0, dtype=np.uint64)
    else:
        dup_sorted = np.sort(dup_pdf["h"].to_numpy().view(np.uint64))
    log.info("span_dedup: %d duplicate gram hashes (broadcast %.1f MB)",
             dup_sorted.size, dup_sorted.nbytes / 1e6)
    ref = ray.put(dup_sorted)

    def rewrite(t: pa.Table) -> pa.Table:
        dup = ray.get(ref)
        obj, par = _token_stream(t, text_col)
        g, _, _, starts_all = _gram_hashes(obj, par, n)
        total = obj.size
        if dup.size and g.size:
            idx = np.searchsorted(dup, g)
            np.minimum(idx, dup.size - 1, out=idx)
            hit_starts = starts_all[dup[idx] == g]
        else:
            hit_starts = np.empty(0, dtype=np.int64)
        covered = _covered_mask(total, hit_starts, n)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return _rebuild(ids, obj, par, covered, len(t), id_col)

    return ds.map_batches(rewrite, batch_format="pyarrow")


def positional_hit_rewrite(ds: rd.Dataset, dup_ds: rd.Dataset,
                           id_col: str, rows_fn, rewrite_fn,
                           num_buckets: int = 64) -> rd.Dataset:
    """Shared no-driver-state plan for positional dedup (span AND line
    granularity): ``rows_fn`` explodes each batch to (id_col, i, h)
    candidate rows — positions + hashes, NO text — which bloom
    pre-screen (~1.5 bytes/key; near-dup verify-join doctrine) and
    confirm exactly against ``dup_ds`` in one hash join whose bucket
    task folds hit positions to csv rows per (doc, h-bucket); ONE text
    exchange then left-joins docs x hit rows and ``rewrite_fn(uniq
    batch, {id: positions ndarray})`` rebuilds each document once.

    Exchange volume: candidate rows (bounded by hits + FP tail after
    the bloom) + the corpus text once. The driver holds only the bloom
    bit array."""
    from .joins import (bloom_from_dataset, bloom_semi_filter,
                        hash_bucket_join)

    # 8-byte hash rows, object-store resident: one materialization
    # feeds the count, the bloom stream AND the join side (otherwise
    # the counting pass re-executes for each consumer)
    dup_ds = dup_ds.materialize()
    rows = ds.map_batches(rows_fn, batch_format="pyarrow")
    n_dup = dup_ds.count()
    if n_dup:
        bf = bloom_from_dataset(dup_ds, "h", capacity=n_dup)
        rows = bloom_semi_filter(rows, bf, on="h")

    # csv strings because a list<int64> column would not survive the
    # join's union-schema padding; the string round-trips exactly
    def fold_hits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # typed empty: pandas' empty groupby-agg would type hit_pos
            # int64 while non-empty buckets emit string — Arrow can't
            # unify the two block schemas downstream. A bucket CAN be
            # empty here: bloom false positives that the exact confirm
            # join eliminates leave 0 merged rows.
            return pa.table({id_col: t[id_col],
                             "hit_pos": pa.array([], pa.string())})
        df = t.select([id_col, "i"]).to_pandas()
        g = df.groupby(id_col, sort=False)["i"].agg(
            lambda s: ",".join(map(str, s))).reset_index()
        g.columns = [id_col, "hit_pos"]
        # metadata-free: pandas schema metadata (a dict) trips Ray's
        # sort-unify schema hash downstream
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    hitlists = hash_bucket_join(rows, dup_ds, on="h",
                                num_buckets=num_buckets,
                                post_merge=fold_hits)

    def rewrite_bucket(t: pa.Table) -> pa.Table:
        # the join fans a doc out once per h-bucket that hit it —
        # fold the hit csv rows per doc, then rewrite each doc once
        ids_all = t[id_col].to_numpy(zero_copy_only=False)
        first = pd.Series(np.arange(len(ids_all))) \
            .groupby(ids_all, sort=False).first().to_numpy()
        first.sort()
        uniq = t.take(pa.array(first))
        per_doc_hits: dict = {}
        if "hit_pos" in t.column_names:
            hps = t["hit_pos"].to_numpy(zero_copy_only=False)
            for did, hp in zip(ids_all, hps):
                if isinstance(hp, str) and hp:
                    per_doc_hits.setdefault(did, []).append(hp)
        hits = {did: np.array(",".join(parts).split(","),
                              dtype=np.int64)
                for did, parts in per_doc_hits.items()}
        return rewrite_fn(uniq, hits)

    return hash_bucket_join(
        ds, hitlists, on=id_col, how="left", num_buckets=num_buckets,
        post_merge=rewrite_bucket)


def _span_dedup_distributed(ds: rd.Dataset, dup_ds: rd.Dataset,
                            id_col: str, text_col: str, n: int,
                            num_buckets: int) -> rd.Dataset:
    """Span-granularity instantiation of ``positional_hit_rewrite``:
    candidate rows are gram (start, hash) pairs, the rewrite applies
    the +1/-1 coverage cumsum."""

    def gram_rows(t: pa.Table) -> pa.Table:
        obj, par = _token_stream(t, text_col)
        g, gpar, gpos, _ = _gram_hashes(obj, par, n)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[gpar]),
            "i": pa.array(gpos),
            "h": pa.array(g.view(np.int64)),
        })

    def rewrite(uniq: pa.Table, hits: dict) -> pa.Table:
        obj, par = _token_stream(uniq, text_col)
        total = obj.size
        doc_start = np.searchsorted(par, np.arange(uniq.num_rows))
        uids = uniq[id_col].to_numpy(zero_copy_only=False)
        hit_starts = [hits[did] + doc_start[d]
                      for d, did in enumerate(uids) if did in hits]
        starts = (np.concatenate(hit_starts) if hit_starts
                  else np.empty(0, dtype=np.int64))
        covered = _covered_mask(total, starts, n)
        ids = uniq[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return _rebuild(ids, obj, par, covered, uniq.num_rows, id_col)

    return positional_hit_rewrite(ds, dup_ds, id_col, gram_rows,
                                  rewrite, num_buckets)
