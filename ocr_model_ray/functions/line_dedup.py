"""Corpus-level duplicate-LINE removal (CCNet-style paragraph dedup).

Engine extension (no reference counterpart): web corpora repeat whole
lines/paragraphs across pages (navigation, footers, license boilerplate,
mirrored articles). The CCNet recipe (Wenzek et al., 2020) hashes each
paragraph and drops every occurrence of a paragraph seen in multiple
documents; C4 does the same at the span level. This module implements
that granularity of dedup — finer than document-level ``exact_dedup``,
coarser than n-gram decontamination.

Semantics (mirrored exactly by the SQL oracle):

* a "line" is a ``\\n``-separated segment of ``text_col``;
* lines shorter than ``min_len`` characters are NEVER counted or
  removed (short separators/headings stay, empty lines stay);
* a line appearing in >= ``min_docs`` DISTINCT documents is a
  duplicate; ALL of its occurrences are removed (drop-all, the CCNet
  choice — boilerplate is noise in every copy);
* per document, surviving lines are re-joined with ``\\n`` in their
  original order; a document whose every line is removed yields ``""``.

Scale shape — two plans, pinned bit-equal by test:

* ``broadcast`` (default): pass 1 streams the corpus once, emitting
  per-batch PARTIAL counts of (line-hash -> distinct docs in batch) —
  each row is one whole document, so in-batch distinct == in-doc
  distinct and the partials sum exactly. ``bucketed_agg`` finishes the
  count with one small exchange of 8-byte hash rows (never text).
  The >=min_docs hash set sorts into a uint64 array and broadcasts via
  ``ray.put`` (8 bytes/line); pass 2 streams the corpus a second time,
  membership via ``np.searchsorted``. No text ever moves.
* ``distributed``: for corpora whose duplicate-line set outgrows a
  broadcast (10^12 pages -> billions of dup lines), lines explode to
  (doc_id, pos, line) rows and semi-mark against the dup-hash Dataset
  with ONE ``hash_bucket_join`` on the line hash, then ONE second
  exchange re-buckets by doc_id and reassembles each document. Driver
  holds nothing; exchange volume is 2x the text (the honest cost of
  a no-driver-state plan).

Hashing is ``pd.util.hash_array`` siphash (64-bit, process-stable, the
same primitive the bucket exchanges use); the SQL oracle counts literal
line strings — equivalent up to 64-bit collisions (~N^2/2^65).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

log = logging.getLogger("ocr_model_ray.line_dedup")


def _explode_lines(t: pa.Table, text_col: str):
    """Vectorized line split for one Arrow batch: returns
    (lines_obj ndarray, parent row index ndarray, char lengths)."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern(col, "\n")
    flat = pc.list_flatten(lists)
    par = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
    obj = flat.to_numpy(zero_copy_only=False)
    return obj, par, lens


def _hash_lines(obj: np.ndarray) -> np.ndarray:
    if obj.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(obj, categorize=False).astype(np.uint64)


#: odd multiplier (splitmix64's golden-ratio constant) mixing the
#: scope hash into the line hash — the product wraps mod 2^64, so the
#: combined key is as collision-resistant as the inputs
_SCOPE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _scope_hashes(t: pa.Table, scope_col: str) -> np.ndarray:
    """Per-ROW scope hashes (uint64) for one batch; nulls hash as ''."""
    col = t[scope_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = pc.fill_null(col, "").to_numpy(zero_copy_only=False)
    if vals.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(vals, categorize=False).astype(np.uint64)


def _combine_scope(h: np.ndarray, hs_rows: np.ndarray,
                   par: np.ndarray) -> np.ndarray:
    """Fold each line's parent-row scope hash into its line hash, so
    'duplicate' means duplicate WITHIN a scope (e.g. per source/host);
    everything downstream (counting, broadcast set, joins) is
    unchanged — the key is just finer."""
    return h ^ (hs_rows[par] * _SCOPE_MIX)


def dup_line_counts(ds: rd.Dataset, text_col: str = "text",
                    min_len: int = 15,
                    num_buckets: int = 64,
                    scope_col: str | None = None) -> rd.Dataset:
    """Distinct-document counts per line hash: Dataset of
    (h:int64 [uint64 view], n_docs:int64) for lines >= ``min_len``
    chars. Combiner pattern: per-batch distinct-(doc, hash) partials,
    then one bucketed 8-byte-row exchange — text never shuffles.
    With ``scope_col``, the key is (scope, line) — a line counts as
    duplicated only within documents sharing the scope value."""
    from .bucketed import bucketed_agg

    def partial(t: pa.Table) -> pa.Table:
        obj, par, lens = _explode_lines(t, text_col)
        elig = lens >= min_len
        h, p = _hash_lines(obj[elig]), par[elig]
        if scope_col is not None and h.size:
            h = _combine_scope(h, _scope_hashes(t, scope_col), p)
        if h.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # distinct (doc, hash) within the batch == within each doc,
        # because one row IS one whole document
        order = np.lexsort((h, p))
        hs, ps = h[order], p[order]
        first = np.ones(hs.size, dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1])
        uh, counts = np.unique(hs[first], return_counts=True)
        return pa.table({"h": pa.array(uh.view(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_agg(partials, "h", {"n_docs": ("n", "sum")},
                        num_buckets=num_buckets)


#: auto mode broadcasts the dup-hash set up to this many hashes
#: (8 bytes each -> 400 MB in every worker's plasma view); above it,
#: the no-driver-state distributed plan takes over. Measured at 1.25M
#: docs / 47k dup hashes: broadcast 5.9 s vs distributed 34.8 s (the
#: distributed plan pays two text exchanges), so broadcast wins
#: whenever it fits.
BROADCAST_MAX_HASHES = 50_000_000


def line_dedup(ds: rd.Dataset, id_col: str = "doc_id",
               text_col: str = "text", min_docs: int = 2,
               min_len: int = 15, mode: str = "auto",
               num_buckets: int = 64,
               scope_col: str | None = None) -> rd.Dataset:
    """Remove every line shared by >= ``min_docs`` documents.

    Output: (id_col, text [rewritten], n_lines, n_removed) — one row
    per input document, streaming. ``mode``: 'auto' counts the dup-hash
    set (8-byte rows, cheap) and broadcasts it when it fits
    (``BROADCAST_MAX_HASHES``), else runs the distributed plan;
    'broadcast'/'distributed' force a plan. Plans per module
    docstring. ``scope_col`` narrows 'duplicate' to within-scope
    (RefinedWeb-style per-host boilerplate removal: a disclaimer
    repeated across one site's pages dies, the same sentence appearing
    once on each of two sites survives)."""
    counts = dup_line_counts(ds, text_col=text_col, min_len=min_len,
                             num_buckets=num_buckets,
                             scope_col=scope_col)

    def only_dups(t: pa.Table) -> pa.Table:
        # the __dup marker is built HERE (not a second map) because a
        # chained map_batches over all-empty blocks loses the schema
        # (Ray returns schema None), which the join needs
        if t.num_rows == 0 or "n_docs" not in t.column_names:
            return pa.table({"h": pa.array([], pa.int64()),
                             "__dup": pa.array([], pa.bool_())})
        kept = t.filter(
            pc.greater_equal(t["n_docs"], min_docs)).select(["h"])
        return kept.append_column("__dup", pa.array(
            np.ones(kept.num_rows, dtype=bool)))

    dup_ds = counts.map_batches(only_dups, batch_format="pyarrow")

    if mode == "auto":
        # the dup set is 8-byte rows — materialize once (object store,
        # not driver), count, and pick the plan the size can afford
        dup_ds = dup_ds.materialize()
        n_dup = dup_ds.count()
        mode = ("broadcast" if n_dup <= BROADCAST_MAX_HASHES
                else "distributed")
        log.info("line_dedup auto: %d dup hashes -> %s plan",
                 n_dup, mode)

    if mode == "distributed":
        return _line_dedup_distributed(ds, dup_ds, id_col, text_col,
                                       min_len, num_buckets,
                                       scope_col=scope_col)

    dup_pdf = dup_ds.to_pandas()
    if dup_pdf.empty or "h" not in dup_pdf.columns:
        dup_sorted = np.empty(0, dtype=np.uint64)
    else:
        dup_sorted = np.sort(
            dup_pdf["h"].to_numpy().view(np.uint64))
    log.info("line_dedup: %d duplicate line hashes (broadcast %.1f MB)",
             dup_sorted.size, dup_sorted.nbytes / 1e6)
    ref = ray.put(dup_sorted)

    def rewrite(t: pa.Table) -> pa.Table:
        dup = ray.get(ref)
        obj, par, lens = _explode_lines(t, text_col)
        h = _hash_lines(obj)
        if scope_col is not None and h.size:
            h = _combine_scope(h, _scope_hashes(t, scope_col), par)
        hit = lens >= min_len
        if dup.size and h.size:
            idx = np.searchsorted(dup, h)
            np.minimum(idx, dup.size - 1, out=idx)
            hit &= dup[idx] == h
        else:
            hit &= False
        n_docs = len(t)
        n_lines = np.bincount(par, minlength=n_docs)
        n_removed = np.bincount(par[hit], minlength=n_docs)
        keep = ~hit
        kobj, kpar = obj[keep], par[keep]
        starts = np.searchsorted(kpar, np.arange(n_docs))
        ends = np.searchsorted(kpar, np.arange(n_docs), side="right")
        texts = ["\n".join(kobj[s:e]) for s, e in zip(starts, ends)]
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids,
            "text": pa.array(texts, pa.string()),
            "n_lines": pa.array(n_lines.astype(np.int64)),
            "n_removed": pa.array(n_removed.astype(np.int64)),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")


def _line_dedup_distributed(ds: rd.Dataset, dup_ds: rd.Dataset,
                            id_col: str, text_col: str, min_len: int,
                            num_buckets: int,
                            scope_col: str | None = None) -> rd.Dataset:
    """No-driver-state plan: explode -> semi-mark join on line hash ->
    re-bucket by doc -> reassemble. Two text exchanges, zero driver
    materialization (the dup-hash side never leaves the cluster)."""
    from .bucketed import _bucket_ids
    from .joins import hash_bucket_join

    def explode(t: pa.Table) -> pa.Table:
        obj, par, lens = _explode_lines(t, text_col)
        h = _hash_lines(obj)
        if scope_col is not None and h.size:
            h = _combine_scope(h, _scope_hashes(t, scope_col), par)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # par is non-decreasing (flatten order is doc-major), so each
        # doc's first line sits at searchsorted(par, doc)
        starts = np.searchsorted(par, np.arange(len(t)))
        pos = np.arange(par.size, dtype=np.int64) - starts[par]
        out_ids = ids[par]
        out_pos = pos
        out_line = obj
        out_h = h.view(np.int64)
        out_elig = lens >= min_len
        # a null-text doc explodes to ZERO line rows (split of null is
        # a null list) — without a sentinel it would vanish from the
        # output while the broadcast plan emits it as (text='',
        # n_lines=0). One pos=-1 row per such doc keeps the plans
        # bit-equal; per_bucket excludes pos<0 from every count.
        missing = np.bincount(par, minlength=len(t)) == 0
        if missing.any():
            n_m = int(missing.sum())
            out_ids = np.concatenate([out_ids, ids[missing]])
            out_pos = np.concatenate(
                [out_pos, np.full(n_m, -1, dtype=np.int64)])
            out_line = np.concatenate(
                [out_line, np.full(n_m, "", dtype=object)])
            out_h = np.concatenate(
                [out_h, np.zeros(n_m, dtype=np.int64)])
            out_elig = np.concatenate(
                [out_elig, np.zeros(n_m, dtype=bool)])
        return pa.table({
            id_col: pa.array(out_ids),
            "pos": pa.array(out_pos),
            "line": pa.array(out_line, pa.string()),
            "h": pa.array(out_h),
            "elig": pa.array(out_elig),
        })

    lines = ds.map_batches(explode, batch_format="pyarrow")
    marked = hash_bucket_join(lines, dup_ds, on="h", how="left",
                              num_buckets=num_buckets)

    def tag_doc(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None).append_column(
            "__db", _bucket_ids(t, [id_col], num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        real = g["pos"].to_numpy() >= 0  # pos=-1: null-text sentinel
        hit = g["elig"].to_numpy() & g["__dup"].notna().to_numpy()
        ids_s = g[id_col]
        n_lines = (pd.Series(real.astype(np.int64), index=g.index)
                   .groupby(ids_s, sort=True).sum())
        n_removed = (pd.Series(hit, index=g.index)
                     .groupby(ids_s, sort=True).sum())
        kept = g[~hit & real]
        texts = kept.groupby(id_col, sort=True)["line"].agg("\n".join)
        out = pd.DataFrame({id_col: n_lines.index})
        out["text"] = texts.reindex(n_lines.index).fillna("").to_numpy()
        out["n_lines"] = n_lines.to_numpy().astype(np.int64)
        out["n_removed"] = n_removed.to_numpy().astype(np.int64)
        return out

    return (marked.map_batches(tag_doc, batch_format="pyarrow")
            .groupby("__db").map_groups(per_bucket,
                                        batch_format="pandas"))
