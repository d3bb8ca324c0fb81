"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Classic corpus-level BPE trains on the WORD-FREQUENCY table, not the
raw corpus: one streaming pass collapses the corpus to distinct
``(word, count)`` rows (the same combiner as ``corpus_stats``), and
every merge round after that touches only that vocabulary-scale table.
That is the whole scale story here:

* **One corpus pass, ever.** ``_token_counts_block`` shrinks each
  block to its local vocabulary before the single ``bucketed_agg``
  exchange; the resulting word table (~10^8 rows at web scale — GBs,
  not TBs) is materialized in the object store once.
* **Each merge round streams the static word table** — a vectorized
  pair-count combiner, one small ``bucketed_agg`` over ``(a, b)``
  partials, a top-1 reduce, and a per-row literal substring replace.
  No round re-reads the corpus (the PageRank broadcast-iteration
  doctrine: the big side never re-exchanges).

Symbol-sequence representation — the double-separator trick
----------------------------------------------------------
A word's current segmentation is a single string: symbols joined by
TWO spaces with ONE leading/trailing space (``abc`` starts as
``' a  b  c '``).  Merging pair ``(x, y)`` is then a plain
non-overlapping left-to-right ``replace(' x  y ', ' xy ')`` — and
because each match consumes one outer space from each side of the
double separators, the remaining string still carries a full
separator, so consecutive merges in a run behave exactly like greedy
left-to-right BPE: ``' a  a  a  a '`` -> ``' aa  aa '`` (a
single-space scheme gets this WRONG: the shared space is consumed and
``replace`` yields ``(aa, a, a)``).  Words never contain whitespace
(they come from the whitespace split), so patterns can't straddle
symbol boundaries.  DuckDB's ``replace`` has identical
non-overlapping left-to-right semantics, which is what makes the
unrolled-CTE SQL oracle bit-exact.

Determinism: pair selection is ``count DESC, left ASC, right ASC``
(binary codepoint order on both engines); pair counts are integer
sums, so partitioning order is irrelevant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .bucketed import bucketed_agg
from .corpus_stats import _token_counts_block
from .dedup_algos import _resolve_mode
from .topk import topk

#: symbols are joined by TWO spaces; one space pads each end
SYM_SEP = "  "

_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})


def _encode_sym_block(t: pa.Table) -> pa.Table:
    """(token, n) word-count rows -> (s, wn) padded symbol strings.

    ``w.replace('', '  ')`` inserts the double separator at every
    codepoint gap INCLUDING both ends; slicing one char off each end
    leaves exactly the ``' a  b  c '`` form. Runs once per DISTINCT
    word (vocabulary-scale, not corpus-scale), so the per-row Python
    here is off the hot path by construction.
    """
    words = t["token"].to_pylist()
    syms = [w.replace("", SYM_SEP)[1:-1] for w in words]
    return pa.table({"s": pa.array(syms, pa.string()),
                     "wn": t["n"].cast(pa.int64())})


def _pair_counts_block(t: pa.Table) -> pa.Table:
    """Adjacent-symbol pair partial counts for one word-table block,
    weighted by word count — fully vectorized (split, flatten, two
    shifted takes, one arrow group_by)."""
    if t.num_rows == 0:
        return _EMPTY_PAIRS
    stripped = pc.utf8_trim(t["s"], " ")
    lists = pc.split_pattern(stripped, pattern=SYM_SEP)
    lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
    flat = pc.list_flatten(lists).combine_chunks()
    ends = np.cumsum(lens)
    keep = np.ones(int(ends[-1]) if len(ends) else 0, dtype=bool)
    if keep.size:
        keep[ends - 1] = False          # last symbol of each word
    idx_a = np.nonzero(keep)[0]
    if idx_a.size == 0:
        return _EMPTY_PAIRS
    a = flat.take(pa.array(idx_a))
    b = flat.take(pa.array(idx_a + 1))
    w = np.repeat(t["wn"].to_numpy(zero_copy_only=False),
                  np.maximum(lens - 1, 0))
    g = (pa.table({"a": a, "b": b, "n": pa.array(w, pa.int64())})
         .group_by(["a", "b"]).aggregate([("n", "sum")]))
    return g.rename_columns(["a", "b", "n"])


def _apply_merge_block(t: pa.Table, lhs: str, rhs: str) -> pa.Table:
    """Rewrite one merge into the padded symbol strings (see module
    docstring for why plain replace is exact greedy BPE here)."""
    pat = f" {lhs}{SYM_SEP}{rhs} "
    rep = f" {lhs}{rhs} "
    return pa.table({
        "s": pc.replace_substring(t["s"], pattern=pat, replacement=rep),
        "wn": t["wn"]})


def _merges_frame(rows: list[tuple[int, str, str, int]]) -> pd.DataFrame:
    return pd.DataFrame({
        "rank": pd.Series([r[0] for r in rows], dtype="int64"),
        "lhs": pd.Series([r[1] for r in rows], dtype="object"),
        "rhs": pd.Series([r[2] for r in rows], dtype="object"),
        "n": pd.Series([r[3] for r in rows], dtype="int64")})


def _word_table(ds: rd.Dataset, text_col: str) -> rd.Dataset:
    """Corpus -> distinct (token, n) word counts: the ONLY corpus
    pass. Partials collapse each block to its local vocabulary before
    the one exchange."""
    partials = ds.map_batches(
        lambda t: _token_counts_block(t, text_col),
        batch_format="pyarrow", batch_size=None)
    return bucketed_agg(partials, "token", {"n": ("n", "sum")})


def bpe_train(ds: rd.Dataset, num_merges: int = 10,
              text_col: str = "text", min_count: int = 1,
              mode: str = "auto") -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over the corpus. Output:
    ``(rank, lhs, rhs, n)`` — merge order, the merged pair, and its
    count at selection time. Stops early when no pair reaches
    ``min_count`` (default 1 == only when no pairs remain, matching
    the SQL twin, which has no early-stop knob)."""
    resolved = _resolve_mode(ds, mode)
    merges: list[tuple[int, str, str, int]] = []

    if resolved == "local":
        words = _word_table(ds, text_col).to_pandas()
        if words.empty or "token" not in words.columns:
            return _merges_frame([])
        sym = _encode_sym_block(pa.Table.from_pandas(
            words, preserve_index=False))
        for r in range(num_merges):
            pairs = _pair_counts_block(sym).to_pandas()
            if pairs.empty:
                break
            pairs = pairs.sort_values(
                ["n", "a", "b"], ascending=[False, True, True],
                kind="mergesort")
            best = pairs.iloc[0]
            if int(best["n"]) < min_count:
                break
            merges.append((r, str(best["a"]), str(best["b"]),
                           int(best["n"])))
            sym = _apply_merge_block(sym, str(best["a"]), str(best["b"]))
        return _merges_frame(merges)

    sym = (_word_table(ds, text_col)
           .map_batches(_encode_sym_block, batch_format="pyarrow")
           .materialize())
    for r in range(num_merges):
        partials = sym.map_batches(_pair_counts_block,
                                   batch_format="pyarrow")
        summed = bucketed_agg(partials, ["a", "b"], {"n": ("n", "sum")})
        best = topk(summed, ["n", "a", "b"], k=1,
                    descending=[True, False, False])
        if best.empty or "n" not in best.columns:
            break
        lhs, rhs, n = (str(best["a"].iloc[0]), str(best["b"].iloc[0]),
                       int(best["n"].iloc[0]))
        if n < min_count:
            break
        merges.append((r, lhs, rhs, n))
        sym = sym.map_batches(
            lambda t, _l=lhs, _r=rhs: _apply_merge_block(t, _l, _r),
            batch_format="pyarrow").materialize()
    return _merges_frame(merges)


def bpe_pair_counts(ds: rd.Dataset, k: int = 50, text_col: str = "text",
                    mode: str = "auto") -> pd.DataFrame:
    """Top-k adjacent CHARACTER pair counts over the corpus (merge
    round 0 of BPE, weighted by word frequency) — the oracle-friendly
    single-step view. Output ``(a, b, n)``, count-descending, ties
    pair-ascending."""
    word_partials = ds.map_batches(
        lambda t: _token_counts_block(t, text_col),
        batch_format="pyarrow", batch_size=None)
    empty = pd.DataFrame({"a": pd.Series([], dtype="object"),
                          "b": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64")})
    if _resolve_mode(ds, mode) == "local":
        words = word_partials.to_pandas()
        if words.empty or "token" not in words.columns:
            return empty
        words = words.groupby("token", as_index=False)["n"].sum()
        pairs = _pair_counts_block(_encode_sym_block(
            pa.Table.from_pandas(words, preserve_index=False))).to_pandas()
        out = (pairs.sort_values(["n", "a", "b"],
                                 ascending=[False, True, True],
                                 kind="mergesort")
               .head(k).reset_index(drop=True))
    else:
        words = bucketed_agg(word_partials, "token", {"n": ("n", "sum")})
        partials = (words
                    .map_batches(_encode_sym_block, batch_format="pyarrow")
                    .map_batches(_pair_counts_block,
                                 batch_format="pyarrow"))
        summed = bucketed_agg(partials, ["a", "b"], {"n": ("n", "sum")})
        out = topk(summed, ["n", "a", "b"], k=k,
                   descending=[True, False, False])
    if out.empty or "n" not in out.columns:
        return empty
    out["n"] = out["n"].astype("int64")
    return out[["a", "b", "n"]].reset_index(drop=True)
