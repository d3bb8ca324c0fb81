"""Sliding-window token chunking — the RAG / fixed-context trainer
splitter.

Every document's whitespace token stream (empty tokens dropped — the
corpus-wide tokenizer contract shared with top_tokens / bm25 / the
jaccard grams) is cut into windows of ``chunk_size`` tokens advancing
by ``stride`` tokens (``stride < chunk_size`` overlaps neighbouring
chunks, the usual retrieval-context setting; ``stride ==
chunk_size`` tiles exactly; ``stride > chunk_size`` would leave
coverage gaps AND make the window count formula emit degenerate
empty windows, so it is rejected). Chunk ``k`` of a doc with ``n``
tokens
covers tokens ``[k*stride, min(k*stride + chunk_size, n))`` and the
doc yields

    n_chunks = 1 + max(0, n - chunk_size + stride - 1) // stride

chunks (integer arithmetic, so the SQL twin replays it exactly); a
zero-token doc yields none. Unlike ``packing.sequence_pack`` (which
concatenates MANY docs into fixed budget sequences) this splits ONE
doc into windows — the complementary half of training-data layout.

Shape: a pure per-batch ``map_batches`` — no exchange, no state, the
embarrassingly-parallel streaming ideal; at 10^12 docs the only cost
is the token scan itself. The per-batch kernel is fully vectorized:
one Arrow regex split, then numpy offset arithmetic builds EVERY
chunk's token-index gather in one ``take`` and one
``binary_join_element_wise``-free Arrow list join (no Python loop
over docs or chunks).

Output: (id_col, chunk_id:int64, n_tokens:int64, char_start:int64,
char_end:int64, chunk_text:string) — ``char_start``/``char_end`` are
the chunk's offsets inside the NORMALIZED token stream (tokens joined
by single spaces — the reference's span doctrine: every region/row
carries char offsets into the assembled text, spec.py M12/M13), so
``normalized[char_start:char_end] == chunk_text`` always holds and a
RAG store can slice instead of copying.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .corpus_stats import WS_SPLIT


def chunk_windows_batch(t: pa.Table, chunk_size: int, stride: int,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """One batch -> its chunk rows (vectorized; see module doc)."""
    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "chunk_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "char_start": pa.array([], pa.int64()),
        "char_end": pa.array([], pa.int64()),
        "chunk_text": pa.array([], pa.string())})
    if len(t) == 0:
        return empty
    toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
    flat = pc.list_flatten(toks).combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # drop empty tokens but keep doc boundaries exact
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    docix = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    flat = flat.filter(pa.array(keep))
    docix = docix[keep]
    n = np.bincount(docix, minlength=len(lens)).astype(np.int64)
    doc_start = np.concatenate(([0], np.cumsum(n)[:-1]))

    n_chunks = np.where(
        n > 0,
        1 + np.maximum(0, n - chunk_size + stride - 1) // stride,
        0).astype(np.int64)
    total = int(n_chunks.sum())
    if total == 0:
        return empty
    cdoc = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    coff = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    k = np.arange(total, dtype=np.int64) - np.repeat(coff, n_chunks)
    starts = doc_start[cdoc] + k * stride
    ends = np.minimum(starts + chunk_size, doc_start[cdoc] + n[cdoc])
    clen = ends - starts
    # gather every chunk's token indices in one flat arange trick
    goff = np.concatenate(([0], np.cumsum(clen)))
    idx = (np.repeat(starts, clen)
           + np.arange(int(goff[-1]), dtype=np.int64)
           - np.repeat(goff[:-1], clen))
    gathered = flat.take(pa.array(idx))
    # a single batch never holds 2^31 gathered tokens; large_list
    # guards the pathological giant-blob batch anyway
    if goff[-1] < 2**31:
        lists = pa.ListArray.from_arrays(
            pa.array(goff, pa.int32()), gathered)
    else:
        lists = pa.LargeListArray.from_arrays(
            pa.array(goff, pa.int64()), gathered)
    text = pc.binary_join(lists, " ")
    # char offsets in the normalized (single-space-joined) stream:
    # prefix[t] = chars before token t = sum(len) + one space each;
    # token char lengths must be CODEPOINT counts (utf8_length), the
    # same unit the SQL twin's length() uses
    tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(tlen + 1)))  # +1 per space
    doc_base = cum[doc_start]
    char_start = cum[starts] - doc_base[cdoc]
    # cum[e] includes a trailing space after token e-1: subtract it
    char_end = (cum[ends] - 1) - doc_base[cdoc]
    return pa.table({
        id_col: pa.array(ids[cdoc]),
        "chunk_id": pa.array(k),
        "n_tokens": pa.array(clen),
        "char_start": pa.array(char_start),
        "char_end": pa.array(char_end),
        "chunk_text": text})


def chunk_windows(ds: rd.Dataset, chunk_size: int = 64,
                  stride: int = 48, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Dataset of (id, chunk_id, n_tokens, chunk_text) sliding
    windows; pure streaming map — see the module docstring."""
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    if stride > chunk_size:
        raise ValueError("stride > chunk_size leaves coverage gaps "
                         "and degenerate windows; use stride <= "
                         "chunk_size")

    def fn(t: pa.Table) -> pa.Table:
        return chunk_windows_batch(t, chunk_size, stride,
                                   id_col=id_col, text_col=text_col)

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------- CDC

#: content-defined chunking parameters: gram size shared with the
#: winnow sketch (the same Karp-Rabin hash family, so the SQL twin
#:  reuses the identical literal expression), boundary divisor =
#: expected chunk length in characters
CDC_K = 5
CDC_DIVISOR = 64


def cdc_chunks(ds: rd.Dataset, divisor: int = CDC_DIVISOR,
               k: int = CDC_K, id_col: str = "doc_id",
               text_col: str = "text") -> rd.Dataset:
    """Content-defined chunking — split every document at positions
    where the rolling k-gram Karp-Rabin hash satisfies
    ``h % divisor == 0`` (expected chunk length ~``divisor`` chars).
    Unlike fixed windows, the cut points depend only on LOCAL content:
    inserting a character early in a document shifts later chunks'
    offsets but leaves their TEXT identical (the storage-dedup /
    delta-sync property, pinned by test), so md5(chunk_text) dedup
    survives edits that would shift every fixed window.

    Output: (id_col, chunk_id:int64, char_start:int64 [1-based,
    SQL substr convention], n_chars:int64, chunk_text). Docs shorter
    than ``k`` chars form one whole-doc chunk. One streaming
    map_batches, no shuffle; per-doc work is the winnow gram-hash
    kernel plus one boundary scan."""
    from .winnow import KR_MOD, _kr_constants
    if divisor < 1:
        raise ValueError("divisor must be >= 1")
    consts = _kr_constants(k)

    def batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_id, out_cid, out_start, out_len, out_txt = \
            [], [], [], [], []
        for ix, txt in enumerate(texts):
            if not txt:
                continue
            cp = np.frombuffer(txt.encode("utf-32-le"),
                               dtype=np.uint32).astype(np.int64)
            n = len(cp) - k + 1
            if n >= 1:
                h = np.zeros(n, dtype=np.int64)
                for j in range(k):
                    h += cp[j:j + n] * consts[j]
                h %= KR_MOD
                # boundary at gram START position i (0-based), i > 0
                # (a cut at 0 would make an empty first chunk)
                b = np.flatnonzero(h % divisor == 0)
                b = b[b > 0]
            else:
                b = np.empty(0, np.int64)
            cuts = np.concatenate(([0], b, [len(cp)]))
            for ci in range(len(cuts) - 1):
                s, e = int(cuts[ci]), int(cuts[ci + 1])
                if e <= s:
                    continue
                out_id.append(ids[ix])
                out_cid.append(ci)
                out_start.append(s + 1)
                out_len.append(e - s)
                out_txt.append(txt[s:e])
        return pa.table({
            id_col: pa.array(np.asarray(out_id, np.int64)),
            "chunk_id": pa.array(np.asarray(out_cid, np.int64)),
            "char_start": pa.array(np.asarray(out_start, np.int64)),
            "n_chars": pa.array(np.asarray(out_len, np.int64)),
            "chunk_text": pa.array(out_txt, pa.string())})

    return ds.map_batches(batch, batch_format="pyarrow",
                          batch_size=None)


def cdc_dup_share(ds: rd.Dataset, divisor: int = CDC_DIVISOR,
                  k: int = CDC_K, id_col: str = "doc_id",
                  text_col: str = "text",
                  num_buckets: int = 32) -> rd.Dataset:
    """Per-document duplicated-content share via CDC chunks: a chunk
    is DUP iff its exact text appears in >= 2 distinct documents
    (cross-document boilerplate / syndication / mirror content —
    insertion-resilient where fixed windows are not). Output per doc:
    (id_col, n_chunks, n_chars, dup_chunks, dup_chars,
    dup_share = dup_chars / (n_chars * 1.0) — the one float division,
    oracle-exact).

    Plan: one streaming CDC pass emits (md5(chunk), doc, chars) rows
    — chunk hashes, never chunk texts, enter the exchange; a
    hash-bucketed pass marks each row against its hash's distinct-doc
    count (every row of a hash lands in one bucket, so the count is
    exact); one doc-bucketed sum finishes. md5 matches the SQL twin's
    ``md5(chunk_text)`` so collisions (2^-64) are shared semantics."""
    from .bucketed import bucketed_agg
    from .text_stats import md5_hex

    chunks = cdc_chunks(ds, divisor=divisor, k=k, id_col=id_col,
                        text_col=text_col)

    def project(t: pa.Table) -> pa.Table:
        h = md5_hex(pd.Series(t["chunk_text"].to_pandas()))
        return pa.table({
            "h": pa.array(h.to_numpy(), pa.string()),
            id_col: t[id_col],
            "chars": t["n_chars"]})

    rows = chunks.map_batches(project, batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        hs = pd.util.hash_array(
            t["h"].to_numpy(zero_copy_only=False).astype(object),
            categorize=False).astype(np.uint64)
        b = ((hs * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) \
            % np.uint64(num_buckets)
        return t.replace_schema_metadata(None).append_column(
            "__b", pa.array(b.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")[id_col].transform("nunique")
        dup = (nd >= 2).to_numpy()
        chars = g["chars"].to_numpy(np.int64)
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            "n_chunks": np.ones(len(g), np.int64),
            "n_chars": chars,
            "dup_chunks": dup.astype(np.int64),
            "dup_chars": np.where(dup, chars, 0)})
        return (out.groupby(id_col, as_index=False).sum())

    marked = (rows.map_batches(tag, batch_format="pyarrow")
              .groupby("__b").map_groups(per_bucket,
                                         batch_format="pandas"))
    red = bucketed_agg(marked, id_col,
                       {"n_chunks": ("n_chunks", "sum"),
                        "n_chars": ("n_chars", "sum"),
                        "dup_chunks": ("dup_chunks", "sum"),
                        "dup_chars": ("dup_chars", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        dc = t["dup_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column(
            "dup_share", pa.array(dc / (nc * 1.0)))

    return red.map_batches(finish, batch_format="pyarrow")


def _cdc_hash_rows(txt: str, divisor: int, k: int,
                   consts: np.ndarray, kr_mod: int):
    """DISTINCT (md5(chunk), chars) pairs for one document's CDC
    chunks — the scan kernel shared by the delta operator."""
    import hashlib
    cp = np.frombuffer(txt.encode("utf-32-le"),
                       dtype=np.uint32).astype(np.int64)
    n = len(cp) - k + 1
    if n >= 1:
        h = np.zeros(n, dtype=np.int64)
        for j in range(k):
            h += cp[j:j + n] * consts[j]
        h %= kr_mod
        b = np.flatnonzero(h % divisor == 0)
        b = b[b > 0]
    else:
        b = np.empty(0, np.int64)
    cuts = np.concatenate(([0], b, [len(cp)]))
    seen = {}
    for ci in range(len(cuts) - 1):
        s, e = int(cuts[ci]), int(cuts[ci + 1])
        if e <= s:
            continue
        hh = hashlib.md5(txt[s:e].encode()).hexdigest()
        seen.setdefault(hh, e - s)
    return seen


def cdc_snapshot_delta(pages: rd.Dataset, url_col: str = "url",
                       snap_col: str = "snap",
                       text_col: str = "text",
                       divisor: int = CDC_DIVISOR, k: int = CDC_K,
                       num_buckets: int = 32) -> rd.Dataset:
    """Chunk-level snapshot delta — the incremental-crawl use of CDC:
    for every url captured in snapshots 1 and 2, how much of snapshot
    2's content already existed in snapshot 1? CDC boundaries are
    content-local, so an insertion invalidates only the edited
    chunk(s); a fixed-window differ would mark everything after the
    edit as changed.

    Semantics (set-of-hashes — the rsync/dedup-store accounting): per
    url, the DISTINCT chunk hashes of snap 2; ``kept`` = those also
    present among snap 1's distinct hashes; ``kept_share =
    kept_chars / (n_chars * 1.0)`` over the distinct set. Urls with
    no snap-2 chunks are absent; a url whose snapshot 1 contributed
    NO chunks (not crawled, or empty text) appears with kept = 0 —
    the SQL twin's ``s2 LEFT JOIN s1`` semantics (round-4 advice: the
    two cases are indistinguishable at the chunk-row level, so the
    left join is the one semantics both engines can share).

    Output: (url, n_chunks [distinct, snap 2], n_chars, kept_chunks,
    kept_chars, kept_share). Plan: one streaming pass emits DISTINCT
    (url, snap, hash, chars) rows — chunk texts never move — then ONE
    url-bucketed exchange groups both snapshots of each url and the
    intersection is a vectorized pandas merge."""
    from .window import hash_partitioned_window
    from .winnow import KR_MOD, _kr_constants
    consts = _kr_constants(k)

    def scan(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        snaps = t[snap_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = t[text_col].to_pylist()
        u_out, s_out, h_out, c_out = [], [], [], []
        for u, sn, txt in zip(urls, snaps, texts):
            if not txt:
                continue
            for hh, chars in _cdc_hash_rows(txt, divisor, k,
                                            consts, KR_MOD).items():
                u_out.append(u)
                s_out.append(int(sn))
                h_out.append(hh)
                c_out.append(chars)
        return pa.table({
            url_col: pa.array(u_out, pa.string()),
            "snap": pa.array(np.asarray(s_out, np.int64)),
            "h": pa.array(h_out, pa.string()),
            "chars": pa.array(np.asarray(c_out, np.int64))})

    rows = pages.map_batches(scan, batch_format="pyarrow",
                             batch_size=None)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        ub = pd.util.hash_array(
            df[url_col].to_numpy(dtype=object),
            categorize=False).view(np.int64)
        out = df.copy()
        out["__u"] = ub
        return out

    def kern(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        """vectorized: ONE merge marks kept chunks, ONE groupby sums
        per url — no Python loop over urls (a bucket holds many)."""
        empty = pd.DataFrame({
            url_col: pd.Series([], dtype="object"),
            "n_chunks": pd.Series([], dtype="int64"),
            "n_chars": pd.Series([], dtype="int64"),
            "kept_chunks": pd.Series([], dtype="int64"),
            "kept_chars": pd.Series([], dtype="int64"),
            "kept_share": pd.Series([], dtype="float64")})
        s2 = g[g["snap"] == 2]
        s1 = g.loc[g["snap"] == 1, [url_col, "h"]].drop_duplicates()
        if s2.empty:
            return empty
        # LEFT semantics: every url with snap-2 chunks reports, with
        # kept = 0 when snap 1 contributed no chunks (the SQL twin)
        m = s2.merge(s1.assign(__k=1), on=[url_col, "h"],
                     how="left")
        kept = m["__k"].notna().to_numpy()
        chars = m["chars"].to_numpy(np.int64)
        out = (pd.DataFrame({
            url_col: m[url_col].to_numpy(),
            "n_chunks": np.ones(len(m), np.int64),
            "n_chars": chars,
            "kept_chunks": kept.astype(np.int64),
            "kept_chars": np.where(kept, chars, 0)})
            .groupby(url_col, as_index=False).sum())
        out["kept_share"] = (out["kept_chars"]
                             / (out["n_chars"] * 1.0))
        return out

    return hash_partitioned_window(
        rows.map_batches(project, batch_format="pandas"),
        "__u", [url_col, "snap", "h"], kern,
        num_buckets=num_buckets)
