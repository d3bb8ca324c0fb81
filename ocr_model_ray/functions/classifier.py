"""Corpus-trained token-vote text classifier — integer-exact Naive
Bayes' decision-rule cousin (the fastText / CCNet-style learned
quality-or-language filter, re-expressed in the repo's SQL-twin
doctrine: no logs, no float aggregation, one exact decision per
token).

Training (one combiner pass over the LABELED docs): per-token class
counts ``n_pos`` / ``n_neg``. Each token then casts one frozen vote

    vote = +1  iff (n_pos+1) * (tot_neg+V)  >  (n_neg+1) * (tot_pos+V)
           -1  iff                         <
            0  otherwise,

i.e. the sign of the add-one-smoothed class-conditional likelihood
ratio ``P(tok|pos) / P(tok|neg)`` decided by the integer
cross-multiply (``tot_*`` = total labeled class tokens, ``V`` =
trained vocabulary size — the same Laplace denominators multinomial
NB uses; the VOTE is NB's per-token evidence sign, so scoring by vote
majority is NB with per-token evidence clamped to ±1 — robust to the
outlier tokens that dominate a raw log-likelihood sum, and exactly
replayable in SQL).

Scoring (one pass over ALL docs): per doc, ``votes_pos`` /
``votes_neg`` = token multiplicities voting each way (tokens unseen
in training vote 0), ``pred = 1 iff votes_pos > votes_neg``.

Overflow: the cross-multiply needs ``(max_count+1) * (tot+V)`` <
2^63. The vote pass upcasts to Python ints when the bound fails
(possible only beyond ~3e9 labeled tokens x 3e9 counts — at that
scale the vote table is vocab-sized, so the object-int fallback is
bounded by vocabulary, not corpus); the SQL twin casts the products
to HUGEINT so DuckDB stays exact too.

Scale shape: training is the combiner + one ``bucketed_agg``
exchange (vocab-keyed). The vote table is vocab-sized: below
``vocab_broadcast_rows`` it broadcasts once via ``ray.put`` and
scoring is a single streaming pass (hash-indexed gather per batch);
above it, per-(doc, tok) multiplicities bucket-join the votes on the
token key and a doc-bucketed reduce finishes — bigram_fluency's
two-regime doctrine (corpus_stats.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .corpus_stats import VOCAB_BROADCAST_ROWS, WS_SPLIT

_OUT_COLS = ("doc_id", "votes_pos", "votes_neg", "n_tokens", "pred")


def _empty_out(doc_col: str) -> pd.DataFrame:
    return pd.DataFrame({
        doc_col: pd.Series([], dtype="int64"),
        "votes_pos": pd.Series([], dtype="int64"),
        "votes_neg": pd.Series([], dtype="int64"),
        "n_tokens": pd.Series([], dtype="int64"),
        "pred": pd.Series([], dtype="int64")})


def _tokens_of(t: pa.Table, text_col: str):
    """(flat token object array, doc index array) for one batch."""
    toks = pc.split_pattern_regex(t[text_col], WS_SPLIT)
    words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    docix = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = words != ""
    return words[keep], docix[keep]


def _score_batch(t: pa.Table, vtok: np.ndarray, varr: np.ndarray,
                 text_col: str, doc_col: str) -> pa.Table:
    """Per-doc vote sums for one batch against a (token, vote) table
    — the ONE scoring kernel both the local and broadcast regimes
    call (they differ only in where the table comes from)."""
    words, docix = _tokens_of(t, text_col)
    ids = t[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
    nd = len(t)
    if len(words) and len(varr):
        loc = pd.Index(vtok).get_indexer(pd.Index(words))
        tv = np.where(loc >= 0, varr[loc.clip(min=0)], 0)
    else:
        tv = np.zeros(len(words), np.int64)
    vp = np.bincount(docix, weights=tv == 1,
                     minlength=nd).astype(np.int64)
    vn = np.bincount(docix, weights=tv == -1,
                     minlength=nd).astype(np.int64)
    nt = np.bincount(docix, minlength=nd).astype(np.int64)
    has = nt > 0
    return pa.table({
        doc_col: pa.array(ids[has]),
        "votes_pos": pa.array(vp[has]),
        "votes_neg": pa.array(vn[has]),
        "n_tokens": pa.array(nt[has]),
        "pred": pa.array((vp[has] > vn[has]).astype(np.int64))})


def _votes_of(np_: np.ndarray, nn: np.ndarray, tp: int, tn: int,
              v: int) -> np.ndarray:
    """Frozen per-token vote; int64 fast path, object-int exact path
    when the cross-multiply could overflow."""
    a, b = tn + v, tp + v
    if (int(np_.max(initial=0)) + 1) * a < 2**63 \
            and (int(nn.max(initial=0)) + 1) * b < 2**63:
        lhs = (np_ + 1) * a
        rhs = (nn + 1) * b
    else:  # bounded by vocab, not corpus — exact Python ints
        lhs = np.array([(int(x) + 1) * a for x in np_], dtype=object)
        rhs = np.array([(int(x) + 1) * b for x in nn], dtype=object)
    return np.where(lhs > rhs, 1, np.where(lhs < rhs, -1, 0)) \
        .astype(np.int64)


def token_vote_classifier(ds: rd.Dataset, label_col: str = "label",
                          text_col: str = "text",
                          doc_col: str = "doc_id",
                          mode: str = "auto",
                          vocab_broadcast_rows: int =
                          VOCAB_BROADCAST_ROWS) -> pd.DataFrame:
    """Train on rows with ``label_col`` in {1, 0} (anything else is
    unlabeled, scored only); return (doc_id, votes_pos, votes_neg,
    n_tokens, pred) for every doc with >= 1 token — see module doc."""
    import ray

    from .bucketed import bucketed_agg
    from .dedup_algos import _resolve_mode
    from .joins import hash_bucket_join

    def count_partial(t: pa.Table) -> pa.Table:
        """labeled-token class-count combiner: (tok, np_, nn)"""
        lab = t[label_col].to_numpy(zero_copy_only=False)
        sel = (lab == 1) | (lab == 0)
        if not sel.any():
            return pa.table({"tok": pa.array([], pa.string()),
                             "np_": pa.array([], pa.int64()),
                             "nn": pa.array([], pa.int64())})
        sub = t.filter(pa.array(sel))
        words, docix = _tokens_of(sub, text_col)
        pos = (sub[label_col].to_numpy(zero_copy_only=False)
               == 1)[docix]
        df = pd.DataFrame({"tok": words, "p": pos.astype(np.int64)})
        g = df.groupby("tok", sort=False).agg(
            np_=("p", "sum"), n=("p", "size")).reset_index()
        return pa.table({
            "tok": pa.array(g["tok"].to_numpy(), pa.string()),
            "np_": pa.array(g["np_"].to_numpy(np.int64)),
            "nn": pa.array((g["n"] - g["np_"]).to_numpy(np.int64))})

    parts = ds.map_batches(count_partial, batch_format="pyarrow",
                           batch_size=None)
    local = _resolve_mode(ds, mode) == "local"

    if local:
        cnt = parts.to_pandas()
        if cnt.empty or "tok" not in cnt.columns:
            cnt = pd.DataFrame({"tok": pd.Series([], dtype="object"),
                                "np_": pd.Series([], dtype="int64"),
                                "nn": pd.Series([], dtype="int64")})
        counts = (cnt.groupby("tok", as_index=False)
                  [["np_", "nn"]].sum())
    else:
        folded = bucketed_agg(parts, "tok",
                              {"np_": ("np_", "sum"),
                               "nn": ("nn", "sum")})
        sch = folded.schema()
        if sch is None or "tok" not in sch.names:
            counts = pd.DataFrame(
                {"tok": pd.Series([], dtype="object"),
                 "np_": pd.Series([], dtype="int64"),
                 "nn": pd.Series([], dtype="int64")})
        else:
            # the vote table is vocab-sized; the broadcast regime
            # needs it on the driver anyway. Above the broadcast cut
            # the counts STAY a Dataset (see the join regime below) —
            # only the three scalars fold to the driver.
            counts = None
            counts_ds = folded

    if local or counts is not None:
        if counts is None:
            raise AssertionError("unreachable")
        tp = int(counts["np_"].sum())
        tn = int(counts["nn"].sum())
        v = len(counts)
        votes = _votes_of(counts["np_"].to_numpy(np.int64),
                          counts["nn"].to_numpy(np.int64), tp, tn, v)
        vtok = counts["tok"].to_numpy()

        def score(t: pa.Table) -> pa.Table:
            return _score_batch(t, vtok, votes, text_col, doc_col)

        out = ds.map_batches(score, batch_format="pyarrow",
                             batch_size=None).to_pandas()
        if out.empty or doc_col not in out.columns:
            return _empty_out(doc_col)
        return (out.sort_values(doc_col).reset_index(drop=True)
                [list(_OUT_COLS)])

    # ---------------- distributed vote regime --------------------
    # three driver scalars from one fold over the vocab-keyed counts
    def tot_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "tp": pa.array([int(pc.sum(t["np_"]).as_py() or 0)],
                           pa.int64()),
            "tn": pa.array([int(pc.sum(t["nn"]).as_py() or 0)],
                           pa.int64()),
            "v": pa.array([len(t)], pa.int64())})

    tots = counts_ds.map_batches(tot_partial,
                                 batch_format="pyarrow").to_pandas()
    tp, tn, v = (int(tots["tp"].sum()), int(tots["tn"].sum()),
                 int(tots["v"].sum()))

    def vote_batch(t: pa.Table) -> pa.Table:
        votes = _votes_of(t["np_"].to_numpy(zero_copy_only=False)
                          .astype(np.int64),
                          t["nn"].to_numpy(zero_copy_only=False)
                          .astype(np.int64), tp, tn, v)
        return pa.table({"tok": t["tok"], "vote": pa.array(votes)})

    votes_ds = counts_ds.map_batches(vote_batch,
                                     batch_format="pyarrow")
    if v <= vocab_broadcast_rows:
        vf = votes_ds.to_pandas()
        if vf.empty or "tok" not in vf.columns:
            vf = pd.DataFrame({"tok": pd.Series([], dtype="object"),
                               "vote": pd.Series([], dtype="int64")})
        vote_ref = ray.put((vf["tok"].to_numpy(),
                            vf["vote"].to_numpy(np.int64)))

        def score_bcast(t: pa.Table) -> pa.Table:
            vtok, varr = ray.get(vote_ref)
            return _score_batch(t, vtok, varr, text_col, doc_col)

        out = ds.map_batches(score_bcast, batch_format="pyarrow",
                             batch_size=None).to_pandas()
        if out.empty or doc_col not in out.columns:
            return _empty_out(doc_col)
        return (out.sort_values(doc_col).reset_index(drop=True)
                [list(_OUT_COLS)])

    # join regime: per-(doc, tok) multiplicities bucket-join the
    # votes on tok; unified partial rows then doc-bucket reduce.
    # Tokens unseen in training never match the join — their vote-0
    # contribution arrives through the per-doc (0, 0, n_tokens) rows
    # emitted by the same scan, so the reduce stays a plain sum.
    def doc_tok(t: pa.Table) -> pa.Table:
        words, docix = _tokens_of(t, text_col)
        ids = t[doc_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if not len(words):
            return pa.table({doc_col: pa.array([], pa.int64()),
                             "tok": pa.array([], pa.string()),
                             "m": pa.array([], pa.int64())})
        df = (pd.DataFrame({doc_col: ids[docix], "tok": words})
              .groupby([doc_col, "tok"], as_index=False).size()
              .rename(columns={"size": "m"}))
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    dt = ds.map_batches(doc_tok, batch_format="pyarrow",
                        batch_size=None)
    joined = hash_bucket_join(dt, votes_ds, on="tok")

    def vote_partial(t: pa.Table) -> pa.Table:
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        vt = t["vote"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            doc_col: t[doc_col],
            "vp": pa.array(np.where(vt == 1, m, 0)),
            "vn": pa.array(np.where(vt == -1, m, 0)),
            "nt": pa.array(np.zeros(len(t), np.int64))})

    def count_rows(t: pa.Table) -> pa.Table:
        words, docix = _tokens_of(t, text_col)
        ids = t[doc_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nt = np.bincount(docix, minlength=len(t)).astype(np.int64)
        has = nt > 0
        z = np.zeros(int(has.sum()), np.int64)
        return pa.table({doc_col: pa.array(ids[has]),
                         "vp": pa.array(z), "vn": pa.array(z),
                         "nt": pa.array(nt[has])})

    unified = joined.map_batches(vote_partial, batch_format="pyarrow") \
        .union(ds.map_batches(count_rows, batch_format="pyarrow",
                              batch_size=None))
    red = bucketed_agg(unified, doc_col, {"votes_pos": ("vp", "sum"),
                                          "votes_neg": ("vn", "sum"),
                                          "n_tokens": ("nt", "sum")})
    out = red.to_pandas()
    if out.empty or doc_col not in out.columns:
        return _empty_out(doc_col)
    out["pred"] = (out["votes_pos"] > out["votes_neg"]) \
        .astype(np.int64)
    for c in ("votes_pos", "votes_neg", "n_tokens"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(doc_col).reset_index(drop=True)
            [list(_OUT_COLS)])
