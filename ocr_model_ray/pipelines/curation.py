"""End-to-end corpus-curation funnel: the composed LLM-data pipeline
(language gate -> Gopher quality gate -> exact dedup -> benchmark
decontamination) as ONE plan, reporting per-stage survivor counts.

Engine extension (no reference counterpart): real curation runs — C4,
Gopher, FineWeb — chain exactly these stages, and what their authors
publish first is the FUNNEL (documents/tokens surviving each stage).
Relationship to ``pipelines/clean.py``: ``clean_funnel`` is the
lineage-per-stage composite (each stage count re-executes its
upstream, the checkpoint-friendly shape); THIS module is the fused
single-pass alternative (counters ride the survivor stream, the
Gopher rule set, decontamination reduced over dedup groups) — the
shape you run when the corpus scan itself is the dominant cost.
This module demonstrates that the engine's individual operators
(`text_stats.gopher_flags_batch`, `dedup_algos.exact_dedup`'s bucketed
exchange, `decontam`'s broadcast gram set) compose into a single
scale-shaped job rather than N separate corpus scans:

* ONE streaming pass over the corpus computes every per-document
  verdict (lang mask, the five Gopher rules, the contamination flag
  against the broadcast eval-gram set) and emits a NARROW unified
  frame — per-block funnel counters ride along as sentinel rows
  (``h = '__c_<stage>'``), so no second corpus read and no separate
  counter job;
* the only exchange moves survivors' (md5, doc_id, chars,
  contaminated) — ~60 B/doc, never text — into ``num_buckets`` coarse
  buckets (the `exact_dedup` doctrine: Python cost per BUCKET, one
  vectorized groupby per bucket, hot keys collapse inside their
  bucket);
* duplicates of one text share the md5 AND the contamination verdict
  (it is a function of the text), so the decontamination stage of the
  funnel needs no join back to text: it reduces over the dedup groups.

Every funnel number is an int64 count/sum — bit-exact against the SQL
oracle by construction, no float summation order anywhere.

Stage semantics (order matters and is part of the contract):
  input        corpus rows (eval split already excluded by the caller)
  lang         lang in ``langs``
  quality      lang AND all five Gopher rules pass
               (text_stats.gopher_flags_batch, Rae et al. 2021 A1.1)
  exact_dedup  distinct md5(text) among quality survivors
  decontam     dedup groups whose text shares no token ``n``-gram with
               the eval set (decontam semantics, GPT-3 appendix C)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.dedup_algos import _resolve_mode
from ..functions.decontam import _doc_grams
from ..functions.text_stats import gopher_flags_batch, md5_hex

#: funnel stages in pipeline order
STAGES = ("input", "lang", "quality", "exact_dedup", "decontam")
#: default language gate (the corpus's non-target tail is dropped)
DEFAULT_LANGS = ("en", "de", "fr", "es")

_C = "__c_"  # sentinel prefix for counter rows (md5 hex is 32 chars)


def _pass_fn(gram_ref, lang_set: frozenset, n: int, num_buckets: int):
    """The fused per-batch corpus pass: all per-doc verdicts, survivor
    rows + per-block counter rows in one narrow unified schema."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        chars = text.str.len().astype("int64").to_numpy()
        lang_mask = df["lang"].isin(lang_set).to_numpy()
        keep = gopher_flags_batch(df)["keep"].to_numpy()
        q_mask = lang_mask & keep

        sub = df.loc[q_mask]
        sub_chars = chars[q_mask]
        grams = ray.get(gram_ref)
        cont = np.fromiter(
            (bool(_doc_grams(t, n) & grams) for t in sub["text"]),
            dtype=bool, count=len(sub))
        h = md5_hex(sub["text"]).to_numpy()  # no nulls survive n_words>=50
        b = np.fromiter((int(x[:8], 16) % num_buckets for x in h),
                        count=len(h), dtype=np.int32)

        counters = pd.DataFrame({
            "h": [_C + "input", _C + "lang", _C + "quality"],
            "doc_id": np.array([len(df), int(lang_mask.sum()),
                                int(q_mask.sum())], dtype=np.int64),
            "chars": np.array([int(chars.sum()),
                               int(chars[lang_mask].sum()),
                               int(sub_chars.sum())], dtype=np.int64),
            "contaminated": np.zeros(3, dtype=bool),
            "__b": np.zeros(3, dtype=np.int32),
        })
        rows = pd.DataFrame({
            "h": h,
            "doc_id": sub["doc_id"].astype("int64").to_numpy(),
            "chars": sub_chars,
            "contaminated": cont,
            "__b": b,
        })
        return pd.concat([rows, counters], ignore_index=True)

    return run


def _reduce_groups(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket dedup reduce: one row per distinct md5. chars and
    contaminated are constant within a group (same text)."""
    return g.groupby("h", as_index=False).agg(
        keep_id=("doc_id", "min"), chars=("chars", "max"),
        contaminated=("contaminated", "max"))


def _funnel_frame(c: dict, dedup_docs: int, dedup_chars: int,
                  decon_docs: int, decon_chars: int) -> pd.DataFrame:
    docs = [c.get("input", (0, 0))[0], c.get("lang", (0, 0))[0],
            c.get("quality", (0, 0))[0], dedup_docs, decon_docs]
    chars = [c.get("input", (0, 0))[1], c.get("lang", (0, 0))[1],
             c.get("quality", (0, 0))[1], dedup_chars, decon_chars]
    return pd.DataFrame({"stage": list(STAGES),
                         "docs": pd.array(docs, dtype="int64"),
                         "chars": pd.array(chars, dtype="int64")})


def _split(frame: pd.DataFrame) -> tuple[dict, pd.DataFrame]:
    """Split the unified frame into (stage -> (docs, chars)) counters
    and the survivor rows."""
    if frame.empty or "h" not in frame.columns:
        return {}, pd.DataFrame(
            {"h": pd.Series([], dtype="object"),
             "doc_id": pd.Series([], dtype="int64"),
             "chars": pd.Series([], dtype="int64"),
             "contaminated": pd.Series([], dtype="bool")})
    is_c = frame["h"].str.startswith(_C)
    cf = frame.loc[is_c].groupby("h", as_index=False)[
        ["doc_id", "chars"]].sum()
    counters = {r["h"][len(_C):]: (int(r["doc_id"]), int(r["chars"]))
                for _, r in cf.iterrows()}
    return counters, frame.loc[~is_c]


def curation_groups(corpus: rd.Dataset, eval_grams: set,
                    langs=DEFAULT_LANGS, n: int = 8,
                    num_buckets: int = 64,
                    mode: str = "auto") -> tuple[rd.Dataset, pd.DataFrame]:
    """Run the funnel. Returns (groups, funnel): ``groups`` is the
    dedup-group Dataset (h, keep_id, chars, contaminated) — the
    curated corpus is its ``NOT contaminated`` keep_ids — and
    ``funnel`` the 5-row per-stage (stage, docs, chars) frame."""
    gram_ref = ray.put(eval_grams)
    narrow = corpus.map_batches(
        _pass_fn(gram_ref, frozenset(langs), n, num_buckets),
        batch_format="pandas")

    if _resolve_mode(corpus, mode) == "local":
        counters, rows = _split(narrow.to_pandas())
        groups = _reduce_groups(rows)
        clean = groups.loc[~groups["contaminated"].astype(bool)]
        funnel = _funnel_frame(
            counters, len(groups), int(groups["chars"].sum()),
            len(clean), int(clean["chars"].sum()))
        gds = rd.from_pandas(groups[["h", "keep_id", "chars",
                                     "contaminated"]])
        return gds, funnel

    mat = narrow.materialize()

    def only_counters(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["h"].str.startswith(_C),
                      ["h", "doc_id", "chars"]]

    cf = mat.map_batches(only_counters, batch_format="pandas").to_pandas()
    if cf.empty or "h" not in cf.columns:
        counters: dict = {}
    else:
        cf = cf.groupby("h", as_index=False)[["doc_id", "chars"]].sum()
        counters = {r["h"][len(_C):]: (int(r["doc_id"]), int(r["chars"]))
                    for _, r in cf.iterrows()}

    def only_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[~df["h"].str.startswith(_C)]

    groups_ds = (mat.map_batches(only_rows, batch_format="pandas")
                 .groupby("__b")
                 .map_groups(_reduce_groups, batch_format="pandas"))
    gmat = groups_ds.materialize()

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        clean = df.loc[~df["contaminated"].astype(bool)]
        return pd.DataFrame({
            "dd": pd.array([len(df)], dtype="int64"),
            "dc": pd.array([int(df["chars"].sum())], dtype="int64"),
            "kd": pd.array([len(clean)], dtype="int64"),
            "kc": pd.array([int(clean["chars"].sum())], dtype="int64")})

    p = gmat.map_batches(partials, batch_format="pandas").to_pandas()
    dd, dc, kd, kc = (int(p[c].sum()) if len(p) and c in p.columns else 0
                      for c in ("dd", "dc", "kd", "kc"))
    return gmat, _funnel_frame(counters, dd, dc, kd, kc)


def curation_funnel(corpus: rd.Dataset, eval_grams: set,
                    langs=DEFAULT_LANGS, n: int = 8,
                    num_buckets: int = 64,
                    mode: str = "auto") -> pd.DataFrame:
    """Per-stage funnel frame only (see curation_groups)."""
    return curation_groups(corpus, eval_grams, langs, n,
                           num_buckets, mode)[1]


def curation_kept(corpus: rd.Dataset, eval_grams: set,
                  langs=DEFAULT_LANGS, n: int = 8,
                  num_buckets: int = 64, mode: str = "auto") -> rd.Dataset:
    """The curated corpus: doc_ids that survive every stage (one
    representative per distinct text, uncontaminated)."""
    groups, _ = curation_groups(corpus, eval_grams, langs, n,
                                num_buckets, mode)

    def keepers(df: pd.DataFrame) -> pd.DataFrame:
        sel = df.loc[~df["contaminated"].astype(bool)]
        return pd.DataFrame({
            "doc_id": sel["keep_id"].astype("int64"),
            "chars": sel["chars"].astype("int64")})

    return groups.map_batches(keepers, batch_format="pandas")
