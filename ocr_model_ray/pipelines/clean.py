"""C4/CCNet-style corpus cleaning composite: the end-to-end pipeline a
training-data user actually runs, chained from this engine's streaming
operators —

    quality filter -> language filter -> benchmark decontamination
    -> exact dedup -> kept-document ids

Every stage is a streaming Dataset transform; the only exchange in the
whole composite is exact dedup's one bucketed shuffle, whose OUTPUT
(min doc_id per content hash) IS the kept-id stream — no final
semi-join ships ids back. Decontamination reuses the broadcast-gram
plan (``functions/decontam.py``); at TB eval sets swap the bloom
variant in the same seam.

``clean_funnel`` reports per-stage attrition as one row. Each count is
a streaming aggregate over the stage's lineage; on a single pass this
re-executes the upstream filters per stage (cheap vectorized scans) —
at 100 TB you'd checkpoint the filtered projection once
(``pipelines/checkpoint.py``) and count the parquet row-groups
instead, per the lineage-manifest design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

DEFAULT_LANGS = ("en", "de", "es", "fr")


def _quality_mask(df: pd.DataFrame, min_words: int,
                  min_awl: float, max_awl: float) -> np.ndarray:
    """Reuses text_stats.quality_batch's oracle-pinned metric kernels
    (words are ``\\S+`` runs, avg word length is token chars per
    word), so the filter thresholds compare the exact same float64s
    the docs_quality oracle produces."""
    from ocr_model_ray.functions.text_stats import quality_batch
    m = quality_batch(df)
    n_words = m["n_words"].to_numpy()
    awl = m["avg_word_len"].to_numpy()
    return (n_words >= min_words) & (awl >= min_awl) & (awl <= max_awl)


def quality_lang_filter(ds: rd.Dataset, min_words: int = 20,
                        min_awl: float = 3.0, max_awl: float = 5.0,
                        langs=DEFAULT_LANGS) -> rd.Dataset:
    """Stage 1+2: vectorized per-batch predicate, no exchange."""
    lang_set = set(langs)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        keep = _quality_mask(df, min_words, min_awl, max_awl)
        keep &= df["lang"].isin(lang_set).to_numpy()
        return df.loc[keep, ["doc_id", "text"]]

    return ds.map_batches(f, batch_format="pandas")


def decontam_drop(ds: rd.Dataset, eval_grams: set,
                  n: int = 8) -> rd.Dataset:
    """Stage 3: drop documents sharing any token n-gram with the eval
    set — the filtering twin of ``decontam.contamination`` (same gram
    definition, same broadcast plan), keeping the text column for the
    dedup stage downstream."""
    from ocr_model_ray.functions.decontam import _doc_grams
    ref = ray.put(eval_grams)

    def f(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        df = batch.select(["doc_id", "text"]).to_pandas()
        keep = np.fromiter(
            (not (_doc_grams(t, n) & grams) for t in df["text"]),
            dtype=bool, count=len(df))
        return pa.Table.from_pandas(df.loc[keep],
                                    preserve_index=False)

    return ds.map_batches(f, batch_format="pyarrow")


def clean_corpus(ds: rd.Dataset, eval_grams: set,
                 min_words: int = 20, min_awl: float = 3.0,
                 max_awl: float = 5.0, langs=DEFAULT_LANGS,
                 n: int = 8) -> rd.Dataset:
    """Kept doc_ids after the full funnel. Exact dedup's shuffle
    output (min doc_id per md5) is the result — one exchange total."""
    filtered = quality_lang_filter(ds, min_words, min_awl, max_awl,
                                   langs)
    screened = decontam_drop(filtered, eval_grams, n=n)
    return _kept_ids(screened)


def _kept_ids(screened: rd.Dataset) -> rd.Dataset:
    from ocr_model_ray.functions.dedup_algos import exact_dedup
    kept = exact_dedup(screened)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "keep_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.table({"doc_id": t["keep_id"]})

    return kept.map_batches(project, batch_format="pyarrow")


def clean_funnel(ds: rd.Dataset, eval_grams: set,
                 min_words: int = 20, min_awl: float = 3.0,
                 max_awl: float = 5.0, langs=DEFAULT_LANGS,
                 n: int = 8) -> pd.DataFrame:
    """One-row attrition report: input -> quality+lang -> decontam ->
    dedup counts (each a streaming count aggregate)."""
    filtered = quality_lang_filter(ds, min_words, min_awl, max_awl,
                                   langs)
    # materialize the screened projection (doc_id+text post-filter)
    # ONCE: the decontam stage is the funnel's most expensive scan, and
    # both the n_screened count and the dedup consume its output —
    # without this, each consumer re-executes quality+decontam.
    screened = decontam_drop(filtered, eval_grams, n=n).materialize()
    kept = _kept_ids(screened)
    return pd.DataFrame({
        "n_input": pd.Series([ds.count()], dtype="int64"),
        "n_filtered": pd.Series([filtered.count()], dtype="int64"),
        "n_screened": pd.Series([screened.count()], dtype="int64"),
        "n_kept": pd.Series([kept.count()], dtype="int64"),
    })
