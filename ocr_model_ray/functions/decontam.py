"""Benchmark decontamination: flag corpus documents that share token
n-grams with a held-out evaluation set.

Engine extension (no reference counterpart): before training on a web
corpus you must remove documents that leak benchmark content — the
standard recipe (GPT-3 appendix C / PaLM) is exact n-gram collision
against the eval set's token n-grams.

Scale shape: the eval side is small by construction (benchmarks are
KB–MB where the corpus is TB), so its distinct n-gram set broadcasts
once (``ray.put``) and the corpus side streams through ONE
``map_batches`` pass — no shuffle, no join. Membership is tested on
the exact gram strings here; at 100 TB swap the set for
``functions.joins.BloomFilter`` (already in-repo) to bound the
broadcast at a fixed bit budget with a known false-positive rate.

Tokenization is whitespace ``\\S+`` runs, identical to
``text_stats.token_count_batch`` and the SQL oracles.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


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


def contamination(ds: rd.Dataset, eval_grams: set, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  ) -> rd.Dataset:
    """Per-document contamination flags against a broadcast eval-gram
    set: (id_col, n_contaminated [distinct colliding n-grams],
    contaminated). Streaming, shuffle-free."""
    ref = ray.put(eval_grams)

    def flag(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        df = batch.select([id_col, text_col]).to_pandas()
        hits = []
        for t in df[text_col]:
            if not isinstance(t, str):
                hits.append(0)
                continue
            toks = t.split()
            doc_grams = {" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)}
            hits.append(len(doc_grams & grams))
        return pa.table({
            id_col: pa.array(df[id_col].astype("int64")),
            "n_contaminated": pa.array(hits, pa.int64()),
            "contaminated": pa.array([h > 0 for h in hits], pa.bool_()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")
