"""C4-style cleaning composite (pipelines/clean.py): every funnel
stage fires on a crafted corpus; kept ids and attrition counts."""

import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.decontam import ngram_set
from ocr_model_ray.pipelines.clean import clean_corpus, clean_funnel

GOOD = ("the quick brown fox jumps over the lazy dog near the river "
        "bank while seven other animals watch from the tall green "
        "grass under a bright afternoon sky")          # 30 words, awl ok
EVAL = ("held out benchmark question about the capital of france and "
        "its famous tower landmark")


def _corpus():
    leak = GOOD + " held out benchmark question about the capital of france today"
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            GOOD,                      # kept
            GOOD,                      # exact dup of 1 -> dropped
            "too short",               # quality reject (n_words < 20)
            GOOD + " extra tail",      # kept (distinct hash)
            leak,                      # contaminated (8-gram overlap)
            GOOD + " zh variant",      # lang reject
        ],
        "lang": ["en", "en", "en", "de", "es", "zh"],
    })


@pytest.mark.usefixtures("ray_session")
def test_every_stage_fires():
    grams = ngram_set([EVAL], n=8)
    ds = rd.from_pandas(_corpus())
    funnel = clean_funnel(ds, grams)
    assert funnel.iloc[0].to_dict() == {
        "n_input": 6,      # all docs
        "n_filtered": 4,   # -quality(3), -lang(6)
        "n_screened": 3,   # -contaminated(5)
        "n_kept": 2,       # -exact dup(2)
    }
    kept = sorted(clean_corpus(ds, grams).to_pandas()["doc_id"])
    assert kept == [1, 4]


@pytest.mark.usefixtures("ray_session")
def test_empty_corpus():
    docs = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                         "text": pd.Series([], dtype="object"),
                         "lang": pd.Series([], dtype="object")})
    out = clean_corpus(rd.from_pandas(docs), set()).to_pandas()
    assert len(out) == 0
