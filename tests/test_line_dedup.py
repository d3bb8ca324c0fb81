"""Corpus-level duplicate-line removal (functions/line_dedup.py):
semantics on crafted fixtures, plan equivalence (broadcast ==
distributed), string id columns, and degenerate inputs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.functions.line_dedup import dup_line_counts, line_dedup

BOILER = "SHARED BOILERPLATE FOOTER LINE"


def _corpus():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            f"unique first line of doc one\n{BOILER}\nshort",
            f"doc two opening paragraph here\n{BOILER}\nanother unique line",
            f"{BOILER}\n{BOILER}",          # all lines removed -> ""
            "",                              # empty doc stays one empty line
            "short\nshort\nshort",           # short lines never removed
        ],
    })


def _run(mode):
    out = (line_dedup(rd.from_pandas(_corpus()), min_docs=2, min_len=15,
                      mode=mode)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_semantics(mode):
    out = _run(mode)
    assert out["text"].tolist() == [
        "unique first line of doc one\nshort",
        "doc two opening paragraph here\nanother unique line",
        "",
        "",
        "short\nshort\nshort",
    ]
    assert out["n_lines"].tolist() == [3, 3, 2, 1, 3]
    assert out["n_removed"].tolist() == [1, 1, 2, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_plans_pinned_equal_on_real_corpus():
    # give the single-line corpus line structure (10-token wrap)
    import __ray_entry__ as em
    wrapped = em._docs_wrapped("/root/testdata/sf0.001")
    a = (line_dedup(wrapped, min_docs=2, min_len=15)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (line_dedup(wrapped, min_docs=2, min_len=15, mode="distributed")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a["n_removed"].sum() > 0          # non-degenerate
    for col in ["doc_id", "text", "n_lines", "n_removed"]:
        assert (a[col].values == b[col].values).all(), col


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_string_id_column(mode):
    docs = _corpus().rename(columns={"doc_id": "url"})
    docs["url"] = "https://example.com/" + docs["url"].astype(str)
    out = (line_dedup(rd.from_pandas(docs), id_col="url", min_docs=2,
                      min_len=15, mode=mode)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(out) == 5
    assert out["n_removed"].sum() == 4
    assert out.loc[out["url"] == "https://example.com/3", "text"].iloc[0] == ""


@pytest.mark.usefixtures("ray_session")
def test_min_docs_three_keeps_pairwise_dups():
    out = (line_dedup(rd.from_pandas(_corpus()), min_docs=3, min_len=15)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # BOILER appears in 3 distinct docs -> still removed at min_docs=3
    assert out["n_removed"].tolist() == [1, 1, 2, 0, 0]
    # raise past its doc count -> nothing removed
    out4 = (line_dedup(rd.from_pandas(_corpus()), min_docs=4, min_len=15)
            .to_pandas())
    assert out4["n_removed"].sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_no_duplicates_corpus_passthrough():
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a wholly unique line over here\nsecond unique line",
                 "completely different content line\nfourth line content"],
    })
    for mode in ["broadcast", "distributed"]:
        out = (line_dedup(rd.from_pandas(docs), min_docs=2, min_len=15,
                          mode=mode)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["text"].tolist() == docs["text"].tolist()
        assert out["n_removed"].sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_auto_mode_picks_distributed_above_cut(monkeypatch):
    import ocr_model_ray.functions.line_dedup as m
    monkeypatch.setattr(m, "BROADCAST_MAX_HASHES", 0)
    out = (line_dedup(rd.from_pandas(_corpus()), min_docs=2, min_len=15)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_removed"].tolist() == [1, 1, 2, 0, 0]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_null_text_doc_survives(mode):
    # a NULL text splits to a null list -> zero line rows; the
    # distributed plan must still emit the doc (pos=-1 sentinel),
    # bit-equal to the broadcast plan: text='', n_lines=0
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": pd.array(
            [f"{BOILER}\nkeep this unique line", None, BOILER],
            dtype="string"),
    })
    out = (line_dedup(rd.from_pandas(docs), min_docs=2, min_len=15,
                      mode=mode)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["text"].tolist() == ["keep this unique line", "", ""]
    assert out["n_lines"].tolist() == [2, 0, 1]
    assert out["n_removed"].tolist() == [1, 0, 1]


@pytest.mark.usefixtures("ray_session")
def test_dup_line_counts_distinct_doc_semantics():
    # same line 5x within ONE doc counts as 1 doc, not 5
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["\n".join([BOILER] * 5), "some other unique line of text"],
    })
    counts = dup_line_counts(rd.from_pandas(docs), min_len=15).to_pandas()
    assert sorted(counts["n_docs"].tolist()) == [1, 1]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_scope_col_per_source_semantics(mode):
    # the boilerplate repeats within source A (dies) AND once on each
    # of A and B (survives there: cross-source repeats are not
    # within-scope duplicates)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["A", "A", "B"],
        "text": [f"{BOILER}\nunique alpha line of text",
                 f"{BOILER}\nunique beta line of text",
                 f"{BOILER}\nunique gamma line of text"],
    })
    out = (line_dedup(rd.from_pandas(docs), min_docs=2, min_len=15,
                      mode=mode, scope_col="source")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["text"].tolist() == ["unique alpha line of text",
                                    "unique beta line of text",
                                    f"{BOILER}\nunique gamma line of text"]
    assert out["n_removed"].tolist() == [1, 1, 0]
    # without the scope, all three copies die
    flat = (line_dedup(rd.from_pandas(docs), min_docs=2, min_len=15,
                       mode=mode)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert flat["n_removed"].tolist() == [1, 1, 1]
