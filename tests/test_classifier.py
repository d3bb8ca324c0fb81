"""Units for the integer-exact token-vote classifier
(functions/classifier.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _planted(n: int = 240, seed: int = 0) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 3 == 0:
            lab, words = 1, ["good", "fine", "nice", "meh"]
        elif i % 3 == 1:
            lab, words = 0, ["bad", "awful", "poor", "meh"]
        else:
            lab = -1
            words = ["good", "bad", "meh", "nice"] if i % 2 \
                else ["novel", "unseen"]
        rows.append((i, " ".join(rng.choice(words, 12)), lab))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_three_regimes_agree_and_learn(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.classifier import token_vote_classifier
    docs = _planted()
    ds = rd.from_pandas(docs)
    local = token_vote_classifier(ds, mode="local")
    bcast = token_vote_classifier(ds, mode="distributed")
    join = token_vote_classifier(ds, mode="distributed",
                                 vocab_broadcast_rows=0)
    pd.testing.assert_frame_equal(local, bcast)
    pd.testing.assert_frame_equal(local, join)
    lab = docs.set_index("doc_id")["label"]
    tr = local[lab.reindex(local["doc_id"]).isin([0, 1]).to_numpy()]
    acc = (tr["pred"].to_numpy()
           == lab.reindex(tr["doc_id"]).to_numpy()).mean()
    # near-separable planted vocabulary (the shared 'meh' token can
    # dominate an unlucky draw)
    assert acc >= 0.95


def test_unseen_tokens_vote_zero(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.classifier import token_vote_classifier
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["hot hot hot", "cold cold", "alien words here"],
        "label": np.array([1, 0, -1], dtype=np.int64)})
    out = token_vote_classifier(rd.from_pandas(docs), mode="local")
    row = out[out["doc_id"] == 3].iloc[0]
    # every token of doc 3 is unseen in training: zero votes, pred 0
    assert row["votes_pos"] == 0 and row["votes_neg"] == 0
    assert row["n_tokens"] == 3 and row["pred"] == 0


def test_no_labeled_docs_scores_all_zero(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.classifier import token_vote_classifier
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a b c", "d e"],
        "label": np.array([-1, -1], dtype=np.int64)})
    for mode in ("local", "distributed"):
        out = token_vote_classifier(rd.from_pandas(docs), mode=mode)
        assert out["votes_pos"].tolist() == [0, 0]
        assert out["votes_neg"].tolist() == [0, 0]
        assert out["n_tokens"].tolist() == [3, 2]
        assert out["pred"].tolist() == [0, 0]


def test_partitioning_independence(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.classifier import token_vote_classifier
    docs = _planted(180, seed=7)
    outs = []
    for nb in (1, 6):
        ds = rd.from_pandas(docs).repartition(nb)
        outs.append(token_vote_classifier(
            ds, mode="distributed", vocab_broadcast_rows=0))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_overflow_path_matches_fast_path():
    from ocr_model_ray.functions.classifier import _votes_of

    def expected(np_, nn, tp, tn, v):
        out = []
        for a, b in zip(np_, nn):
            lhs = (int(a) + 1) * (tn + v)
            rhs = (int(b) + 1) * (tp + v)
            out.append(1 if lhs > rhs else -1 if lhs < rhs else 0)
        return out

    np_ = np.array([5, 0, 3], dtype=np.int64)
    nn = np.array([1, 4, 3], dtype=np.int64)
    # fast int64 path: equal totals -> vote is the sign of np_ - nn
    assert _votes_of(np_, nn, 100, 100, 6).tolist() \
        == expected(np_, nn, 100, 100, 6) == [1, -1, 0]
    # asymmetric totals
    assert _votes_of(np_, nn, 100, 10, 6).tolist() \
        == expected(np_, nn, 100, 10, 6)
    # object-int path: counts x totals large enough that the int64
    # cross-multiply would overflow — values must still equal the
    # exact Python-int recompute
    big = 2**40
    huge = _votes_of(np_ * big, nn * big, big * 8, big * 8 + 17, 6)
    assert (int(np_.max()) * big + 1) * (big * 8 + 17 + 6) >= 2**63
    assert huge.tolist() == expected(np_ * big, nn * big,
                                     big * 8, big * 8 + 17, 6)


def test_empty_corpus(ray_session):
    import ray.data as rd

    from ocr_model_ray.functions.classifier import token_vote_classifier
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object"),
         "label": pd.Series([], dtype="int64")}))
    for mode in ("local", "distributed"):
        out = token_vote_classifier(empty, mode=mode)
        assert out.empty
