"""Cross-run embedding LSH index (state/emb_index.py): delta
verdicts, idempotent retry, torn parts, and the frozen-geometry
guard."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_model_ray.state.emb_index import emb_delta, emb_ingest


def _vecs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def _corpus():
    rng = np.random.RandomState(3)
    base = rng.normal(size=8)
    far = rng.normal(size=8)
    near = base + rng.normal(scale=0.05, size=8)   # cosine ~0.999
    return [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": far.tolist()},
        {"vec_id": 2, "embedding": near.tolist()},     # near copy of 0
        {"vec_id": 3, "embedding": base.tolist()},     # exact copy of 0
    ]


@pytest.mark.usefixtures("ray_session")
def test_emb_delta_verdicts_and_idempotent_retry(tmp_path):
    idx = str(tmp_path / "emb")
    rows = _corpus()
    old = _vecs(rows[:2])
    new = _vecs(rows[2:])
    emb_ingest(old, idx, "old", threshold=0.8).materialize()
    corpus = _vecs(rows)

    out = (emb_delta(new, idx, "new", corpus, threshold=0.8)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert out["vec_id"].tolist() == [2, 3]
    assert out["is_dup"].tolist() == [1, 1]
    assert out["match_old"].tolist() == [0, 0]
    assert out.loc[1, "best_sim"] == 1.0           # exact copy
    assert 0.9 <= out.loc[0, "best_sim"] <= 1.0

    retry = (emb_delta(new, idx, "new", corpus, threshold=0.8)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, retry)

    # a genuinely novel vector verdicts clean with sentinels
    rng = np.random.RandomState(99)
    fresh = _vecs([{"vec_id": 9,
                    "embedding": rng.normal(size=8).tolist()}])
    corpus2 = corpus.union(fresh)
    clean = (emb_delta(fresh, idx, "new2", corpus2, threshold=0.8)
             .to_pandas())
    assert clean["vec_id"].tolist() == [9]
    assert clean["is_dup"].tolist() == [0]
    assert clean["match_old"].tolist() == [-1]
    assert clean["best_sim"].tolist() == [0.0]


@pytest.mark.usefixtures("ray_session")
def test_emb_index_geometry_guard_and_torn_parts(tmp_path):
    idx = str(tmp_path / "emb")
    rows = _corpus()
    emb_ingest(_vecs(rows[:2]), idx, "a", threshold=0.8).materialize()
    # a later ingest with different geometry is an ERROR, not silent
    # zero recall
    with pytest.raises(ValueError, match="geometry mismatch"):
        emb_ingest(_vecs(rows[2:]), idx, "b",
                   threshold=0.8, num_planes=6).materialize()
    # torn .tmp parts from a killed ingest are ignored
    bdir = next(os.path.join(idx, d) for d in os.listdir(idx)
                if d.startswith("bucket="))
    open(os.path.join(bdir, "ingest_dead.parquet.tmp"), "w").write("x")
    cand = (emb_ingest(_vecs(rows[3:]), idx, "c", threshold=0.8)
            .to_pandas())
    assert (0, 3) in set(zip(cand["vec_a"], cand["vec_b"]))


@pytest.mark.usefixtures("ray_session")
def test_emb_verify_regimes_bit_equal(tmp_path):
    """The broadcast verify (corpus under BROADCAST_VECS) and the
    no-driver-state bucket-join verify compute the same float64
    cosine expression — pinned bit-equal on the same candidates."""
    from ocr_model_ray.state.emb_index import (_verify_cosine_broadcast,
                                               _verify_cosine_pairs)

    rng = np.random.RandomState(11)
    rows = [{"vec_id": i, "embedding": rng.normal(size=8).tolist()}
            for i in range(40)]
    corpus = _vecs(rows)
    cand = rd.from_pandas(pd.DataFrame({
        "vec_a": pd.array(range(0, 20), dtype="int64"),
        "vec_b": pd.array(range(20, 40), dtype="int64")}))

    def collect(ds):
        out = ds.to_pandas().sort_values(["vec_a", "vec_b"]) \
            .reset_index(drop=True)
        return out

    b = collect(_verify_cosine_broadcast(corpus, cand,
                                         "vec_id", "embedding"))
    j = collect(_verify_cosine_pairs(corpus, cand))
    pd.testing.assert_frame_equal(b, j)
    assert len(b) == 20
