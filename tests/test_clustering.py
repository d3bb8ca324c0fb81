"""Distributed k-means: batch-boundary independence, convergence
quality, and summary consistency."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EMB = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.mark.usefixtures("ray_session")
def test_kmeans_batch_boundary_independent():
    """int64-grid partial sums make training order-independent: the
    same corpus split into 1 block vs 16 blocks yields bit-identical
    assignments (the distributed analogue of the round-1 half-cent
    float-partial lesson)."""
    import ray.data as rd
    from ocr_model_ray.functions.clustering import kmeans_cluster

    few = rd.read_parquet(EMB, override_num_blocks=1)
    many = rd.read_parquet(EMB, override_num_blocks=16)
    a = kmeans_cluster(few, k=8, iters=5)
    b = kmeans_cluster(many, k=8, iters=5)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_iterations_tighten_clusters():
    """Lloyd's monotonicity, spherical flavour: mean cosine to the
    assigned centroid must not decrease with more iterations."""
    import ray.data as rd
    from ocr_model_ray.functions.clustering import kmeans_cluster

    ds = rd.read_parquet(EMB)
    init_only = kmeans_cluster(ds, k=8, iters=0)
    trained = kmeans_cluster(ds, k=8, iters=10)
    assert trained["sim"].mean() >= init_only["sim"].mean()
    # every vector assigned, clusters in range
    assert len(trained) == 500
    assert trained["cluster"].between(0, 7).all()


@pytest.mark.usefixtures("ray_session")
def test_kmeans_summary_matches_assignment():
    import ray.data as rd
    from ocr_model_ray.functions.clustering import kmeans_cluster, kmeans_summary

    ds = rd.read_parquet(EMB)
    assigned = kmeans_cluster(ds, k=8, iters=5)
    summary = kmeans_summary(assigned, k=8)
    assert summary["n_vectors"].sum() == len(assigned)
    assert len(summary) == 8
    sizes = assigned.groupby("cluster").size()
    for _, row in summary.iterrows():
        assert row["n_vectors"] == sizes.get(row["cluster"], 0)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_empty_cluster_keeps_centroid():
    """k greater than the number of distinct points leaves some
    clusters empty — fit must not NaN out, and assignment still
    covers every row."""
    import ray.data as rd
    from ocr_model_ray.functions.clustering import kmeans_assign, kmeans_fit

    df = pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64),
        "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                      [0.0, 1.0], [1.0, 0.0], [0.0, 1.0]],
    })
    ds = rd.from_pandas(df)
    cent = kmeans_fit(ds, k=4, iters=3, sample_size=6)
    assert np.isfinite(cent).all()
    out = kmeans_assign(ds, cent).to_pandas()
    assert len(out) == 6
    # the two natural groups separate
    g = out.set_index("vec_id")["cluster"]
    assert g[0] == g[1] == g[4]
    assert g[2] == g[3] == g[5]
    assert g[0] != g[2]


@pytest.mark.usefixtures("ray_session")
def test_kmeans_sample_training_covers_corpus_bit_exact():
    """train_size >= corpus rows: the driver-local trainer must
    reproduce the distributed partial-sum training BIT-exactly (same
    int64-grid update arithmetic) — this is what keeps the recorded
    emb_kmeans goldens valid after the round-3 train_size switch."""
    import ray.data as rd
    from ocr_model_ray.functions.clustering import kmeans_cluster

    ds = rd.read_parquet(EMB, override_num_blocks=8)
    full = kmeans_cluster(ds, k=8, iters=10)
    sampled = kmeans_cluster(ds, k=8, iters=10, train_size=100_000)
    pd.testing.assert_frame_equal(full, sampled)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_bounded_sample_quality():
    """Training on a bounded sample of a clustered corpus keeps
    assignment quality (mean cosine to centroid) within a small delta
    of full-corpus training — the documented trade of the one-pass
    plan."""
    import ray.data as rd
    from ocr_model_ray.functions.clustering import kmeans_cluster

    rng = np.random.RandomState(5)
    centers = rng.normal(size=(6, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for i in range(3000):
        c = centers[i % 6]
        v = c + rng.normal(scale=0.15, size=16)
        vecs.append((v / np.linalg.norm(v)).tolist())
    df = pd.DataFrame({"vec_id": np.arange(3000, dtype="int64"),
                       "embedding": vecs})
    ds = rd.from_pandas(df).repartition(6)
    full = kmeans_cluster(ds, k=6, iters=8)
    sampled = kmeans_cluster(ds, k=6, iters=8, train_size=600)
    assert sampled["sim"].mean() >= full["sim"].mean() - 0.02
