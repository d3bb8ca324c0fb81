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
