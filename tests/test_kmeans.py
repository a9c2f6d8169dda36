"""K-means cluster profile over embeddings (operators/similarity)."""

import numpy as np
import pytest

from anomalydetector_spark.operators.similarity import (
    cluster_assignments,
    kmeans_cluster_profile,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Three well-separated Gaussian blobs, labeled with ground truth."""
    rng = np.random.default_rng(7)
    centers = np.eye(3, 8) * 10.0  # 8-dim, far apart
    rows = []
    for i in range(300):
        lab = i % 3
        v = centers[lab] + rng.normal(0, 0.3, 8)
        rows.append((i, [float(x) for x in v], lab))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_assignment_is_argmax_cosine(corpus):
    cent = train_ivf_centroids(corpus, n_cells=3, seed=1, approx_count=300)
    got = cluster_assignments(corpus, cent).collect()
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    vecs = {r.vec_id: np.array(r.embedding) for r in corpus.collect()}
    for r in got:
        x = vecs[r.vec_id]
        sims = (x / np.linalg.norm(x)) @ cn.T
        assert r.cell == int(sims.argmax())
        assert r.cos_to_centroid == pytest.approx(sims.max(), abs=1e-9)


def test_keep_cols_ride_the_scan(corpus):
    cent = train_ivf_centroids(corpus, n_cells=3, seed=1, approx_count=300)
    out = cluster_assignments(corpus, cent, keep_cols=["label"])
    assert out.columns == ["vec_id", "label", "cell", "cos_to_centroid"]
    assert out.count() == 300


def test_profile_counts_and_purity(corpus):
    prof = kmeans_cluster_profile(
        corpus, n_cells=3, seed=1, label_col="label", approx_count=300
    ).collect()
    assert sum(r.n_vectors for r in prof) == 300
    # blobs are well-separated: k-means must recover them exactly
    assert len(prof) == 3
    assert {r.majority_label for r in prof} == {0, 1, 2}
    for r in prof:
        assert r.majority_frac == 1.0
        assert r.n_vectors == 100
        assert r.mean_cos > 0.99
        assert r.min_cos <= r.mean_cos


def test_profile_without_labels(corpus):
    prof = kmeans_cluster_profile(corpus, n_cells=3, seed=1, approx_count=300)
    assert prof.columns == ["cell", "n_vectors", "mean_cos", "min_cos"]
    assert sum(r.n_vectors for r in prof.collect()) == 300


def test_profile_partition_invariance(corpus):
    a = kmeans_cluster_profile(
        corpus.repartition(1), n_cells=3, seed=1, label_col="label",
        approx_count=300,
    ).collect()
    b = kmeans_cluster_profile(
        corpus.repartition(7), n_cells=3, seed=1, label_col="label",
        approx_count=300,
    ).collect()
    assert a == b


def test_assignment_plan_no_shuffle(corpus):
    """Assignment is a pure Arrow projection — no exchange anywhere."""
    cent = train_ivf_centroids(corpus, n_cells=3, seed=1, approx_count=300)
    plan = (
        cluster_assignments(corpus, cent)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
