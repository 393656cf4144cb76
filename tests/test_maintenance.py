"""ensure_ann_index — the indexing_optimizer / config_mismatch_optimizer
analogue (SURVEY §4.3; lib/shard/src/optimizers/)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qdrant_spark.operators.ann import ivf_search
from qdrant_spark.operators.knn import knn
from qdrant_spark.plans.maintenance import ensure_ann_index, read_index_meta


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=8).astype(float).tolist())
            for i in range(400)]
    return spark.createDataFrame(rows, "id long, vec array<float>")


def test_below_threshold_skips(corpus, tmp_path):
    idx, action = ensure_ann_index(corpus, str(tmp_path / "ix"),
                                   indexing_threshold=10_000)
    assert idx is None and action == "skipped"
    assert read_index_meta(str(tmp_path / "ix")) is None


def test_build_load_rebuild_cycle(corpus, tmp_path, spark):
    path = str(tmp_path / "ix")
    idx, action = ensure_ann_index(corpus, path, n_clusters=4,
                                   indexing_threshold=100)
    assert action == "built"
    meta = read_index_meta(path)
    assert meta["n_rows"] == 400 and meta["n_clusters"] == 4

    # unchanged config + corpus -> loaded, centroids identical
    idx2, action = ensure_ann_index(corpus, path, n_clusters=4,
                                    indexing_threshold=100)
    assert action == "loaded"
    assert np.allclose(idx.centroids, idx2.centroids)

    # config mismatch -> rebuilt with the new params
    idx3, action = ensure_ann_index(corpus, path, n_clusters=8,
                                    indexing_threshold=100)
    assert action == "rebuilt"
    assert read_index_meta(path)["n_clusters"] == 8
    assert idx3.centroids.shape[0] == 8

    # small drift -> still loaded; past stale_fraction -> rebuilt
    grown = corpus.union(corpus.limit(40).withColumn(
        "id", F.col("id") + 1000))
    _, action = ensure_ann_index(grown, path, n_clusters=8,
                                 indexing_threshold=100)
    assert action == "loaded"
    doubled = corpus.union(corpus.withColumn("id", F.col("id") + 1000))
    _, action = ensure_ann_index(doubled, path, n_clusters=8,
                                 indexing_threshold=100)
    assert action == "rebuilt"
    assert read_index_meta(path)["n_rows"] == 800


def test_ensured_index_search_matches_exact(corpus, tmp_path):
    path = str(tmp_path / "ix")
    idx, _ = ensure_ann_index(corpus, path, n_clusters=4,
                              indexing_threshold=100)
    q = [0.1] * 8
    approx = ivf_search(idx, q, k=5, nprobe=4, metric="cosine").collect()
    exact = knn(corpus, q, metric="cosine", k=5,
                select=["id", "score"]).collect()
    assert [r["id"] for r in approx] == [r["id"] for r in exact]
