"""Approximate nearest neighbor: IVF (inverted-file) index via KMeans.

The reference accelerates search with HNSW graphs (lib/segment/src/index/
hnsw_index/, ~14k LoC). A graph walk is pointer-chasing — the wrong shape
for Spark. The Spark-native ANN equivalent is IVF: cluster the corpus
(MLlib KMeans), store cluster ids as a column (partition/Z-order by it at
scale), and search only the ``nprobe`` nearest clusters — a partition-
pruned exact scan. Selectivity heuristics mirror the reference's
plain-vs-graph dispatch (full_scan_threshold, dispatch.rs:56-176): small
filtered sets skip the index entirely.

Recall is gated against the exact scan, mirroring the reference's
ANN-vs-exact test pattern (lib/segment/tests/integration/
filtrable_hnsw_test.rs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qdrant_spark.functions.distances import distance
from qdrant_spark.operators.knn import knn


@dataclass
class IvfIndex:
    """IVF index state: the corpus with a ``__cluster`` column plus the
    centroid matrix. ``assigned`` should be persisted partitioned by
    ``__cluster`` at scale so probing prunes files."""

    assigned: DataFrame
    centroids: np.ndarray  # (n_clusters, dim)
    vec_col: str
    id_col: str


def build_ivf(
    points: DataFrame,
    *,
    n_clusters: int = 16,
    vec_col: str = "vec",
    id_col: str = "id",
    seed: int = 42,
    max_iter: int = 20,
) -> IvfIndex:
    """KMeans-cluster the corpus (MLlib, Euclidean) and attach cluster ids."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = points.filter(F.col(vec_col).isNotNull())
    feat = base.withColumn("__feat", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="__feat",
                predictionCol="__cluster")
    model = km.fit(feat)
    assigned = model.transform(feat).drop("__feat")
    centroids = np.array(model.clusterCenters())
    return IvfIndex(assigned=assigned, centroids=centroids, vec_col=vec_col, id_col=id_col)


def ivf_search(
    index: IvfIndex,
    query_vector: Sequence[float],
    *,
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
    flt: dict[str, Any] | None = None,
) -> DataFrame:
    """Probe the ``nprobe`` centroid-nearest clusters, exact-score inside.

    The cluster filter is an ordinary column predicate — with the corpus
    partitioned by cluster it becomes partition pruning, reading nprobe/K
    of the data."""
    q = np.asarray(query_vector, dtype=np.float64)
    d = ((index.centroids - q) ** 2).sum(axis=1)
    probes = [int(c) for c in np.argsort(d)[:nprobe]]
    pruned = index.assigned.filter(F.col("__cluster").isin(probes))
    return knn(
        pruned, query_vector, metric=metric, k=k, vec_col=index.vec_col,
        id_col=index.id_col, flt=flt,
        select=[index.id_col, "score"],
    )


def ivf_search_batch(
    index: IvfIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Bulk ANN: every query probes only its ``nprobe`` nearest clusters.

    Plan shape: a small (qid, cluster) probe table — computed driver-side
    from the centroid matrix, queries are broadcast-sized by definition —
    joins the clustered corpus on ``__cluster``. The per-cluster join scopes
    the query×point cross product to nprobe/K of the corpus per query,
    then an exact per-query top-k window finishes. With the corpus
    partitioned by cluster this is a co-located join: no corpus shuffle,
    ~nprobe/K of the bytes of the exact batch scan."""
    q_rows = queries.select(qid_col, qvec_col).coalesce(1).collect()
    qids = [r[qid_col] for r in q_rows]
    Qm = np.array([list(r[qvec_col]) for r in q_rows], dtype=np.float64)
    # (nq, K) squared euclid to centroids -> nprobe smallest per query
    d = ((Qm[:, None, :] - index.centroids[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d, axis=1)[:, :nprobe]

    spark = queries.sparkSession
    pairs = spark.createDataFrame(
        [
            (qids[i], [float(x) for x in Qm[i]], int(c))
            for i in range(len(qids))
            for c in probes[i]
        ],
        f"{qid_col}: long, {qvec_col}: array<double>, __cluster: int",
    )
    from qdrant_spark.operators.knn import score_order

    scored = (
        index.assigned.join(F.broadcast(pairs), "__cluster")
        .withColumn(
            "score",
            distance(metric, F.col(index.vec_col), F.col(qvec_col)),
        )
        .select(qid_col, index.id_col, "score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(qid_col).orderBy(
        *score_order(metric, id_col=index.id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def recall_at_k(
    index: IvfIndex,
    points: DataFrame,
    queries: list[Sequence[float]],
    *,
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
) -> float:
    """Fraction of exact top-k recovered by the IVF search, averaged over
    queries (the reference's ANN quality gate)."""
    hits = total = 0
    for q in queries:
        exact = {
            r[index.id_col]
            for r in knn(points, q, metric=metric, k=k, vec_col=index.vec_col,
                         id_col=index.id_col, select=[index.id_col, "score"]).collect()
        }
        approx = {r[index.id_col] for r in ivf_search(index, q, k=k, nprobe=nprobe,
                                                      metric=metric).collect()}
        hits += len(exact & approx)
        total += len(exact)
    return hits / total if total else 1.0
