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
    fit_fraction: float | None = None,
) -> IvfIndex:
    """KMeans-cluster the corpus (MLlib, Euclidean) and attach cluster ids.

    ``fit_fraction`` fits the centroids on a sample (KMeans iterations over
    the full 100-TB corpus would dominate build cost; a few-percent sample
    pins the same centroid structure) — assignment still runs over every
    row via the fitted model (one JVM-side pass)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = points.filter(F.col(vec_col).isNotNull())
    feat = base.withColumn("__feat", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="__feat",
                predictionCol="__cluster")
    fit_df = feat.sample(fit_fraction, seed=seed) if fit_fraction else feat
    model = km.fit(fit_df)
    assigned = model.transform(feat).drop("__feat")
    centroids = np.array(model.clusterCenters())
    return IvfIndex(assigned=assigned, centroids=centroids, vec_col=vec_col, id_col=id_col)


def persist_ivf(index: IvfIndex, path: str) -> IvfIndex:
    """Materialize the assignment parquet-partitioned by ``__cluster`` —
    the layout that turns cluster probing into directory partition
    pruning: a probe of nprobe/K clusters READS nprobe/K of the corpus
    (file skip), instead of scanning everything and discarding rows.
    This is the scale path every search helper assumes; returns the index
    re-pointed at the pruned-readable table."""
    index.assigned.write.mode("overwrite").partitionBy("__cluster").parquet(path)
    spark = index.assigned.sparkSession
    return IvfIndex(
        assigned=spark.read.parquet(path),
        centroids=index.centroids,
        vec_col=index.vec_col,
        id_col=index.id_col,
    )


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

    Plan shape: the probe map (cluster -> probing query indices, computed
    driver-side from the centroid matrix) is broadcast; the corpus —
    pre-filtered to clusters somebody probes, which becomes partition
    pruning when the corpus is stored partitioned by cluster — streams
    through the Arrow scorer ONCE, each cluster block matmul'd against
    only its probing queries. No pair materialization: a join would ship
    every point duplicated per probing query. Exact per-query top-k window
    finishes, so full probe == exact batch scan."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from qdrant_spark.operators.knn import (
        larger_is_better, score_block, score_order,
    )

    # plain collect (see knn._matmul_knn): coalesce(1) serializes every
    # python partition through one worker, ~2.6s fixed overhead
    q_rows = queries.select(qid_col, qvec_col).collect()
    qids = [r[qid_col] for r in q_rows]
    Qm = np.array([list(r[qvec_col]) for r in q_rows], dtype=np.float64)
    # (nq, K) squared euclid to centroids -> nprobe smallest per query
    d = ((Qm[:, None, :] - index.centroids[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d, axis=1)[:, :nprobe]
    used = sorted({int(c) for row in probes for c in row})
    cluster_q = {
        int(c): np.where((probes == c).any(axis=1))[0] for c in used
    }

    sc = queries.sparkSession.sparkContext
    bq = sc.broadcast((np.asarray(qids), Qm, cluster_q))
    bigger_better = larger_is_better(metric)

    pruned = index.assigned.filter(F.col("__cluster").isin(used))
    sel = pruned.select(index.id_col, index.vec_col, "__cluster")
    out_schema = T.StructType(
        [
            T.StructField(qid_col, queries.schema[qid_col].dataType),
            T.StructField(index.id_col, sel.schema[index.id_col].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )
    id_col = index.id_col

    def score_batches(batches):
        import pyarrow as pa

        qid_arr, Qm_, cq = bq.value
        acc = []
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            vec = batch.column(1)
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            V = vec.flatten().to_numpy(zero_copy_only=False) \
                .reshape(n, -1).astype(np.float64, copy=False)
            cl = batch.column(2).to_numpy(zero_copy_only=False)
            for c in np.unique(cl):
                qidx = cq.get(int(c))
                if qidx is None or len(qidx) == 0:
                    continue
                mask = cl == c
                S = score_block(V[mask], Qm_[qidx], metric)
                nb = S.shape[0]
                kk = min(k, nb)
                if kk < nb:
                    part = np.argpartition(
                        -S if bigger_better else S, kk - 1, axis=0
                    )[:kk]
                else:
                    part = np.tile(np.arange(nb)[:, None], (1, len(qidx)))
                rows = part.ravel(order="F")
                qrep = np.repeat(qidx, part.shape[0])
                acc.append((qrep, ids[mask][rows],
                            S[rows, np.repeat(np.arange(len(qidx)), part.shape[0])]))
        if not acc:
            return
        qi = np.concatenate([a[0] for a in acc])
        ii = np.concatenate([a[1] for a in acc])
        ss = np.concatenate([a[2] for a in acc])
        key_s = -ss if bigger_better else ss
        order = np.lexsort((ii, key_s, qi))
        qi, ii, ss = qi[order], ii[order], ss[order]
        uq, starts = np.unique(qi, return_index=True)
        rank = np.arange(len(qi)) - starts[np.searchsorted(uq, qi)]
        keep = rank < k
        yield pa.RecordBatch.from_arrays(
            [pa.array(qid_arr[qi[keep]]), pa.array(ii[keep]),
             pa.array(ss[keep], type=pa.float64())],
            names=[qid_col, id_col, "score"],
        )

    scored = sel.mapInArrow(score_batches, out_schema)
    w = Window.partitionBy(qid_col).orderBy(*score_order(metric, id_col=id_col))
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
