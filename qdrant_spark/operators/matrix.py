"""Distance matrix: sample N filtered points, score each against the other
sampled points, keep top-k neighbors per sample.

Reference: search_points_matrix
(lib/collection/src/collection/distance_matrix.rs:141), REST
``/points/search/matrix/{pairs,offsets}`` (src/actix/api/search_api.rs).

Spark shape: the sample is bounded (``sample_size`` defaults to 10 in the
API), so the self-join is a broadcast theta-join of sample x sample — the
naturally parallel plan; per-row top-k via one window on sample^2 rows.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qdrant_spark.functions.distances import distance, larger_is_better
from qdrant_spark.operators.points import sample as sample_points


def distance_matrix(
    points: DataFrame,
    *,
    sample_size: int = 10,
    limit_per_sample: int = 3,
    metric: str = "cosine",
    vec_col: str = "vec",
    id_col: str = "id",
    flt: dict[str, Any] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Returns (id_a, id_b, score): for each sampled point a, its
    ``limit_per_sample`` nearest other sampled points b."""
    smp = (
        sample_points(points.filter(F.col(vec_col).isNotNull()), sample_size, flt=flt, seed=seed)
        .select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    )
    # The sample is bounded by sample_size (API default 10), but every
    # DataFrame reference to it re-evaluates the corpus scan + sample
    # top-k — the offsets wrapper referenced it 7x, i.e. 7 corpus scans
    # per query (plans/r14/distance_matrix_offsets_before.txt). Collect
    # the sample ONCE and rebuild it as a LocalRelation: one corpus
    # scan total, every downstream reference is a LocalTableScan
    # (guide §2.4 remove repeated passes; values round-trip exactly —
    # collect -> local_df preserves float32 bits, same rows, same
    # ordering logic).
    # Guard the shortcut by sample size: collecting ids+vectors is a
    # driver-memory/py4j bottleneck the distributed lineage never had,
    # so very large samples keep the live frame (and pay the rescans).
    from qdrant_spark.session import local_df

    spark = points.sparkSession
    if sample_size <= 1000:
        smp_schema = smp.schema
        smp = local_df(spark, [tuple(r) for r in smp.collect()], smp_schema)
        if sample_size > 100:
            # restore scan parallelism the corpus lineage used to provide:
            # the Arrow pair scorer below streams sample^2 rows
            smp = smp.repartition(
                min(sample_size, spark.sparkContext.defaultParallelism))
    other = smp.select(F.col("id_a").alias("id_b"), F.col("__va").alias("__vb"))
    pairs = smp.crossJoin(F.broadcast(other)).filter(F.col("id_a") != F.col("id_b"))
    if sample_size > 100:
        # sample^2 pairs: interpreted Column scoring is the slow path —
        # route through the vectorized Arrow pair scorer (same ordering
        # and tie-break, so results are identical)
        from qdrant_spark.operators.knn import rowwise_score_topk

        return rowwise_score_topk(
            pairs, metric=metric, k=limit_per_sample,
            qid_col="id_a", id_col="id_b", vec_col="__va", qvec_col="__vb",
        ).select("id_a", "id_b", "score", "rank")
    pairs = pairs.withColumn("score", distance(metric, F.col("__va"), F.col("__vb")))
    order = [
        F.col("score").desc() if larger_is_better(metric) else F.col("score").asc(),
        F.col("id_b").asc(),
    ]
    w = Window.partitionBy("id_a").orderBy(*order)
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit_per_sample)
        .select("id_a", "id_b", "score", "rank")
    )


def distance_matrix_offsets(
    points: DataFrame,
    *,
    sample_size: int = 10,
    limit_per_sample: int = 3,
    metric: str = "cosine",
    vec_col: str = "vec",
    id_col: str = "id",
    flt: dict[str, Any] | None = None,
    seed: int = 42,
) -> DataFrame:
    """CSR ``offsets`` response format: one row with four arrays —
    ``ids`` (the sample ids), ``offsets_row`` / ``offsets_col`` (positions
    into ``ids``), and flat ``scores``, ordered row-major by (row, rank).

    Reference: SearchMatrixOffsetsResponse construction
    (lib/collection/src/collection/distance_matrix.rs:64-94), REST
    ``/points/search/matrix/offsets``. The reference keeps ``ids`` in
    sample order; here ids are canonicalized ascending so the output is
    deterministic across engines (the CSR is equivalent up to that
    permutation).

    Scale note: everything past ``distance_matrix`` operates on at most
    ``sample_size * limit_per_sample`` rows (the API default sample is 10),
    so the unpartitioned window and single-row aggregate are bounded by
    construction, not by corpus size.
    """
    pairs = distance_matrix(
        points, sample_size=sample_size, limit_per_sample=limit_per_sample,
        metric=metric, vec_col=vec_col, id_col=id_col, flt=flt, seed=seed,
    )
    ids = (
        pairs.select(F.col("id_a").alias("__id"))
        .union(pairs.select(F.col("id_b").alias("__id")))
        .distinct()
        .withColumn("__off", F.row_number().over(Window.orderBy("__id")) - F.lit(1))
    )
    j = (
        pairs
        .join(ids.select(F.col("__id").alias("id_a"),
                         F.col("__off").alias("__ro")), "id_a")
        .join(ids.select(F.col("__id").alias("id_b"),
                         F.col("__off").alias("__co")), "id_b")
    )
    csr = j.agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("__ro").alias("ro"), F.col("rank").alias("rk"),
            F.col("__co").alias("co"), F.col("score").alias("sc"),
        ))).alias("__t")
    )
    id_arr = ids.agg(F.sort_array(F.collect_list("__id")).alias("ids"))
    return csr.crossJoin(id_arr).select(
        F.col("ids"),
        F.transform("__t", lambda s: s["ro"].cast("long")).alias("offsets_row"),
        F.transform("__t", lambda s: s["co"].cast("long")).alias("offsets_col"),
        F.transform("__t", lambda s: s["sc"]).alias("scores"),
    )
