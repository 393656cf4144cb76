"""Exact K-nearest-neighbor search (dense vectors) — single query and batch.

Reference semantics: ``CoreSearchRequest`` (lib/shard/src/search.rs) and the
plain (non-HNSW) exact scan path (lib/segment/src/index/plain_vector_index /
hnsw read_view dispatch lib/segment/src/index/hnsw_index/hnsw/read_view/
dispatch.rs:24-176): score every point passing the filter, return top-k by
score with optional ``score_threshold`` and ``offset``. Ties broken by id
ascending (the reference breaks ties arbitrarily; we pin id-asc so results
are deterministic and oracle-checkable — FIXTURES.md "Oracle rules").

Spark shapes:

- single query  -> ``orderBy(score).limit(k)`` => Catalyst plans
  ``TakeOrderedAndProject`` — per-partition partial top-k, then a driver
  merge. No shuffle of the scored set. This is already the optimal
  distributed plan at 100 TB.
- batch queries -> broadcast the Q queries, theta-join (crossJoin) against
  the points, then per-query top-k. Two physical strategies:

  * ``window``  — ``row_number() over (partition by qid order by score)``;
    one shuffle of N*Q scored rows. Fine when N*Q is moderate.
  * ``partial`` — local sort within each points-partition + an Arrow-batched
    running top-k per query (mapInPandas over only (qid, id, score)), then
    the window runs on <= P*Q*k rows. The N*Q scored rows are never
    shuffled — this is the 100-TB plan.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qdrant_spark.filters import apply_filter
from qdrant_spark.functions.distances import distance, larger_is_better


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def score_order(metric: str, score_col: str = "score", id_col: str = "id") -> list[Column]:
    s = F.col(score_col).desc() if larger_is_better(metric) else F.col(score_col).asc()
    return [s, F.col(id_col).asc()]


def _threshold_cond(metric: str, threshold: float, score_col: str = "score") -> Column:
    """check_threshold (types.rs:371-377): direction-aware keep condition."""
    c = F.col(score_col)
    return c > F.lit(threshold) if larger_is_better(metric) else c < F.lit(threshold)


def knn(
    points: DataFrame,
    query_vector: Sequence[float],
    *,
    metric: str = "cosine",
    k: int = 10,
    vec_col: str = "vec",
    id_col: str = "id",
    flt: dict[str, Any] | None = None,
    score_threshold: float | None = None,
    offset: int = 0,
    select: list[str] | None = None,
) -> DataFrame:
    """Single-query exact KNN. Returns (id, ..., score) ordered best-first."""
    df = apply_filter(points, flt)
    df = df.filter(F.col(vec_col).isNotNull())
    df = df.withColumn("score", distance(metric, F.col(vec_col), _vec_lit(query_vector)))
    if score_threshold is not None:
        df = df.filter(_threshold_cond(metric, score_threshold))
    out_cols = select if select is not None else [c for c in df.columns if c != vec_col]
    df = df.select(*out_cols).orderBy(*score_order(metric, id_col=id_col))
    if offset:
        # TakeOrderedAndProject handles limit; offset applied after global order
        return df.limit(offset + k).offset(offset)
    return df.limit(k)


def knn_batch(
    points: DataFrame,
    queries: DataFrame,
    *,
    metric: str = "cosine",
    k: int = 10,
    vec_col: str = "vec",
    id_col: str = "id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    flt: dict[str, Any] | None = None,
    score_threshold: float | None = None,
    strategy: str = "window",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Batch exact KNN: one top-k result set per row of ``queries``.

    ``queries`` must have (qid_col, qvec_col). Returns
    (qid, id, score, rank, *keep_cols) with rank 1..k per query.
    """
    pts = apply_filter(points, flt).filter(F.col(vec_col).isNotNull())
    q = queries.select(
        F.col(qid_col).alias("__qid"), F.col(qvec_col).alias("__qvec")
    )
    scored = pts.crossJoin(F.broadcast(q)).withColumn(
        "score", distance(metric, F.col(vec_col), F.col("__qvec"))
    )
    if score_threshold is not None:
        scored = scored.filter(_threshold_cond(metric, score_threshold))
    keep = keep_cols or []
    scored = scored.select(
        F.col("__qid").alias(qid_col), F.col(id_col), F.col("score"), *keep
    )

    if strategy == "partial":
        scored = _partial_topk(scored, metric, k, qid_col=qid_col, id_col=id_col)

    w = Window.partitionBy(qid_col).orderBy(*score_order(metric, id_col=id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _partial_topk(
    scored: DataFrame, metric: str, k: int, *, qid_col: str, id_col: str
) -> DataFrame:
    """Per-partition running top-k per query over Arrow batches.

    Reduces each points-partition to <= Q*k candidate rows BEFORE the
    per-query shuffle — the map-side-combine of top-k. Only the narrow
    (qid, id, score, ...) projection crosses the Python boundary.
    """
    bigger_better = larger_is_better(metric)
    schema = scored.schema
    cols = [f.name for f in schema.fields]

    def take_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        cand: "pd.DataFrame | None" = None
        for pdf in batches:
            cand = pdf if cand is None else pd.concat([cand, pdf], ignore_index=True)
            # exact same ordering as the global window: (score dir, id asc)
            cand = (
                cand.sort_values(
                    ["score", id_col], ascending=[not bigger_better, True]
                )
                .groupby(qid_col, sort=False)
                .head(k)
                .reset_index(drop=True)
            )
        yield cand if cand is not None else pd.DataFrame(columns=cols)

    return scored.mapInPandas(take_topk, schema=schema)
