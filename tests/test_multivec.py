"""Corpus-scale MaxSim (Arrow scorer) must agree exactly with the
Column-math maxsim (functions/distances.py), which is itself
DuckDB-oracle-gated — transitive exactness for the scan path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qdrant_spark.functions.distances import maxsim
from qdrant_spark.operators.multivec import maxsim_knn


@pytest.fixture(scope="module")
def mv_points(embeddings):
    d_mv = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.slice(F.col("embedding").cast("array<double>"), i * 8 + 1, 8),
    )
    return embeddings.select("vec_id", d_mv.alias("mv")).cache()


@pytest.fixture(scope="module")
def q_mv(embeddings):
    q = list(embeddings.limit(1).collect()[0]["embedding"])
    return [q[i * 8:(i + 1) * 8] for i in range(8)]


@pytest.mark.parametrize("metric", ["dot", "cosine"])
def test_maxsim_knn_matches_column_math(mv_points, q_mv, metric):
    got = maxsim_knn(mv_points, q_mv, k=10, metric=metric,
                     mv_col="mv", id_col="vec_id").collect()
    q_col = F.array(*[F.array(*[F.lit(float(x)) for x in ch]) for ch in q_mv])
    exp = (
        mv_points.withColumn("score", maxsim(q_col, F.col("mv"), metric=metric))
        .orderBy(F.col("score").desc(), F.col("vec_id"))
        .limit(10)
        .collect()
    )
    assert [(r["vec_id"], pytest.approx(r["score"], rel=1e-9)) for r in got] == [
        (r["vec_id"], r["score"]) for r in exp
    ]


def test_maxsim_knn_ragged_token_counts(spark):
    """Docs with different token counts (the whole point of the offsets
    math) and empty/null docs that must be excluded."""
    rows = [
        (1, [[1.0, 0.0], [0.0, 1.0]]),
        (2, [[0.5, 0.5]]),
        (3, [[1.0, 0.0], [1.0, 0.0], [0.0, -1.0]]),
        (4, None),
        (5, []),
    ]
    df = spark.createDataFrame(rows, "id: long, mv: array<array<double>>")
    got = maxsim_knn(df, [[1.0, 0.0]], k=5, metric="dot",
                     mv_col="mv", id_col="id").collect()
    assert [r["id"] for r in got] == [1, 3, 2]
    assert [r["score"] for r in got] == [1.0, 1.0, 0.5]
