import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from qdrant_spark.functions import distances as D


@pytest.fixture(scope="module")
def pair_df(spark):
    a = [0.5, -1.0, 2.0, 0.25]
    b = [1.0, 0.5, -0.5, 3.0]
    return (
        spark.createDataFrame(
            [(a, b)], "a array<float>, b array<float>"
        ),
        np.array(a),
        np.array(b),
    )


def _one(df, col):
    return df.select(col.alias("x")).collect()[0]["x"]


def test_dot(pair_df):
    df, a, b = pair_df
    assert _one(df, D.dot("a", "b")) == pytest.approx(float(a @ b), rel=1e-9)


def test_cosine(pair_df):
    df, a, b = pair_df
    exp = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert _one(df, D.cosine("a", "b")) == pytest.approx(exp, rel=1e-9)


def test_euclid(pair_df):
    df, a, b = pair_df
    assert _one(df, D.euclid("a", "b")) == pytest.approx(
        float(np.linalg.norm(a - b)), rel=1e-9
    )


def test_manhattan(pair_df):
    df, a, b = pair_df
    assert _one(df, D.manhattan("a", "b")) == pytest.approx(
        float(np.abs(a - b).sum()), rel=1e-9
    )


def test_maxsim(spark):
    q = [[1.0, 0.0], [0.0, 1.0]]
    d = [[0.5, 0.5], [1.0, -1.0], [0.0, 2.0]]
    df = spark.createDataFrame(
        [(q, d)], "q array<array<float>>, d array<array<float>>"
    )
    qn, dn = np.array(q), np.array(d)
    exp = float(sum((qn @ dn.T).max(axis=1)))
    got = df.select(D.maxsim("q", "d", "dot").alias("s")).collect()[0]["s"]
    assert got == pytest.approx(exp, rel=1e-9)


def test_sparse_dot(spark):
    df = spark.createDataFrame(
        [(([1, 5, 9], [1.0, 2.0, 3.0]), ([5, 9, 11], [0.5, 0.25, 4.0]))],
        "doc struct<indices: array<int>, values: array<float>>, "
        "q struct<indices: array<int>, values: array<float>>",
    )
    got = df.select(
        D.sparse_dot(
            F.col("doc.indices"), F.col("doc.values"),
            F.col("q.indices"), F.col("q.values"),
        ).alias("s")
    ).collect()[0]["s"]
    assert got == pytest.approx(2.0 * 0.5 + 3.0 * 0.25, rel=1e-9)


def test_ordering_flags():
    assert D.larger_is_better("cosine") and D.larger_is_better("dot")
    assert not D.larger_is_better("euclid") and not D.larger_is_better("manhattan")
