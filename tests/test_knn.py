"""Exact KNN vs a NumPy oracle on the real embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from qdrant_spark.operators.knn import knn, knn_batch


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def oracle_topk(ids, mat, q, metric, k):
    q = np.asarray(q, dtype=np.float64)
    if metric == "dot":
        s = mat @ q
        order_desc = True
    elif metric == "cosine":
        s = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order_desc = True
    elif metric == "euclid":
        s = np.linalg.norm(mat - q, axis=1)
        order_desc = False
    else:
        s = np.abs(mat - q).sum(axis=1)
        order_desc = False
    key = sorted(range(len(ids)), key=lambda i: (-s[i] if order_desc else s[i], ids[i]))
    return [(int(ids[i]), float(s[i])) for i in key[:k]]


@pytest.mark.parametrize("metric", ["dot", "cosine", "euclid", "manhattan"])
def test_knn_matches_numpy(embeddings, emb_np, metric):
    ids, mat = emb_np
    q = mat[7].tolist()
    got = knn(
        embeddings, q, metric=metric, k=10, vec_col="embedding", id_col="vec_id"
    ).select("vec_id", "score").collect()
    exp = oracle_topk(ids, mat, q, metric, 10)
    assert [(r["vec_id"], pytest.approx(r["score"], rel=1e-8)) for r in got] == exp


def test_knn_filter_and_threshold(embeddings, emb_np):
    ids, mat = emb_np
    q = mat[3].tolist()
    got = knn(
        embeddings,
        q,
        metric="dot",
        k=5,
        vec_col="embedding",
        id_col="vec_id",
        flt={"must": [{"key": "label", "match": {"value": 2}}]},
        score_threshold=0.0,
    ).collect()
    labels = {r["label"] for r in got}
    assert labels == {2}
    assert all(r["score"] > 0.0 for r in got)


@pytest.mark.parametrize("strategy", ["window", "partial"])
def test_knn_batch(embeddings, emb_np, strategy, spark):
    ids, mat = emb_np
    queries = spark.createDataFrame(
        [(int(ids[i]), mat[i].tolist()) for i in range(4)], "qid long, qvec array<double>"
    )
    got = knn_batch(
        embeddings,
        queries,
        metric="cosine",
        k=5,
        vec_col="embedding",
        id_col="vec_id",
        strategy=strategy,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["score"]))
    assert set(by_q) == {int(ids[i]) for i in range(4)}
    for i in range(4):
        exp = oracle_topk(ids, mat, mat[i], "cosine", 5)
        rows = sorted(by_q[int(ids[i])])
        assert [(v, pytest.approx(s, rel=1e-8)) for _, v, s in rows] == exp


def test_knn_offset(embeddings, emb_np):
    ids, mat = emb_np
    q = mat[0].tolist()
    full = oracle_topk(ids, mat, q, "dot", 10)
    got = knn(
        embeddings, q, metric="dot", k=5, offset=5, vec_col="embedding", id_col="vec_id"
    ).select("vec_id").collect()
    assert [r["vec_id"] for r in got] == [i for i, _ in full[5:10]]


def test_knn_single_arrow_path_matches_column_path(embeddings, emb_np):
    ids, mat = emb_np
    q = mat[3].tolist()
    for metric in ("cosine", "euclid"):
        col_path = knn(embeddings, q, metric=metric, k=8, vec_col="embedding",
                       id_col="vec_id", select=["vec_id", "score"]).collect()
        arrow_path = knn(embeddings, q, metric=metric, k=8, vec_col="embedding",
                         id_col="vec_id", select=["vec_id", "score"],
                         arrow_dispatch_bytes=0).collect()
        assert [r["vec_id"] for r in arrow_path] == [r["vec_id"] for r in col_path]
        for a, c in zip(arrow_path, col_path):
            assert a["score"] == pytest.approx(c["score"], rel=1e-9)


def test_knn_single_arrow_with_filter_threshold_offset(embeddings, emb_np):
    ids, mat = emb_np
    q = mat[0].tolist()
    kw = dict(metric="cosine", k=5, vec_col="embedding", id_col="vec_id",
              flt={"must": [{"key": "label", "match": {"any": [0, 1, 2]}}]},
              score_threshold=0.0, offset=2, select=["vec_id", "label", "score"])
    col_path = knn(embeddings, q, **kw).collect()
    arrow_path = knn(embeddings, q, **kw, arrow_dispatch_bytes=0).collect()
    assert [(r["vec_id"], r["label"]) for r in arrow_path] == \
           [(r["vec_id"], r["label"]) for r in col_path]


def test_knn_batch_auto_dispatch(embeddings):
    """strategy='auto' mirrors the single-query size dispatch: window for
    small corpora, matmul past the (bytes * n_queries) crossover — results
    identical either way."""
    from pyspark.sql import functions as F

    from qdrant_spark.operators import knn as K

    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    kw = dict(metric="cosine", k=5, vec_col="embedding", id_col="vec_id")
    auto = K.knn_batch(embeddings, queries, strategy="auto", **kw)
    win = K.knn_batch(embeddings, queries, strategy="window", **kw)
    got = sorted((r["qid"], r["rank"], r["vec_id"]) for r in auto.collect())
    ref = sorted((r["qid"], r["rank"], r["vec_id"]) for r in win.collect())
    assert got == ref
    # tiny corpus stays JVM-side; huge dispatch threshold forces window
    small = K.knn_batch(embeddings, queries, strategy="auto", **kw)
    assert "mapInArrow" not in small._jdf.queryExecution().executedPlan().toString() \
        or K._plan_size_bytes(embeddings.filter(F.col("embedding").isNotNull())) * 3 >= K.ARROW_DISPATCH_BYTES
    # past the crossover the same call routes through the Arrow scorer
    old = K.ARROW_DISPATCH_BYTES
    K.ARROW_DISPATCH_BYTES = 1
    try:
        forced = K.knn_batch(embeddings, queries, strategy="auto", **kw)
        plan = forced._jdf.queryExecution().executedPlan().toString()
        assert "MapInArrow" in plan or "mapInArrow" in plan.lower()
        got_f = sorted((r["qid"], r["rank"], r["vec_id"]) for r in forced.collect())
        assert got_f == ref
    finally:
        K.ARROW_DISPATCH_BYTES = old
