"""Recommend / discover / context / feedback scoring vs NumPy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from qdrant_spark.operators.matrix import distance_matrix
from qdrant_spark.operators.recommend import (
    context,
    discover,
    recommend_avg_vector,
    recommend_best_score,
    recommend_sum_scores,
    relevance_feedback,
)

F32_EPS = float(np.finfo(np.float32).eps)


@pytest.fixture(scope="module")
def emb(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def cos(mat, q):
    return (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))


def topk(ids, scores, k):
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
    return [(int(ids[i]), float(scores[i])) for i in order[:k]]


def fast_sigmoid(x):
    return x / (1.0 + np.abs(x))


def scaled_fast_sigmoid(x):
    return 0.5 * (fast_sigmoid(x) + 1.0)


def check(df, exp):
    got = [(r[0], r[1]) for r in df.select("vec_id", "score").collect()]
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9, abs=1e-12)


def test_avg_vector(embeddings, emb):
    ids, mat = emb
    pos, neg = [mat[1].tolist(), mat[2].tolist()], [mat[3].tolist()]
    got = recommend_avg_vector(
        embeddings, pos, neg, metric="dot", k=8, vec_col="embedding", id_col="vec_id"
    )
    q = mat[[1, 2]].mean(axis=0) * 2 - mat[3]
    check(got, topk(ids, mat @ q, 8))


def test_best_score(embeddings, emb):
    ids, mat = emb
    pos, neg = [mat[1].tolist(), mat[2].tolist()], [mat[3].tolist()]
    got = recommend_best_score(
        embeddings, pos, neg, metric="cosine", k=8, vec_col="embedding", id_col="vec_id"
    )
    mp = np.maximum(cos(mat, mat[1]), cos(mat, mat[2]))
    mn = cos(mat, mat[3])
    s = np.where(mp > mn, scaled_fast_sigmoid(mp), -scaled_fast_sigmoid(mn))
    check(got, topk(ids, s, 8))


def test_sum_scores(embeddings, emb):
    ids, mat = emb
    got = recommend_sum_scores(
        embeddings,
        [mat[1].tolist(), mat[2].tolist()],
        [mat[3].tolist()],
        metric="dot",
        k=8,
        vec_col="embedding",
        id_col="vec_id",
    )
    s = mat @ mat[1] + mat @ mat[2] - mat @ mat[3]
    check(got, topk(ids, s, 8))


def test_discover(embeddings, emb):
    ids, mat = emb
    got = discover(
        embeddings,
        mat[0].tolist(),
        [(mat[1].tolist(), mat[2].tolist()), (mat[3].tolist(), mat[4].tolist())],
        metric="dot",
        k=8,
        vec_col="embedding",
        id_col="vec_id",
    )
    rank = np.sign(mat @ mat[1] - mat @ mat[2]) + np.sign(mat @ mat[3] - mat @ mat[4])
    s = rank + scaled_fast_sigmoid(mat @ mat[0])
    check(got, topk(ids, s, 8))


def test_context(embeddings, emb):
    ids, mat = emb
    got = context(
        embeddings,
        [(mat[1].tolist(), mat[2].tolist())],
        metric="dot",
        k=8,
        vec_col="embedding",
        id_col="vec_id",
    )
    diff = mat @ mat[1] - mat @ mat[2] - F32_EPS
    s = fast_sigmoid(np.minimum(diff, 0.0))
    check(got, topk(ids, s, 8))


def test_relevance_feedback(embeddings, emb):
    ids, mat = emb
    got = relevance_feedback(
        embeddings,
        mat[0].tolist(),
        [(mat[1].tolist(), mat[2].tolist(), 0.5)],
        a=2.0,
        metric="dot",
        k=8,
        vec_col="embedding",
        id_col="vec_id",
    )
    s = 2.0 * (mat @ mat[0]) + 0.5 * (mat @ mat[1] - mat @ mat[2])
    check(got, topk(ids, s, 8))


def test_distance_matrix_shape(embeddings):
    out = distance_matrix(
        embeddings,
        sample_size=10,
        limit_per_sample=3,
        metric="cosine",
        vec_col="embedding",
        id_col="vec_id",
    ).collect()
    by_a = {}
    for r in out:
        assert r["id_a"] != r["id_b"]
        by_a.setdefault(r["id_a"], []).append(r)
    assert len(by_a) == 10
    for rows in by_a.values():
        assert len(rows) == 3
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]


def test_distance_matrix_plans_without_corpus_rescan(embeddings):
    """The bounded sample is collected once into a LocalRelation, so the
    final pairs/offsets plans must not rescan the corpus — the offsets
    wrapper used to re-evaluate the sample subtree 7x (r14)."""
    from qdrant_spark.operators.matrix import distance_matrix_offsets

    kw = dict(sample_size=10, limit_per_sample=3, metric="cosine",
              vec_col="embedding", id_col="vec_id", seed=7)
    for df in (distance_matrix(embeddings, **kw),
               distance_matrix_offsets(embeddings, **kw)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FileScan" not in plan and "Scan parquet" not in plan
        assert "LocalTableScan" in plan


def test_distance_matrix_large_sample_matches_numpy(embeddings):
    """sample_size > 100 switches to the Arrow pair scorer; verify it
    against a direct NumPy recomputation of the same sample."""
    from qdrant_spark.operators.matrix import distance_matrix
    from qdrant_spark.operators.points import sample as sample_points

    from pyspark.sql import functions as F

    got = distance_matrix(
        embeddings, sample_size=120, limit_per_sample=3, metric="cosine",
        vec_col="embedding", id_col="vec_id", seed=11,
    ).collect()
    smp = (
        sample_points(embeddings.filter(F.col("embedding").isNotNull()), 120, seed=11)
        .select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in smp])
    V = np.array([list(r["embedding"]) for r in smp], dtype=np.float64)
    S = (V @ V.T) / (
        np.linalg.norm(V, axis=1)[:, None] * np.linalg.norm(V, axis=1)[None, :]
    )
    assert len(got) == 120 * 3
    for r in got:
        i = int(np.where(ids == r["id_a"])[0][0])
        order = sorted(range(len(ids)), key=lambda j: (-S[i, j], ids[j]))
        expect = [ids[j] for j in order if ids[j] != r["id_a"]][:3]
        assert r["id_b"] == expect[r["rank"] - 1]


def test_distance_matrix_offsets_csr_consistency(embeddings):
    """The CSR offsets form must be an exact re-encoding of the pairs form:
    ids ascending, offsets indexing into ids, scores row-major by rank."""
    from qdrant_spark.operators.matrix import distance_matrix_offsets

    kw = dict(sample_size=10, limit_per_sample=3, metric="cosine",
              vec_col="embedding", id_col="vec_id", seed=7)
    pairs = distance_matrix(embeddings, **kw).collect()
    row = distance_matrix_offsets(embeddings, **kw).collect()
    assert len(row) == 1
    r = row[0]
    ids = list(r["ids"])
    assert ids == sorted(ids)
    n = len(pairs)
    assert len(r["offsets_row"]) == len(r["offsets_col"]) == len(r["scores"]) == n
    got = {
        (ids[r["offsets_row"][i]], ids[r["offsets_col"][i]], round(r["scores"][i], 9))
        for i in range(n)
    }
    expect = {(p["id_a"], p["id_b"], round(p["score"], 9)) for p in pairs}
    assert got == expect
    # row-major: offsets_row is non-decreasing, and within a row scores
    # follow rank order (descending for cosine)
    assert list(r["offsets_row"]) == sorted(r["offsets_row"])
    by_row = {}
    for i in range(n):
        by_row.setdefault(r["offsets_row"][i], []).append(r["scores"][i])
    for scores in by_row.values():
        assert scores == sorted(scores, reverse=True)


def test_arrow_dispatch_matches_column_path(embeddings, emb):
    """Forced Arrow dispatch (arrow_dispatch_bytes=0): the one-pass
    score_block + NumPy composition must reproduce the interpreted Column
    path bit-for-bit on ids and to fp tolerance on scores, for every
    operator in the family and both a larger-is-better and cosine metric."""
    ids, mat = emb
    pos = [mat[1].tolist(), mat[2].tolist()]
    neg = [mat[3].tolist()]
    pairs = [(mat[1].tolist(), mat[2].tolist()),
             (mat[3].tolist(), mat[4].tolist())]
    wpairs = [(mat[1].tolist(), mat[2].tolist(), 0.5),
              (mat[3].tolist(), mat[4].tolist(), 2.0)]
    kw = dict(k=9, vec_col="embedding", id_col="vec_id")
    cases = [
        (recommend_best_score, (embeddings, pos, neg), {"metric": "cosine"}),
        (recommend_best_score, (embeddings, pos, None), {"metric": "dot"}),
        (recommend_sum_scores, (embeddings, pos, neg), {"metric": "dot"}),
        (discover, (embeddings, mat[0].tolist(), pairs), {"metric": "dot"}),
        (context, (embeddings, pairs), {"metric": "cosine"}),
        (relevance_feedback, (embeddings, mat[0].tolist(), wpairs),
         {"metric": "dot", "a": 2.0}),
    ]
    for fn, args, extra in cases:
        col_path = fn(*args, **kw, **extra).select("vec_id", "score")
        arrow = fn(*args, **kw, **extra,
                   arrow_dispatch_bytes=0).select("vec_id", "score")
        want = [(r[0], r[1]) for r in col_path.collect()]
        got = [(r[0], r[1]) for r in arrow.collect()]
        assert [g[0] for g in got] == [w[0] for w in want], fn.__name__
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-9, abs=1e-12), fn.__name__


def test_arrow_dispatch_respects_filter(embeddings, emb):
    ids, mat = emb
    pos = [mat[1].tolist()]
    flt = {"must": [{"key": "vec_id", "range": {"lt": 200}}]}
    kw = dict(k=5, vec_col="embedding", id_col="vec_id", flt=flt,
              metric="dot")
    want = [(r[0], r[1]) for r in recommend_sum_scores(
        embeddings, pos, **kw).select("vec_id", "score").collect()]
    got = [(r[0], r[1]) for r in recommend_sum_scores(
        embeddings, pos, arrow_dispatch_bytes=0,
        **kw).select("vec_id", "score").collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert all(i < 200 for i, _ in got)
