"""Packed vector datatypes (float16/uint8): exact-at-storage-precision
KNN must track the float32 exact scan, and the packed column must actually
be small (the scan-bandwidth contract)."""

from __future__ import annotations

import numpy as np
import pytest

from qdrant_spark.operators.datatypes import (
    knn_batch_packed, knn_packed, pack_vectors,
)
from qdrant_spark.operators.knn import knn


@pytest.fixture(scope="module")
def f16(embeddings):
    p = pack_vectors(embeddings, vec_col="embedding", id_col="vec_id",
                     dtype="float16")
    p.df = p.df.cache()
    p.df.count()
    return p


@pytest.fixture(scope="module")
def u8(embeddings):
    p = pack_vectors(embeddings, vec_col="embedding", id_col="vec_id",
                     dtype="uint8")
    p.df = p.df.cache()
    p.df.count()
    return p


def _exact(embeddings, q, metric, k):
    return [(r["vec_id"], r["score"]) for r in
            knn(embeddings, q, metric=metric, k=k, vec_col="embedding",
                id_col="vec_id", select=["vec_id", "score"]).collect()]


def test_packed_column_sizes(f16, u8):
    dim = f16.dim
    r16 = f16.df.limit(1).collect()[0]
    r8 = u8.df.limit(1).collect()[0]
    assert len(r16["__packed"]) == 2 * dim
    assert len(r8["__packed"]) == dim


@pytest.mark.parametrize("metric", ["cosine", "euclid"])
def test_f16_matches_exact_ids(embeddings, f16, metric):
    """f16 roundoff is ~1e-3 relative — ids of a well-separated top-10
    match the float32 scan, scores within 2e-3."""
    q = list(embeddings.limit(1).collect()[0]["embedding"])
    exact = _exact(embeddings, q, metric, 10)
    got = [(r["vec_id"], r["score"]) for r in
           knn_packed(f16, q, metric=metric, k=10).collect()]
    # near-ties may swap ranks at f16 precision; the SET must agree to >=9
    # and aligned scores stay within f16 roundoff
    assert len({g[0] for g in got} & {e[0] for e in exact}) >= 9
    assert got[0][0] == exact[0][0]
    assert all(abs(g[1] - e[1]) < 2e-3 for g, e in zip(got, exact))


def test_u8_top10_overlap(embeddings, u8):
    q = list(embeddings.limit(1).collect()[0]["embedding"])
    exact = {e[0] for e in _exact(embeddings, q, "cosine", 10)}
    got = {r["vec_id"] for r in knn_packed(u8, q, metric="cosine", k=10).collect()}
    assert len(exact & got) >= 8


def test_u8_decode_roundtrip_error_bound(embeddings, u8):
    """Every decoded component is within half a code step of the input."""
    step = (u8.hi - u8.lo) / 255.0
    row = u8.df.limit(1).collect()[0]
    dec = np.frombuffer(row["__packed"], dtype=np.uint8).astype(np.float64) \
        * step + u8.lo
    orig = np.array(list(row["embedding"]), dtype=np.float64)
    assert np.abs(dec - orig).max() <= step / 2 + 1e-12


def test_packed_batch_and_filter(spark, embeddings, f16):
    qrows = embeddings.limit(4).collect()
    queries = spark.createDataFrame(
        [(r["vec_id"], list(r["embedding"])) for r in qrows],
        "qid: long, qvec: array<float>",
    )
    out = knn_batch_packed(f16, queries, metric="cosine", k=5).collect()
    assert len(out) == 4 * 5
    flt = {"must": [{"key": "label", "range": {"lte": 5}}]}
    q = list(qrows[0]["embedding"])
    got = knn_packed(f16, q, metric="cosine", k=5, flt=flt).collect()
    labels = {r["label"] for r in embeddings.filter(
        embeddings.vec_id.isin([g["vec_id"] for g in got])).select("label").collect()}
    assert len(got) == 5 and all(l <= 5 for l in labels)


@pytest.fixture(scope="module")
def f32(embeddings):
    p = pack_vectors(embeddings, vec_col="embedding", id_col="vec_id",
                     dtype="float32")
    p.df = p.df.select("vec_id", "__packed").cache()
    p.df.count()
    return p


@pytest.mark.parametrize("metric", ["cosine", "euclid", "dot"])
def test_f32_lossless(embeddings, f32, metric):
    """float32 packing is bit-lossless: ids AND scores match the plain
    array<float> scan exactly (both decode the same f32 values to f64)."""
    q = list(embeddings.limit(2).collect()[1]["embedding"])
    exact = _exact(embeddings, q, metric, 10)
    got = [(r["vec_id"], r["score"]) for r in
           knn_packed(f32, q, metric=metric, k=10).collect()]
    assert [g[0] for g in got] == [e[0] for e in exact]
    assert all(abs(g[1] - e[1]) < 1e-12 for g, e in zip(got, exact))


def test_f32_packed_width(f32):
    row = f32.df.limit(1).collect()[0]
    assert len(row["__packed"]) == 4 * f32.dim


def test_self_query_top1(embeddings, u8, f16):
    r = embeddings.limit(3).collect()[2]
    for p in (u8, f16):
        got = knn_packed(p, list(r["embedding"]), metric="cosine", k=3).collect()
        assert got[0]["vec_id"] == r["vec_id"]
