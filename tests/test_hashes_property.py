"""Property tests: the Arrow minhash must be bit-identical to the Column
implementation on arbitrary token arrays (that equivalence is what lets the
same DuckDB oracle gate both), and the TQ pack/rotate helpers must
round-trip on arbitrary shapes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qdrant_spark.functions.hashes import (
    MERSENNE_P, minhash_from_hashed, minhash_from_hashed_arrow, minhash_params,
)
from qdrant_spark.operators.quantize import (
    _tq_pack, _tq_rotate, _tq_rotation_params, _tq_unpack, _tq_unrotate,
)

token_arrays = st.lists(
    st.lists(st.integers(min_value=0, max_value=MERSENNE_P - 1),
             min_size=0, max_size=12),
    min_size=1, max_size=8,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(arrays=token_arrays)
def test_arrow_minhash_equals_column_minhash(spark, arrays):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrays)],
                               "i: long, hs: array<bigint>")
    col = df.select("i", minhash_from_hashed(F.col("hs"), 6).alias("s")) \
        .orderBy("i").collect()
    arr = df.select("i", minhash_from_hashed_arrow(F.col("hs"), 6).alias("s")) \
        .orderBy("i").collect()
    for c, a in zip(col, arr):
        cs = None if c["s"] is None else list(c["s"])
        as_ = None if a["s"] is None else list(a["s"])
        assert cs == as_, (c["i"], cs, as_)


def test_minhash_reference_values():
    """Pin the permutation family against a from-scratch evaluation."""
    hs = [12345, 999999, 7]
    want = [min((a * h + b) % MERSENNE_P for h in hs)
            for a, b in minhash_params(4)]
    rng_check = [(a * 12345 + b) % MERSENNE_P for a, b in minhash_params(4)]
    assert all(w <= r for w, r in zip(want, rng_check))


@settings(max_examples=20, deadline=None)
@given(
    bpc=st.sampled_from([1, 2, 4]),
    n=st.integers(min_value=1, max_value=6),
    log_d=st.integers(min_value=3, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_tq_pack_rotate_roundtrip_property(bpc, n, log_d, seed):
    d = 1 << log_d
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2 ** bpc, size=(n, d)).astype(np.uint8)
    assert (_tq_unpack(_tq_pack(codes, bpc), bpc, d) == codes).all()
    params = _tq_rotation_params(d, seed)
    V = rng.normal(size=(n, d))
    R = _tq_rotate(V, params)
    assert np.allclose(np.linalg.norm(R, axis=1), np.linalg.norm(V, axis=1))
    assert np.allclose(_tq_unrotate(R, params), V)
