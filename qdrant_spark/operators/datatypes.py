"""Vector storage datatypes: float32 / float16 / uint8 packed columns.

Reference: ``VectorDataType {float32, float16, uint8}``
(lib/segment/src/data_types/vectors.rs VectorStorageDatatype,
configured per collection in types.rs VectorParams.datatype) — vectors
stored at reduced precision and scored as-is; unlike quantization there
is no rescore stage, the stored precision IS the search precision.

Spark mapping: a ``binary`` column holding the packed little-endian values
(4 bytes/dim f32, 2 bytes/dim f16, 1 byte/dim u8) next to — or instead
of — the float32 array. At 100 TB the win is scan bandwidth: the KNN path
reads the packed column only (Parquet column pruning), and the Arrow
scorer decodes each batch straight out of the value buffer into the
float64 block matmul via the ``vec_decode`` hook of ``knn._matmul_knn`` —
one ``np.frombuffer`` per batch, no per-row Python.

``float32`` packing is LOSSLESS — same scores as the ``array<float>``
column bit-for-bit. Its point is the physical layout, not local wall
clock: on local[32] at 512k x 384d the three layouts measure within
noise of each other run-to-run (r7 probe, median-of-5 batch-64 scans:
array-cache 1.03 s, parquet 1.15 s, packed-cache 1.19 s; an earlier
round measured the opposite ordering — the differences are environment-
dependent and should not be cited as a ranking). What the packed layout
buys deterministically: (a) cache FOOTPRINT — one flat byte buffer per
row vs a boxed object array, ~2-3x smaller in the deserialized store,
so a RAM-resident corpus (the reference's deployment mode: contiguous
f32 blobs hot in memory) fits correspondingly more vectors per
executor; (b) zero-copy decode — the Arrow scorer np.frombuffer's each
batch straight from the value buffer, no per-row unboxing on the
scoring path.

uint8 uses a driver-fitted global affine range (lo, hi): encode
``byte = floor((v - lo) * 255 / (hi - lo) + 0.5)`` clamped to [0, 255],
decode ``v ≈ byte * (hi - lo) / 255 + lo`` — floor(x+0.5) rounding so a
SQL oracle reproduces it exactly (DuckDB round() matches; NumPy's
``np.round`` half-to-even would not).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qdrant_spark.operators.knn import _matmul_knn, score_order


@dataclass
class PackedVectors:
    """Corpus with a packed vector column ``__packed`` (binary)."""

    df: DataFrame
    dtype: str             # "float16" | "uint8"
    dim: int
    vec_col: str           # original float column name (may be dropped)
    id_col: str
    lo: float = 0.0        # uint8 affine range
    hi: float = 1.0


def pack_vectors(
    points: DataFrame,
    *,
    vec_col: str = "vec",
    id_col: str = "id",
    dtype: str = "float16",
) -> PackedVectors:
    """Add ``__packed``: the vector re-encoded at storage precision."""
    from pyspark.sql.functions import pandas_udf

    if dtype not in ("float32", "float16", "uint8"):
        raise ValueError(
            f"dtype must be float32, float16 or uint8 — got {dtype!r}")
    base = points.filter(F.col(vec_col).isNotNull())
    first = base.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = int(first["d"])

    lo = hi = 0.0
    if dtype == "uint8":
        row = base.select(
            F.min(F.array_min(vec_col)).alias("lo"),
            F.max(F.array_max(vec_col)).alias("hi"),
        ).first()
        lo, hi = float(row["lo"]), float(row["hi"])
        if hi - lo < 1e-12:
            hi = lo + 1e-12

    lo_, hi_ = lo, hi

    def _enc(s):
        if len(s) == 0:
            return pd.Series([], dtype=object)
        V = np.array(s.tolist(), dtype=np.float64)
        if dtype == "float32":
            P = V.astype("<f4")
        elif dtype == "float16":
            P = V.astype("<f2")
        else:
            code = np.floor((V - lo_) * 255.0 / (hi_ - lo_) + 0.5)
            P = np.clip(code, 0.0, 255.0).astype(np.uint8)
        return pd.Series([row.tobytes() for row in P])

    enc = pandas_udf(_enc, "binary")
    df = base.withColumn("__packed", enc(F.col(vec_col)))
    return PackedVectors(df=df, dtype=dtype, dim=dim, vec_col=vec_col,
                         id_col=id_col, lo=lo, hi=hi)


def _flat_bytes(vec) -> np.ndarray:
    """Contiguous value bytes of an Arrow binary array. Fast path slices
    the value buffer directly (zero-copy — a python-level ``b"".join``
    over 10k bytes objects per batch costs a measurable memcpy+GC on the
    KNN hot path); falls back to join when the array carries nulls."""
    import pyarrow as pa

    if isinstance(vec, pa.ChunkedArray):
        vec = vec.combine_chunks()
    if vec.null_count != 0:
        # pack_vectors drops null vectors at build; a null here means the
        # packed column was built elsewhere — refuse rather than silently
        # misalign ids against the decoded matrix
        raise ValueError("packed vector column contains nulls")
    off_dtype = np.int64 if pa.types.is_large_binary(vec.type) else np.int32
    offs = np.frombuffer(vec.buffers()[1], dtype=off_dtype)[
        vec.offset: vec.offset + len(vec) + 1
    ]
    data = np.frombuffer(vec.buffers()[2], dtype=np.uint8)
    return data[offs[0]:offs[-1]]


def _decoder(dtype: str, dim: int, lo: float, hi: float):
    if dtype == "float32":
        def dec(vec, n):
            flat = _flat_bytes(vec).view("<f4")
            return flat.reshape(n, dim).astype(np.float64)
    elif dtype == "float16":
        def dec(vec, n):
            flat = _flat_bytes(vec).view("<f2")
            return flat.reshape(n, dim).astype(np.float64)
    else:
        scale = (hi - lo) / 255.0

        def dec(vec, n):
            flat = _flat_bytes(vec)
            return flat.reshape(n, dim).astype(np.float64) * scale + lo
    return dec


def knn_packed(
    packed: PackedVectors,
    query_vector: Sequence[float],
    *,
    metric: str = "cosine",
    k: int = 10,
    flt: dict[str, Any] | None = None,
    score_threshold: float | None = None,
) -> DataFrame:
    """Exact KNN over the packed column: scores computed on the decoded
    storage-precision values (the reference scores f16/u8 storages
    directly — no rescore stage). One Arrow scan of the binary column."""
    return knn_batch_packed(
        packed, None, metric=metric, k=k, flt=flt,
        score_threshold=score_threshold,
        _q_data=([0], np.asarray([[float(x) for x in query_vector]])),
    ).select(packed.id_col, "score")


def knn_batch_packed(
    packed: PackedVectors,
    queries: DataFrame | None,
    *,
    metric: str = "cosine",
    k: int = 10,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    flt: dict[str, Any] | None = None,
    score_threshold: float | None = None,
    _q_data=None,
) -> DataFrame:
    """Batched exact KNN over the packed column (block matmul with the
    binary-decode hook)."""
    from qdrant_spark.filters import apply_filter

    pts = packed.df
    if flt is not None:
        pts = apply_filter(pts, flt)
    out = _matmul_knn(
        pts, queries, metric=metric, k=k, vec_col="__packed",
        id_col=packed.id_col, qid_col=qid_col, qvec_col=qvec_col,
        score_threshold=score_threshold, q_data=_q_data,
        vec_decode=_decoder(packed.dtype, packed.dim, packed.lo, packed.hi),
    )
    order = [F.col(qid_col)] + list(score_order(metric, id_col=packed.id_col))
    return out.select(qid_col, packed.id_col, "score").orderBy(*order)
