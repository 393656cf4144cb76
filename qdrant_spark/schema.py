"""Collection configuration: named vectors, distances, payload schema.

Reference: a qdrant collection couples per-name vector configs
(``VectorDataConfig`` — dim, distance, storage; lib/segment/src/types.rs:
2153) with an on-demand payload schema (``PayloadSchemaType``
types.rs:2609-2618 + params in lib/segment/src/data_types/index.rs).

Spark mapping: one DataFrame column per named vector (``vec_<name>``, or a
caller-chosen column), array-normalized payload columns (a declared field
holds ``array<T>`` so scalar-or-array value semantics work uniformly), and
an optional ``<field>__isnull`` marker to distinguish JSON null from absent
(types.rs:3780-3806). ``CollectionConfig`` materializes the StructType and
validates point DataFrames against it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from qdrant_spark.functions.distances import DISTANCES

_PAYLOAD_TYPES: dict[str, T.DataType] = {
    "keyword": T.StringType(),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "datetime": T.TimestampType(),
    "uuid": T.StringType(),
    "text": T.StringType(),
    "geo": T.StructType(
        [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
    ),
}


@dataclass(frozen=True)
class VectorConfig:
    """Per-name dense/sparse/multi vector config (VectorDataConfig)."""

    dim: int
    distance: str = "cosine"
    kind: str = "dense"  # dense | sparse | multi
    #: declared quantization_config (QuantizationConfig, types.rs:1123:
    #: {"scalar": {...}} | {"product": {...}} | {"binary": {...}} |
    #: {"turbo": {...}}); ensure_vector_index builds the configured codes
    #: and dense searches then run coarse+rescore through them
    quantization: dict | None = None
    #: True when ``quantization`` was declared PER VECTOR NAME (not
    #: inherited from the collection-level default) — a collection-level
    #: PATCH leaves such vectors untouched, like the reference's
    #: per-vector config precedence (VectorParams.quantization_config
    #: wins over CollectionParams.quantization_config)
    quant_own: bool = False
    #: declared coarse-index params for this vector (the engine-side
    #: analogue of the reference's per-vector HNSW config,
    #: VectorParams.hnsw_config): for multivectors
    #: {"n_clusters", "nprobe", "candidates", "full_scan_threshold"},
    #: for dense {"n_clusters"}; ensure_vector_index reads these the
    #: way it reads quantization_config, explicit kwargs win
    index_params: dict | None = None

    def __post_init__(self):
        if self.distance not in DISTANCES:
            raise ValueError(f"unknown distance {self.distance!r}")
        if self.kind not in ("dense", "sparse", "multi"):
            raise ValueError(f"unknown vector kind {self.kind!r}")

    @property
    def spark_type(self) -> T.DataType:
        if self.kind == "dense":
            return T.ArrayType(T.FloatType())
        if self.kind == "multi":
            return T.ArrayType(T.ArrayType(T.FloatType()))
        return T.StructType(
            [
                T.StructField("indices", T.ArrayType(T.IntegerType())),
                T.StructField("values", T.ArrayType(T.FloatType())),
            ]
        )


@dataclass(frozen=True)
class PayloadField:
    """Declared payload field (PayloadSchemaType); ``array=True`` is the
    default because any qdrant payload value may be scalar OR array."""

    type: str
    array: bool = True
    nullable_marker: bool = False  # adds <name>__isnull for is_null checks

    @property
    def spark_type(self) -> T.DataType:
        base = _PAYLOAD_TYPES[self.type]
        return T.ArrayType(base) if self.array else base


@dataclass
class CollectionConfig:
    """A collection = id + named vectors + declared payload fields."""

    vectors: dict[str, VectorConfig]
    payload: dict[str, PayloadField] = field(default_factory=dict)
    id_type: str = "string"  # string holds u64-style digits or UUIDs

    def vector_col(self, name: str = "") -> str:
        return f"vec_{name}" if name else "vec"

    def to_struct_type(self) -> T.StructType:
        fields = [
            T.StructField("id", _PAYLOAD_TYPES["integer"]
                          if self.id_type == "integer" else T.StringType(), False),
            T.StructField("version", T.LongType()),
        ]
        for name, vc in self.vectors.items():
            fields.append(T.StructField(self.vector_col(name), vc.spark_type))
        for name, pf in self.payload.items():
            fields.append(T.StructField(name, pf.spark_type))
            if pf.nullable_marker:
                fields.append(T.StructField(f"{name}__isnull", T.BooleanType()))
        return T.StructType(fields)

    def validate(self, df: DataFrame) -> list[str]:
        """Schema drift report: missing / type-mismatched columns."""
        problems = []
        want = {f.name: f.dataType for f in self.to_struct_type().fields}
        have = {f.name: f.dataType for f in df.schema.fields}
        for name, typ in want.items():
            if name not in have:
                problems.append(f"missing column {name} ({typ.simpleString()})")
            elif have[name] != typ:
                problems.append(
                    f"column {name}: expected {typ.simpleString()},"
                    f" got {have[name].simpleString()}"
                )
        return problems
