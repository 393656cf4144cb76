"""Collection catalog: name -> DataFrame registry with alias operations.

Reference: collection metadata ops (CreateCollection/DeleteCollection and
the alias family CreateAlias/DeleteAlias/RenameAlias —
lib/storage/src/content_manager/collection_meta_ops.rs:45-81, served by
``POST /collections/aliases``, src/actix/api/collections_api.rs). Aliases
give zero-downtime switchover: clients query ``prod``, the operator builds
``docs_v2``, then one alias swap repoints ``prod`` — the same pattern as a
view repoint in a Spark catalog.

Spark-first shape: this is deliberately a THIN, driver-side name map — the
data plane stays DataFrames/parquet. ``register`` accepts a DataFrame or a
callable returning one (lazy mount of a PointsTable.read). The catalog is
Mapping-like, so it plugs directly into ``QueryPlanner(collections=...)``
and ``lookup_from`` resolution.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Payload field index schema types (PayloadSchemaType + per-type params,
# lib/segment/src/data_types/index.rs). ``is_tenant`` exists on keyword/uuid
# ("used for tenant optimization"), ``is_principal`` on integer/float/
# datetime ("use this key to organize storage of the collection data").
FIELD_SCHEMA_TYPES = frozenset(
    {"keyword", "integer", "float", "bool", "geo", "datetime", "text", "uuid"}
)
_TENANT_TYPES = frozenset({"keyword", "uuid"})
_PRINCIPAL_TYPES = frozenset({"integer", "float", "datetime"})


@dataclass(frozen=True)
class FieldIndex:
    """A registered payload field index (FieldIndexOperations,
    lib/shard/src/operations/mod.rs:207).

    In the reference this triggers building an in-memory/on-disk per-field
    index structure; the Spark analogue is (a) typed schema registration the
    filter compiler and planners can consult, and (b) a physical-layout
    directive: tenant fields become partition columns, principal fields
    become within-partition sort keys — which turns parquet min/max row-group
    stats and directory pruning into the reference's index-accelerated
    filtering."""

    field: str
    schema_type: str
    is_tenant: bool = False
    is_principal: bool = False
    params: dict[str, Any] = dc_field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.schema_type not in FIELD_SCHEMA_TYPES:
            raise ValueError(f"unknown field schema type {self.schema_type!r}")
        if self.is_tenant and self.schema_type not in _TENANT_TYPES:
            raise ValueError(
                f"is_tenant is only valid for {sorted(_TENANT_TYPES)} indexes")
        if self.is_principal and self.schema_type not in _PRINCIPAL_TYPES:
            raise ValueError(
                f"is_principal is only valid for {sorted(_PRINCIPAL_TYPES)} indexes")


def field_index_stats(df: DataFrame, indexes: list[FieldIndex]) -> DataFrame:
    """Materialize per-indexed-field statistics in ONE scan: count, nulls,
    exact distinct, and min/max (strings for keyword-ish fields, numbers for
    numeric/datetime — datetime as epoch seconds).

    This is the build step of "create field index" re-expressed Spark-first:
    the reference builds value->points postings; the columnar analogue is
    field stats that drive partition pruning and row-group skipping, kept as
    a small table. One wide agg → unpivot, so adding fields does not add
    scans; at 100 TB this is a single map-side-combined pass."""
    aggs: list = []
    for fi in indexes:
        c, numeric = F.col(fi.field), fi.schema_type in _PRINCIPAL_TYPES | {"bool"}
        num = c.cast("double")  # datetime → epoch seconds, bool → 0/1
        aggs.append(F.struct(
            F.lit(fi.field).alias("field"),
            F.lit(fi.schema_type).alias("schema_type"),
            F.count(c).alias("n"),
            (F.count(F.lit(1)) - F.count(c)).alias("nulls"),
            F.countDistinct(c).alias("n_distinct"),
            (F.min(c).cast("string") if not numeric else F.lit(None).cast("string")).alias("min_str"),
            (F.max(c).cast("string") if not numeric else F.lit(None).cast("string")).alias("max_str"),
            (F.min(num) if numeric else F.lit(None).cast("double")).alias("min_num"),
            (F.max(num) if numeric else F.lit(None).cast("double")).alias("max_num"),
        ))
    row = df.agg(F.array(*aggs).alias("__s"))
    return row.select(F.explode("__s").alias("s")).select("s.*")


class CollectionCatalog(Mapping):
    """Collections and aliases share one namespace (as in the reference:
    alias resolution falls back to collection name, and an alias may not
    shadow an existing collection)."""

    def __init__(self) -> None:
        self._collections: dict[str, DataFrame | Callable[[], DataFrame]] = {}
        self._aliases: dict[str, str] = {}  # alias -> collection name
        self._field_indexes: dict[str, dict[str, FieldIndex]] = {}
        self._strict_modes: dict[str, "StrictModeConfig"] = {}

    # -- strict mode -------------------------------------------------------

    def set_strict_mode(self, collection: str, config: "StrictModeConfig") -> None:
        """Attach a strict-mode config to a collection (resolves aliases);
        consulted by catalog-side operations such as create_field_index."""
        name = self._aliases.get(collection, collection)
        if name not in self._collections:
            raise KeyError(f"unknown collection {collection!r}")
        self._strict_modes[name] = config

    def get_strict_mode(self, collection: str) -> "StrictModeConfig | None":
        name = self._aliases.get(collection, collection)
        return self._strict_modes.get(name)

    # -- collection ops ----------------------------------------------------

    def register(self, name: str,
                 df: DataFrame | Callable[[], DataFrame]) -> None:
        if name in self._aliases:
            raise ValueError(f"name {name!r} is already an alias")
        self._collections[name] = df

    def drop(self, name: str) -> None:
        """Drop a collection and any aliases pointing at it (the reference
        deletes dangling aliases with their collection)."""
        self._collections.pop(name, None)
        self._field_indexes.pop(name, None)
        for a in [a for a, c in self._aliases.items() if c == name]:
            del self._aliases[a]

    def list_collections(self) -> list[str]:
        return sorted(self._collections)

    # -- field index ops (FieldIndexOperations mod.rs:207; params
    # lib/segment/src/data_types/index.rs) ---------------------------------

    def create_field_index(self, collection: str, field: str,
                           schema_type: str = "keyword", *,
                           is_tenant: bool = False,
                           is_principal: bool = False,
                           **params: Any) -> FieldIndex:
        """Register a typed payload index on a collection. Resolves aliases.
        Replaces an existing index on the same field (the reference's
        create-index on an indexed field is an idempotent rebuild)."""
        name = self._aliases.get(collection, collection)
        if name not in self._collections:
            raise KeyError(f"unknown collection {collection!r}")
        cfg = self._strict_modes.get(name)
        if (cfg is not None and cfg.enabled
                and cfg.max_payload_index_count is not None
                and field not in self._field_indexes.get(name, {})
                and len(self._field_indexes.get(name, {}))
                >= cfg.max_payload_index_count):
            raise StrictModeError(
                f"strict mode: collection {collection!r} already has "
                f"{len(self._field_indexes[name])} payload indexes "
                f"(max_payload_index_count {cfg.max_payload_index_count})"
            )
        fi = FieldIndex(field=field, schema_type=schema_type,
                        is_tenant=is_tenant, is_principal=is_principal,
                        params=dict(params))
        self._field_indexes.setdefault(name, {})[field] = fi
        return fi

    def delete_field_index(self, collection: str, field: str) -> None:
        name = self._aliases.get(collection, collection)
        try:
            del self._field_indexes[name][field]
        except KeyError:
            raise KeyError(
                f"no index on field {field!r} of collection {collection!r}"
            ) from None

    def list_field_indexes(self, collection: str) -> dict[str, FieldIndex]:
        name = self._aliases.get(collection, collection)
        return dict(self._field_indexes.get(name, {}))

    def layout_hints(self, collection: str) -> dict[str, list[str]]:
        """Physical layout implied by the registered indexes: tenant fields
        → partition columns (directory pruning per tenant), principal fields
        → within-partition sort keys (parquet min/max row-group skipping).
        Feed ``partition_by`` to PointsTable(partition_by=...) and
        ``sort_by`` to PointsTable.optimize(zorder_by=...)."""
        idx = self.list_field_indexes(collection).values()
        return {
            "partition_by": sorted(fi.field for fi in idx if fi.is_tenant),
            "sort_by": sorted(fi.field for fi in idx if fi.is_principal),
        }

    def index_stats(self, collection: str) -> DataFrame:
        """Materialize stats for every indexed field of the collection —
        one scan regardless of index count (see field_index_stats)."""
        idx = sorted(self.list_field_indexes(collection).values(),
                     key=lambda fi: fi.field)
        if not idx:
            raise ValueError(f"no field indexes on {collection!r}")
        return field_index_stats(self.resolve(collection), idx)

    # -- alias ops (collection_meta_ops.rs:45-81) --------------------------

    def create_alias(self, alias: str, collection: str) -> None:
        """Create or REPOINT an alias — the repoint is the atomic-switchover
        primitive. The target must exist; an alias may not take a
        collection's name; alias-to-alias chains are rejected."""
        if collection not in self._collections:
            if collection in self._aliases:
                raise ValueError("alias must point at a collection, not an alias")
            raise KeyError(f"unknown collection {collection!r}")
        if alias in self._collections:
            raise ValueError(f"{alias!r} is an existing collection name")
        self._aliases[alias] = collection

    def delete_alias(self, alias: str) -> None:
        if alias not in self._aliases:
            raise KeyError(f"unknown alias {alias!r}")
        del self._aliases[alias]

    def rename_alias(self, old: str, new: str) -> None:
        if old not in self._aliases:
            raise KeyError(f"unknown alias {old!r}")
        if new in self._collections:
            raise ValueError(f"{new!r} is an existing collection name")
        self._aliases[new] = self._aliases.pop(old)

    def list_aliases(self, collection: str | None = None) -> dict[str, str]:
        if collection is None:
            return dict(self._aliases)
        return {a: c for a, c in self._aliases.items() if c == collection}

    # -- resolution / Mapping ----------------------------------------------

    def resolve(self, name: str) -> DataFrame:
        target = self._aliases.get(name, name)
        try:
            df = self._collections[target]
        except KeyError:
            raise KeyError(f"unknown collection or alias {name!r}") from None
        return df() if callable(df) else df

    def __getitem__(self, name: str) -> DataFrame:
        return self.resolve(name)

    def __contains__(self, name: object) -> bool:
        return name in self._collections or name in self._aliases

    def __iter__(self) -> Iterator[str]:
        yield from self._collections
        yield from self._aliases

    def __len__(self) -> int:
        return len(self._collections) + len(self._aliases)


class StrictModeError(ValueError):
    """A request violates the collection's strict-mode limits."""


@dataclass(frozen=True)
class StrictModeConfig:
    """Per-collection request limits (StrictModeConfig,
    lib/segment/src/types.rs:1323-1412). Every engine-applicable knob is
    enforced — request-shape caps in :func:`check_strict_mode` (including
    sparse length, multivector count, search-breadth, and collection-size
    caps when the caller supplies current sizes), index-count at
    :meth:`CollectionCatalog.create_field_index`. Only timeouts and rate
    limits remain accepted-but-unenforced: genuinely node-operational,
    governed by the Spark cluster manager here.

    ``None`` disables a check, matching the reference's Option fields."""

    enabled: bool = True
    max_query_limit: int | None = None
    unindexed_filtering_retrieve: bool | None = None
    unindexed_filtering_update: bool | None = None
    search_allow_exact: bool | None = None
    search_max_oversampling: float | None = None
    search_max_batchsize: int | None = None
    upsert_max_batchsize: int | None = None
    max_points_count: int | None = None
    filter_max_conditions: int | None = None
    condition_max_size: int | None = None
    max_payload_index_count: int | None = None
    #: per-vector-name sparse length caps (StrictModeSparseConfig,
    #: types.rs:1221-1234): {"text_sparse": 1000}
    sparse_config: Mapping[str, int] | None = None
    #: per-vector-name multivector count caps
    #: (StrictModeMultivectorConfig, types.rs:1272-1285)
    multivector_config: Mapping[str, int] | None = None
    #: search-breadth cap (search_max_hnsw_ef, types.rs:1350): enforced
    #: against params.hnsw_ef AND params.nprobe — nprobe is this engine's
    #: IVF search-breadth knob, the hnsw_ef analogue
    search_max_hnsw_ef: int | None = None
    #: collection size caps (types.rs:1370,1384) — enforced like
    #: max_points_count when the caller supplies the current sizes
    max_collection_vector_size_bytes: int | None = None
    max_collection_payload_size_bytes: int | None = None
    # accepted, not enforced (node-operational in the reference)
    max_timeout: int | None = None
    read_rate_limit: int | None = None
    write_rate_limit: int | None = None


def _walk_filter(flt: Mapping[str, Any] | None):
    """Yield every leaf condition of a Filter (nested Filters recursed)."""
    if not flt:
        return
    clauses = []
    for key in ("must", "should", "must_not"):
        v = flt.get(key)
        if v:
            clauses.extend(v if isinstance(v, list) else [v])
    if ms := flt.get("min_should"):
        clauses.extend(ms.get("conditions") or [])
    for c in clauses:
        if any(k in c for k in ("must", "should", "must_not", "min_should")):
            yield from _walk_filter(c)
        else:
            yield c


def _filter_keys(flt: Mapping[str, Any] | None) -> set[str]:
    keys = set()
    for c in _walk_filter(flt):
        if "key" in c:
            keys.add(c["key"])
        for marker in ("is_empty", "is_null"):
            if marker in c and isinstance(c[marker], Mapping):
                keys.add(c[marker].get("key"))
        if "nested" in c:
            keys.add(c["nested"].get("key"))
            keys |= _filter_keys(c["nested"].get("filter"))
    keys.discard(None)
    return keys


def check_strict_mode(
    request: Mapping[str, Any],
    config: StrictModeConfig,
    *,
    indexed_fields: set[str] | None = None,
    n_points: int | None = None,
    is_update: bool = False,
    batch: list | None = None,
    vector_size_bytes: int | None = None,
    payload_size_bytes: int | None = None,
) -> None:
    """Validate one request dict against strict-mode limits; raises
    :class:`StrictModeError` on the first violation (the reference rejects
    before planning — lib/collection/src/operations/verification).

    ``indexed_fields`` comes from the catalog's registered field indexes;
    ``batch`` is the request list for batch APIs; ``is_update`` applies the
    update-side unindexed-filtering knob."""
    if not config.enabled:
        return
    cfg = config

    def fail(msg: str) -> None:
        raise StrictModeError(f"strict mode: {msg}")

    limit = request.get("limit")
    if cfg.max_query_limit is not None and limit is not None \
            and int(limit) > cfg.max_query_limit:
        fail(f"limit {limit} > max_query_limit {cfg.max_query_limit}")
    prefetches = request.get("prefetch") or []
    if isinstance(prefetches, Mapping):
        prefetches = [prefetches]
    for p in prefetches:
        check_strict_mode(p, config, indexed_fields=indexed_fields,
                          n_points=n_points, is_update=is_update)

    if cfg.search_allow_exact is False and request.get("exact"):
        fail("exact search is disabled")
    params = request.get("params") or {}
    if cfg.search_max_hnsw_ef is not None:
        # nprobe is this engine's search-breadth knob (IVF), the hnsw_ef
        # analogue — cap both names so a migrated request is still governed
        for knob in ("hnsw_ef", "nprobe"):
            v = params.get(knob)
            if v is not None and int(v) > cfg.search_max_hnsw_ef:
                fail(f"params.{knob} {v} > "
                     f"search_max_hnsw_ef {cfg.search_max_hnsw_ef}")

    def _check_vec(name: str, vec: Any) -> None:
        """Sparse length / multivector count caps for one vector value."""
        if isinstance(vec, Mapping) and "indices" in vec:
            cap = (cfg.sparse_config or {}).get(name)
            if cap is not None and len(vec["indices"]) > cap:
                fail(f"sparse vector {name!r} has {len(vec['indices'])} "
                     f"indices > max_length {cap}")
        elif (isinstance(vec, (list, tuple)) and vec
              and isinstance(vec[0], (list, tuple))):
            cap = (cfg.multivector_config or {}).get(name)
            if cap is not None and len(vec) > cap:
                fail(f"multivector {name!r} has {len(vec)} vectors > "
                     f"max_vectors {cap}")

    if cfg.sparse_config or cfg.multivector_config:
        using = request.get("using", "")
        q = request.get("query")
        if isinstance(q, Mapping) and "nearest" in q:
            _check_vec(using, q["nearest"])
        elif "vector" in request:  # legacy search shape
            _check_vec(using, request["vector"])
        if is_update:
            for pt in batch or []:
                if not isinstance(pt, Mapping):
                    continue
                vecs = pt.get("vectors")
                if isinstance(vecs, Mapping):
                    for name, v in vecs.items():
                        _check_vec(name, v)
                elif pt.get("vector") is not None:
                    _check_vec(using, pt["vector"])
    osamp = ((request.get("params") or {}).get("quantization") or {}) \
        .get("oversampling") or request.get("oversampling")
    if cfg.search_max_oversampling is not None and osamp is not None \
            and float(osamp) > cfg.search_max_oversampling:
        fail(f"oversampling {osamp} > max {cfg.search_max_oversampling}")

    flt = request.get("filter")
    conds = list(_walk_filter(flt))
    if cfg.filter_max_conditions is not None \
            and len(conds) > cfg.filter_max_conditions:
        fail(f"filter has {len(conds)} conditions > "
             f"max {cfg.filter_max_conditions}")
    if cfg.condition_max_size is not None:
        for c in conds:
            m = c.get("match") or {}
            for k in ("any", "except"):
                vals = m.get(k)
                if vals is not None and len(list(vals)) > cfg.condition_max_size:
                    fail(f"match.{k} has {len(list(vals))} values > "
                         f"condition_max_size {cfg.condition_max_size}")
    allow_unindexed = (cfg.unindexed_filtering_update if is_update
                      else cfg.unindexed_filtering_retrieve)
    if allow_unindexed is False and flt:
        missing = _filter_keys(flt) - (indexed_fields or set())
        if missing:
            fail(f"filter uses unindexed fields {sorted(missing)}")

    if batch is not None:
        cap = (cfg.upsert_max_batchsize if is_update
               else cfg.search_max_batchsize)
        if cap is not None and len(batch) > cap:
            kind = "upsert" if is_update else "search"
            fail(f"{kind} batch of {len(batch)} > max {cap}")
    if cfg.max_points_count is not None and n_points is not None \
            and n_points > cfg.max_points_count:
        fail(f"collection has {n_points} points > "
             f"max_points_count {cfg.max_points_count}")
    if cfg.max_collection_vector_size_bytes is not None \
            and vector_size_bytes is not None \
            and vector_size_bytes > cfg.max_collection_vector_size_bytes:
        fail(f"collection vector data {vector_size_bytes} B > "
             f"max {cfg.max_collection_vector_size_bytes}")
    if cfg.max_collection_payload_size_bytes is not None \
            and payload_size_bytes is not None \
            and payload_size_bytes > cfg.max_collection_payload_size_bytes:
        fail(f"collection payload data {payload_size_bytes} B > "
             f"max {cfg.max_collection_payload_size_bytes}")
