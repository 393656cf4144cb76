"""Qdrant filter DSL -> ``pyspark.sql.Column`` compiler.

This is the single most reused component: every search / scroll / count /
facet / delete operator takes an optional filter. Accepts the qdrant JSON
filter shape (reference: ``Filter`` lib/segment/src/types.rs:4409-4446,
``Condition`` types.rs:3964-3982) and produces one boolean Column that
Catalyst can push down to the Parquet scan.

Value semantics preserved from the reference:

- A payload field may hold a scalar OR an array of values; a condition
  matches if ANY value matches (tests/openapi/helpers/collection_setup.py:
  171-180). Array-typed columns are therefore evaluated with ``exists``.
- ``is_empty`` = field absent (NULL) or empty array (types.rs:3780);
  ``is_null`` = field present with JSON null (types.rs:3786). Parquet has no
  "present but JSON-null" state, so ``is_null`` checks an optional sibling
  marker column ``<field>__isnull`` when the table declares one, else falls
  back to plain NULL.
- ``match.except`` = at least one value NOT in the set (types.rs:3075;
  behavior pinned by tests/openapi/test_match_except_empty.py: missing
  field does not match, ``except: []`` matches every point having the field).
- ``min_should`` = at least ``min_count`` of the conditions hold
  (types.rs:4395-4403) -> sum of boolean casts.
- ``nested`` conditions evaluate per array element and all sub-conditions
  must hit the SAME element (types.rs:3925-3962,
  nested_filtering_test.rs) -> single ``exists`` over a compiled sub-filter.

Spark three-valued logic: a WHERE clause already treats NULL as false, so
leaves are left UNWRAPPED — this keeps them eligible for Parquet predicate
pushdown (a ``coalesce(cond, false)`` wrapper disables PushedFilters
entirely). NULL is collapsed with ``coalesce(cond, false)`` only at the two
sites where three-valued logic would change semantics: under ``must_not``
(missing field -> condition false -> negation true, matching the
reference) and inside ``min_should`` counting.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_M = 6371000.0  # mean earth radius used for haversine distances

ValuePred = Callable[[Column], Column]


def _false_if_null(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


# JsonPath items (lib/segment/src/json_path/mod.rs:24-33): a dot-separated
# key path where any segment may carry array accessors — `a[0].b` (index)
# or `a[].b` (wildcard over all elements). Parsed into
# ("key", name) | ("idx", i) | ("wild",) tuples.
_SEG_RE = re.compile(r"^([^\[\]]+)((?:\[\d*\])*)$")
_BRACKET_RE = re.compile(r"\[(\d*)\]")


def _get_field(name: str):
    # NOTE: plain `lambda x, n=name: ...` breaks here — pyspark counts lambda
    # parameters and treats a 2-arg lambda as (element, index)
    return lambda x: x.getField(name)


def _get_index(i: int):
    return lambda x: F.get(x, i)


def _parse_path(key: str) -> list[tuple] | None:
    items: list[tuple] = []
    for seg in key.split("."):
        m = _SEG_RE.match(seg)
        if not m:
            return None
        items.append(("key", m.group(1)))
        for b in _BRACKET_RE.findall(m.group(2)):
            items.append(("wild",) if b == "" else ("idx", int(b)))
    return items


class FieldResolver:
    """Resolves a qdrant key path (``a.b``) to a Column + its Spark type.

    Array-valued payload fields are first-class: ``resolve`` walks struct
    fields; ``any_match`` applies a value predicate with exists-semantics
    when the terminal type is an array.
    """

    def __init__(
        self,
        schema: T.StructType,
        text_params: dict[str, dict[str, Any]] | None = None,
        id_col: str | None = None,
    ):
        self.schema = schema
        # per-field TextIndexParams (tokenizer/stemmer/ascii_folding/... —
        # index.rs:260-360); the analogue of a declared text field index
        self.text_params = text_params or {}
        # point-id column for has_id: explicit > literal "id" > the single
        # "*_id" column (the test tables' doc_id/vec_id convention)
        names = schema.fieldNames() if isinstance(schema, T.StructType) else []
        self._id_ambiguous: list[str] | None = None
        if id_col is None:
            id_like = [n for n in names if n == "id" or n.endswith("_id")]
            if "id" in names:
                id_col = "id"
            elif len(id_like) == 1:
                id_col = id_like[0]
            else:
                # no "id" column and zero-or-several *_id candidates:
                # remember why so a has_id condition raises a clear error
                # instead of an unresolved-column AnalysisException
                self._id_ambiguous = id_like
                id_col = "id"
        self.id_col = id_col

    def id_column(self) -> str:
        """The point-id column for has_id; raises a descriptive error when
        inference was ambiguous (r5 ADVICE: filters.py id_col fallback)."""
        if self._id_ambiguous is not None:
            cand = ", ".join(self._id_ambiguous) or "none"
            raise ValueError(
                "has_id: cannot infer the point-id column — no 'id' column "
                f"and {len(self._id_ambiguous)} '*_id' candidates ({cand}); "
                "pass id_col= explicitly")
        return self.id_col

    def _walk(self, key: str) -> tuple[Column, T.DataType | None]:
        parts = key.split(".")
        field_type: T.DataType | None = None
        cur: T.DataType = self.schema
        for p in parts:
            if isinstance(cur, T.StructType) and p in cur.fieldNames():
                cur = cur[p].dataType
            else:
                return (F.col(key), None)  # unknown: let Spark resolve / fail lazily
            field_type = cur
        return (F.col(".".join(parts)), field_type)

    def resolve(self, key: str) -> tuple[Column, T.DataType | None]:
        return self._walk(key)

    def _root(self, name: str) -> tuple[Column, T.DataType] | None:
        if isinstance(self.schema, T.StructType) and name in self.schema.fieldNames():
            return F.col(name), self.schema[name].dataType
        return None

    def resolve_multi(self, key: str) -> tuple[Column, T.DataType | None, bool]:
        """Resolve a JsonPath key with array accessors (`a[].b`, `a[0].b`,
        json_path/mod.rs:319-340) -> (column, terminal type, multi). When
        ``multi`` is true the column is an *array of resolved values*
        (the reference's MultiValue) and conditions apply with
        exists-semantics. Plain dot paths keep the raw-column shape so
        leaf predicates still push down to the parquet scan."""
        items = _parse_path(key)
        if items is None or all(it[0] == "key" for it in items):
            col, typ = self._walk(key)
            return col, typ, False
        root = self._root(items[0][1])
        if root is None:
            # unknown root field: no value -> condition evaluates NULL/false
            return F.lit(None), None, False
        col, cur_t = root
        multi = False
        for it in items[1:]:
            kind = it[0]
            if kind == "key":
                name = it[1]
                if multi and isinstance(cur_t, T.StructType) and name in cur_t.fieldNames():
                    col = F.transform(col, _get_field(name))
                    cur_t = cur_t[name].dataType
                elif not multi and isinstance(cur_t, T.StructType) and name in cur_t.fieldNames():
                    col = col[name]
                    cur_t = cur_t[name].dataType
                else:
                    return F.lit(None), None, False
            elif kind == "idx":
                i = it[1]
                if not isinstance(cur_t, T.ArrayType):
                    return F.lit(None), None, False
                if multi:
                    col = F.transform(col, _get_index(i))
                else:
                    col = F.get(col, i)
                cur_t = cur_t.elementType
            else:  # wildcard
                if not isinstance(cur_t, T.ArrayType):
                    return F.lit(None), None, False
                if multi:
                    # array<array<e>> -> array<e>; drop null inner arrays
                    # (flatten() nulls out the whole result otherwise)
                    col = F.flatten(F.filter(col, lambda x: x.isNotNull()))
                multi = True
                cur_t = cur_t.elementType
        return col, cur_t, multi

    def isnull_marker(self, key: str) -> Column | None:
        marker = f"{key}__isnull"
        if isinstance(self.schema, T.StructType) and marker in self.schema.fieldNames():
            return F.col(marker)
        return None

    def any_match(self, key: str, pred: ValuePred) -> Column:
        col, typ, multi = self.resolve_multi(key)
        if multi and isinstance(typ, T.ArrayType):
            # wildcard path landing on array leaves: conditions match any
            # element of any resolved array (MultiValue × array-value)
            col = F.flatten(F.filter(col, lambda x: x.isNotNull()))
            return F.exists(col, pred)
        if multi or isinstance(typ, T.ArrayType):
            return F.exists(col, pred)
        return pred(col)

    def all_values(self, key: str, pred: ValuePred) -> Column:
        col, typ, multi = self.resolve_multi(key)
        if multi and isinstance(typ, T.ArrayType):
            col = F.flatten(F.filter(col, lambda x: x.isNotNull()))
            return F.forall(col, pred)
        if multi or isinstance(typ, T.ArrayType):
            return F.forall(col, pred)
        return pred(col)


# ---------------------------------------------------------------------------
# condition compilers
# ---------------------------------------------------------------------------


def _compile_match(fr: FieldResolver, key: str, match: dict[str, Any]) -> Column:
    if "value" in match:
        v = match["value"]
        return fr.any_match(key, lambda c: c == F.lit(v))
    if "any" in match:
        vals = list(match["any"])
        if not vals:
            return F.lit(False)
        return fr.any_match(key, lambda c: c.isin(vals))
    if "except" in match:
        vals = list(match["except"])
        if not vals:
            # every point that has the field matches
            return fr.any_match(key, lambda c: c.isNotNull())
        return fr.any_match(key, lambda c: ~c.isin(vals) & c.isNotNull())
    if "text" in match or "text_any" in match or "phrase" in match:
        from qdrant_spark.functions.text import compile_text_match

        return compile_text_match(fr, key, match)
    if "prefix" in match:
        p = match["prefix"]
        return fr.any_match(key, lambda c: c.startswith(p))
    raise ValueError(f"unsupported match condition: {match!r}")


def _compile_range(fr: FieldResolver, key: str, rng: dict[str, Any]) -> Column:
    _, typ = fr.resolve(key)
    elem = typ.elementType if isinstance(typ, T.ArrayType) else typ

    def to_lit(v: Any) -> Column:
        if isinstance(elem, (T.TimestampType, T.DateType)) or (
            isinstance(v, str) and not isinstance(elem, T.StringType)
        ):
            return F.to_timestamp(F.lit(v))
        return F.lit(v)

    def pred(c: Column) -> Column:
        conds = []
        if (v := rng.get("gt")) is not None:
            conds.append(c > to_lit(v))
        if (v := rng.get("gte")) is not None:
            conds.append(c >= to_lit(v))
        if (v := rng.get("lt")) is not None:
            conds.append(c < to_lit(v))
        if (v := rng.get("lte")) is not None:
            conds.append(c <= to_lit(v))
        if not conds:
            return F.lit(True)
        out = conds[0]
        for x in conds[1:]:
            out = out & x
        return out

    return fr.any_match(key, pred)


def haversine_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (all args in degrees).

    Matches the reference's haversine geo_radius (GeoRadius types.rs:3427).
    """
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def _compile_geo(fr: FieldResolver, key: str, cond_key: str, body: dict) -> Column:
    if cond_key == "geo_bounding_box":
        tl, br = body["top_left"], body["bottom_right"]

        def pred(c: Column) -> Column:
            lat_ok = (c["lat"] <= F.lit(tl["lat"])) & (c["lat"] >= F.lit(br["lat"]))
            if tl["lon"] <= br["lon"]:
                lon_ok = (c["lon"] >= F.lit(tl["lon"])) & (c["lon"] <= F.lit(br["lon"]))
            else:  # antimeridian wrap (types.rs:3400 handles this)
                lon_ok = (c["lon"] >= F.lit(tl["lon"])) | (c["lon"] <= F.lit(br["lon"]))
            return lat_ok & lon_ok

        return fr.any_match(key, pred)
    if cond_key == "geo_radius":
        ctr, radius = body["center"], float(body["radius"])
        return fr.any_match(
            key,
            lambda c: haversine_meters(
                c["lat"], c["lon"], F.lit(ctr["lat"]), F.lit(ctr["lon"])
            )
            < F.lit(radius),
        )
    if cond_key == "geo_polygon":
        return fr.any_match(key, lambda c: _point_in_polygon(c, body))
    raise ValueError(f"unsupported geo condition {cond_key}")


def _ring_crossings(c: Column, ring: list[dict]) -> Column:
    """Ray-casting parity for one ring, as a pure Column expression."""
    inside = F.lit(False)
    pts = ring
    n = len(pts)
    for i in range(n):
        x1, y1 = float(pts[i]["lon"]), float(pts[i]["lat"])
        x2, y2 = float(pts[(i + 1) % n]["lon"]), float(pts[(i + 1) % n]["lat"])
        if y1 == y2:
            continue
        cond = ((F.lit(y1) > c["lat"]) != (F.lit(y2) > c["lat"])) & (
            c["lon"]
            < (F.lit(x2 - x1)) * (c["lat"] - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        )
        inside = F.when(cond, ~inside).otherwise(inside)
    return inside


def _point_in_polygon(c: Column, body: dict) -> Column:
    """Point-in-polygon with interior holes (GeoPolygon types.rs:3472).

    The polygon is a query-time constant, so the test unrolls into a fixed
    boolean expression — stays in whole-stage codegen, no UDF.
    """
    exterior = body["exterior"]["points"]
    inside = _ring_crossings(c, exterior)
    for interior in body.get("interiors") or []:
        inside = inside & ~_ring_crossings(c, interior["points"])
    return inside


def slice_membership(id_col: Column, total: int, index: int) -> Column:
    """One of ``total`` disjoint deterministic slices of the id space
    (``SliceCondition`` types.rs:3905-3911; ``Slice::check``
    types.rs:3879-3885): membership is ``hash(id) % total == index``.

    The reference hashes with SipHash-2-4 (zero key) over the canonical
    id bytes (``slice_point_id_hash`` types.rs:3894-3902); SipHash exists
    in neither Spark nor DuckDB, so we substitute the repo's standard
    cross-engine md5-derived 60-bit hash over the id's string form (same
    documented substitution as the BM25 token ids,
    ``functions/hashes.py``). The reference's contract carries over: for
    a fixed ``total`` the slices are disjoint and cover all points, and
    the hash is unsalted, so slice 0 of ``total`` 4 is a strict subset of
    slice 0 of ``total`` 2 (types.rs:3867-3869).

    DuckDB mirror:
    ``('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
    % total = index``.
    """
    if total <= 0:
        raise ValueError("Slice total must be positive")
    if not 0 <= index < total:
        # validate_slice_condition types.rs:3917-3928
        raise ValueError(
            "Slice index must be less than the total number of slices")
    from qdrant_spark.functions.hashes import token_hash63

    return F.pmod(token_hash63(id_col.cast("string")), F.lit(total)) == index


def _compile_condition(fr: FieldResolver, cond: dict[str, Any]) -> Column:
    if "has_id" in cond:
        ids = list(cond["has_id"])
        return F.col(fr.id_column()).isin(ids) if ids else F.lit(False)
    if "has_vector" in cond:
        name = cond["has_vector"]
        col, typ = fr.resolve(f"vec_{name}" if f"vec_{name}" in fr.schema.fieldNames() else name)
        return col.isNotNull()
    if "is_empty" in cond:
        key = cond["is_empty"]["key"]
        col, typ, multi = fr.resolve_multi(key)
        if multi or isinstance(typ, T.ArrayType):
            return col.isNull() | (F.size(F.filter(col, lambda x: x.isNotNull())) == 0)
        return col.isNull()
    if "is_null" in cond:
        key = cond["is_null"]["key"]
        marker = fr.isnull_marker(key)
        if marker is not None:
            return _false_if_null(marker)
        col, _ = fr.resolve(key)
        return col.isNull()
    if "slice" in cond:
        body = cond["slice"]
        return slice_membership(
            F.col(fr.id_column()), int(body["total"]), int(body["index"]))
    if "nested" in cond:
        return _compile_nested(fr, cond["nested"])
    if "key" in cond:
        key = cond["key"]
        if "match" in cond:
            return _compile_match(fr, key, cond["match"])
        if "range" in cond:
            return _compile_range(fr, key, cond["range"])
        if "values_count" in cond:
            col, typ, multi = fr.resolve_multi(key)
            n = F.when(col.isNull(), F.lit(0)).otherwise(
                F.size(col)
                if multi or isinstance(typ, T.ArrayType)
                else F.lit(1)
            )
            return _compile_range_scalar(n, cond["values_count"])
        for geo_key in ("geo_bounding_box", "geo_radius", "geo_polygon"):
            if geo_key in cond:
                return _compile_geo(fr, key, geo_key, cond[geo_key])
    if not cond or any(k in cond for k in ("must", "should", "must_not", "min_should")):
        # Condition::Filter (types.rs:3981); an empty filter matches all
        return compile_filter(fr, cond)
    raise ValueError(f"unsupported condition: {cond!r}")


def _compile_range_scalar(c: Column, rng: dict[str, Any]) -> Column:
    out = F.lit(True)
    if (v := rng.get("gt")) is not None:
        out = out & (c > v)
    if (v := rng.get("gte")) is not None:
        out = out & (c >= v)
    if (v := rng.get("lt")) is not None:
        out = out & (c < v)
    if (v := rng.get("lte")) is not None:
        out = out & (c <= v)
    return out


def _compile_nested(fr: FieldResolver, nested: dict[str, Any]) -> Column:
    """Same-element semantics: one ``exists`` over the compiled sub-filter."""
    key = nested["key"].removesuffix("[]")
    col, typ = fr.resolve(key)
    if not isinstance(typ, T.ArrayType) or not isinstance(typ.elementType, T.StructType):
        raise ValueError(f"nested key {key!r} must be array<struct>")
    elem_schema = typ.elementType
    sub = nested["filter"]

    def pred(elem: Column) -> Column:
        sub_fr = _ElementResolver(elem_schema, elem)
        return compile_filter(sub_fr, sub)

    return F.exists(col, pred)


class _ElementResolver(FieldResolver):
    """FieldResolver scoped to a struct element inside ``exists``."""

    def __init__(self, schema: T.StructType, elem: Column):
        super().__init__(schema)
        self.elem = elem

    def _walk(self, key: str):
        parts = key.split(".")
        cur: T.DataType = self.schema
        col = self.elem
        typ: T.DataType | None = None
        for p in parts:
            if isinstance(cur, T.StructType) and p in cur.fieldNames():
                cur = cur[p].dataType
                col = col[p]
                typ = cur
            else:
                return (col[p], None)
        return (col, typ)

    def _root(self, name: str):
        if isinstance(self.schema, T.StructType) and name in self.schema.fieldNames():
            return self.elem[name], self.schema[name].dataType
        return None

    def isnull_marker(self, key: str):
        return None


# ---------------------------------------------------------------------------
# filter root
# ---------------------------------------------------------------------------


def compile_filter(fr: FieldResolver, flt: dict[str, Any] | None) -> Column:
    """Compile a full Filter object (must / should / must_not / min_should)."""
    if not flt:
        return F.lit(True)
    clauses: list[Column] = []
    if must := flt.get("must"):
        must = must if isinstance(must, list) else [must]
        for c in must:
            clauses.append(_compile_condition(fr, c))
    if should := flt.get("should"):
        should = should if isinstance(should, list) else [should]
        any_c = F.lit(False)
        for c in should:
            any_c = any_c | _compile_condition(fr, c)
        clauses.append(any_c)
    if mn := flt.get("min_should"):
        conds = [_compile_condition(fr, c) for c in mn["conditions"]]
        total = None
        for c in conds:
            x = _false_if_null(c).cast("int")  # NULL must count as 0, not poison the sum
            total = x if total is None else total + x
        clauses.append(total >= int(mn["min_count"]))
    if must_not := flt.get("must_not"):
        must_not = must_not if isinstance(must_not, list) else [must_not]
        for c in must_not:
            clauses.append(~_false_if_null(_compile_condition(fr, c)))
    if not clauses:
        return F.lit(True)
    out = clauses[0]
    for c in clauses[1:]:
        out = out & c
    return out


def filter_column(
    df: DataFrame,
    flt: dict[str, Any] | None,
    *,
    text_params: dict[str, dict[str, Any]] | None = None,
    id_col: str | None = None,
) -> Column:
    """Public entry: compile ``flt`` against ``df``'s schema.
    ``text_params`` declares per-field text-index options (tokenizer,
    stemmer, ascii_folding, stopwords, min/max token length) that full-text
    conditions on that field honor — the declared-field-index analogue.
    ``id_col`` names the point-id column for has_id (default: "id", or the
    single "*_id" column)."""
    return compile_filter(FieldResolver(df.schema, text_params, id_col), flt)


def apply_filter(
    df: DataFrame,
    flt: dict[str, Any] | None,
    *,
    text_params: dict[str, dict[str, Any]] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    if not flt:
        return df
    return df.filter(filter_column(df, flt, text_params=text_params,
                                   id_col=id_col))
