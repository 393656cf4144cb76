"""Mutation surface: upsert / delete / payload / vector operations.

Reference ops (lib/shard/src/operations/point_ops.rs:111-123,
payload_ops.rs:16-28, vector_ops.rs:12-19) are applied through a WAL +
per-point version counter; stale-version ops are skipped
(collection_updater.rs:41). Without a transactional table format in this
environment, every operator here is a PURE DataFrame transform: it takes
the current table state and returns the next state — the caller persists
(overwrite a parquet snapshot, or feed a Delta MERGE where available).
The transforms are exactly the MERGE shapes listed in SURVEY §2.1, so they
scale: one shuffle on the id (or none, when the update batch broadcasts).

Versioning: ``version_col`` is bumped per applied op; an upsert whose
version is <= the stored version is skipped (idempotent replay).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qdrant_spark.filters import filter_column


def _align(updates: DataFrame, columns: list[str]) -> DataFrame:
    """Project `updates` onto `columns`, nulling out the missing ones."""
    have = set(updates.columns)
    return updates.select(
        *[F.col(c) if c in have else F.lit(None).alias(c) for c in columns]
    )


def upsert_points(
    table: DataFrame,
    updates: DataFrame,
    *,
    id_col: str = "id",
    version_col: str | None = None,
) -> DataFrame:
    """Insert-or-replace by id (PointOperations::UpsertPoints).

    Without versions: rows in ``updates`` replace same-id rows in the table
    (anti-join + union — the MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT
    rewrite). A DataFrame batch has no order, so duplicate ids WITHIN the
    batch have no "last" — they are collapsed to one arbitrary row
    (the reference applies ops in request order; supply ``version_col``
    for deterministic conflict resolution). With ``version_col``: keep the
    highest version per id, existing row wins ties (stale-op skip)."""
    ups = _align(updates, table.columns)
    if version_col is None:
        ups = ups.dropDuplicates([id_col])
        kept = table.join(
            updates.select(id_col).distinct(), on=id_col, how="left_anti"
        )
        return kept.unionByName(ups)
    from pyspark.sql.window import Window

    tagged = table.withColumn("__src", F.lit(0)).unionByName(
        ups.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col(version_col).desc(), F.col("__src").asc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def sync_points(
    table: DataFrame,
    points: DataFrame,
    *,
    from_id=None,
    to_id=None,
    id_col: str = "id",
) -> DataFrame:
    """SyncPoints (point_ops.rs:121-123, applied by
    lib/shard/src/update/points/sync.rs:70-80): make the ``[from_id,
    to_id)`` id range exactly equal to ``points`` — range rows absent
    from the batch are deleted, batch rows replace/insert (steps 2-5 of
    sync_points_impl collapse to one declarative replace; the
    skip-if-identical optimization is a no-op on state).

    Scale shape: this is the ``replaceWhere`` partition-overwrite — on an
    id-partitioned table only the synced range's files are rewritten,
    everything outside the range is kept untouched (no shuffle of the
    out-of-range data; Catalyst prunes it to a pass-through scan)."""
    in_range = F.lit(True)
    if from_id is not None:
        in_range = in_range & (F.col(id_col) >= F.lit(from_id))
    if to_id is not None:
        in_range = in_range & (F.col(id_col) < F.lit(to_id))
    kept = table.filter(~in_range)
    ups = _align(points.dropDuplicates([id_col]), table.columns)
    return kept.unionByName(ups)


def upsert_points_conditional(
    table: DataFrame,
    updates: DataFrame,
    flt: dict[str, Any],
    *,
    id_col: str = "id",
) -> DataFrame:
    """UpsertPointsConditional (point_ops.rs:116-117): replace only rows
    whose CURRENT state matches the filter; new ids always insert."""
    cond = filter_column(table, flt)
    matched_ids = table.filter(cond).select(id_col)
    existing_ids = table.select(id_col)
    ups = _align(updates, table.columns)
    replace = ups.join(matched_ids, id_col, "left_semi")
    insert = ups.join(existing_ids, id_col, "left_anti")
    kept = table.join(matched_ids.join(updates.select(id_col).distinct(), id_col, "left_semi"),
                      id_col, "left_anti")
    return kept.unionByName(replace).unionByName(insert)


def delete_points(
    table: DataFrame,
    *,
    ids: list | None = None,
    flt: dict[str, Any] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """DeletePoints{ids} / DeletePointsByFilter (point_ops.rs:118-121)."""
    if ids is not None:
        return table.filter(~F.col(id_col).isin(ids))
    if flt is not None:
        return table.filter(~F.coalesce(filter_column(table, flt), F.lit(False)))
    raise ValueError("need ids or flt")


def _target_cond(table: DataFrame, ids, flt, id_col):
    if ids is not None:
        return F.col(id_col).isin(ids)
    if flt is not None:
        return F.coalesce(filter_column(table, flt), F.lit(False))
    return F.lit(True)


def _infer_dtype(v: Any):
    """Spark type for a payload literal (the same shapes the client's
    upsert inference produces for payload columns)."""
    from pyspark.sql import types as T

    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(k, _infer_dtype(x)) for k, x in v.items()])
    if isinstance(v, (list, tuple)):
        return T.ArrayType(_infer_dtype(v[0]) if v else T.StringType())
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    return T.StringType()


def _merge_dtype(old, new):
    """Widen ``old`` with any struct fields only ``new`` has; mixed
    long/double widens to double (the client's cross-batch upsert rule —
    without it a float set over an int-typed column TRUNCATED, while the
    reference's schemaless JSON payload never would); on any other
    scalar conflict the STORED type wins (other rows already hold it —
    values are cast)."""
    from pyspark.sql import types as T

    numeric = (T.LongType, T.DoubleType)
    if isinstance(old, numeric) and isinstance(new, numeric) \
            and old != new:
        return T.DoubleType()
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        newmap = {f.name: f.dataType for f in new.fields}
        fields = [
            T.StructField(f.name, _merge_dtype(f.dataType,
                                               newmap.pop(f.name))
                          if f.name in [g.name for g in new.fields]
                          else f.dataType)
            for f in old.fields
        ]
        fields += [T.StructField(k, dt) for k, dt in newmap.items()]
        return T.StructType(fields)
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return T.ArrayType(_merge_dtype(old.elementType, new.elementType))
    return old


def _shape(v: Any, dtype):
    """Column literal for ``v`` shaped EXACTLY to ``dtype`` (struct field
    order and all) — ``F.lit`` alone cannot build dict/list literals."""
    from pyspark.sql import types as T

    if v is None:
        return F.lit(None).cast(dtype)
    if isinstance(dtype, T.StructType):
        v = v if isinstance(v, dict) else {}
        return F.struct(*[
            _shape(v.get(f.name), f.dataType).alias(f.name)
            for f in dtype.fields])
    if isinstance(dtype, T.ArrayType):
        if not isinstance(v, (list, tuple)) or not v:
            return F.lit(None).cast(dtype) if not isinstance(
                v, (list, tuple)) else F.array().cast(dtype)
        return F.array(*[_shape(x, dtype.elementType) for x in v])
    try:
        return F.lit(v).cast(dtype)
    except Exception:
        return F.lit(None).cast(dtype)


def _evolve(col, old, target):
    """Rebuild ``col`` (typed ``old``) as ``target`` — identical values,
    new struct fields nulled in. Cast-free for unchanged subtrees."""
    from pyspark.sql import types as T

    if old == target:
        return col
    if isinstance(old, T.StructType) and isinstance(target, T.StructType):
        have = {f.name: f.dataType for f in old.fields}
        return F.struct(*[
            (_evolve(col[f.name], have[f.name], f.dataType)
             if f.name in have else F.lit(None).cast(f.dataType)).alias(
                 f.name)
            for f in target.fields])
    if isinstance(old, T.ArrayType) and isinstance(target, T.ArrayType):
        return F.transform(
            col, lambda x: _evolve(x, old.elementType, target.elementType))
    return col.cast(target)


def set_payload(
    table: DataFrame,
    payload: dict[str, Any],
    *,
    ids: list | None = None,
    flt: dict[str, Any] | None = None,
    id_col: str = "id",
    key: str | None = None,
) -> DataFrame:
    """SetPayload (payload_ops.rs:16-28): per-key merge — listed keys are
    REPLACED on matching rows, other columns untouched. Values may be
    arbitrarily nested dicts/lists; a struct column schema-evolves (new
    subfields appear nulled on non-matching rows), and on a scalar type
    conflict the stored type wins (value cast, like cross-batch payload
    typing on upsert).

    ``key`` (SetPayloadOp.key, a dotted path): the payload keys are set
    UNDER that path instead, preserving sibling subfields — e.g.
    ``payload={"c": 1}, key="meta"`` sets ``meta.c`` only. Array steps
    (``a[0]``) are not supported in this typed columnar layout."""
    cond = _target_cond(table, ids, flt, id_col)
    if key is not None:
        return _set_payload_at(table, payload, key, cond)
    out = table
    for k, value in payload.items():
        inferred = _infer_dtype(value)
        if k in out.columns:
            old = out.schema[k].dataType
            target = _merge_dtype(old, inferred)
            if target != old:
                out = out.withColumn(k, _evolve(F.col(k), old, target))
            base = F.col(k)
        else:
            target = inferred
            base = F.lit(None).cast(target)
        out = out.withColumn(
            k, F.when(cond, _shape(value, target)).otherwise(base))
    return out


def _set_payload_at(table: DataFrame, payload: dict[str, Any],
                    key: str, cond) -> DataFrame:
    from pyspark.sql import types as T

    if "[" in key:
        raise ValueError(
            f"set_payload key={key!r}: array steps are not supported in "
            f"the typed columnar layout (dotted struct paths only)")
    segs = key.split(".")
    col_name = segs[0]
    # the value written at the path is the payload OBJECT merged into
    # whatever struct lives there
    inferred = _infer_dtype(payload)
    for seg in reversed(segs[1:]):
        inferred = T.StructType([T.StructField(seg, inferred)])
    if col_name in table.columns:
        old = table.schema[col_name].dataType
        if not isinstance(old, T.StructType):
            # also guards the single-segment case: replacing a scalar
            # column with a struct would have to NULL the scalar on
            # UNSELECTED rows too (the typed columnar layout can't hold
            # both), silently losing their values — the reference keeps
            # other points' payloads untouched on set_payload
            # (lib/collection/src/collection/payload_ops), so refuse.
            raise ValueError(
                f"set_payload key={key!r}: column {col_name!r} is "
                f"{old.simpleString()}, not a struct")
        target = _merge_dtype(old, inferred)
        out = table
        if target != old:
            out = out.withColumn(
                col_name, _evolve(F.col(col_name), old, target))
        base = F.col(col_name)
    else:
        target = inferred
        out = table
        base = F.lit(None).cast(target)

    def set_under(base_col, dtype, rest: list[str]):
        if not rest:
            new = base_col
            for k, v in payload.items():
                sub = next(f.dataType for f in dtype.fields if f.name == k)
                new = new.withField(k, _shape(v, sub))
            return new
        head = rest[0]
        sub = next(f.dataType for f in dtype.fields if f.name == head)
        if not isinstance(sub, T.StructType):
            raise ValueError(
                f"set_payload key: path step {head!r} is "
                f"{sub.simpleString()}, not a struct")
        inner = F.when(base_col[head].isNotNull(), base_col[head]) \
            .otherwise(F.lit(None).cast(sub))
        return base_col.withField(head, set_under(inner, sub, rest[1:]))

    # base may be NULL on rows where the struct was never set: seed an
    # all-null struct so withField has something to build on
    seeded = F.coalesce(base, _shape({}, target))
    new = set_under(seeded, target, segs[1:])
    return out.withColumn(col_name, F.when(cond, new).otherwise(base))


def overwrite_payload(
    table: DataFrame,
    payload: dict[str, Any],
    payload_cols: list[str],
    *,
    ids: list | None = None,
    flt: dict[str, Any] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """OverwritePayload: full replace — keys not in ``payload`` are cleared
    (NULL) on matching rows."""
    cond = _target_cond(table, ids, flt, id_col)
    out = table
    for key in payload_cols:
        if key in table.columns:
            old = table.schema[key].dataType
            target = _merge_dtype(old, _infer_dtype(payload[key])) \
                if key in payload else old
            if target != old:
                out = out.withColumn(key, _evolve(F.col(key), old, target))
            base = F.col(key)
        else:
            target = _infer_dtype(payload.get(key))
            base = F.lit(None).cast(target)
        new = _shape(payload[key], target) if key in payload \
            else F.lit(None).cast(target)
        out = out.withColumn(key, F.when(cond, new).otherwise(base))
    return out


def delete_payload(
    table: DataFrame,
    keys: list[str],
    *,
    ids: list | None = None,
    flt: dict[str, Any] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """DeletePayload: remove listed keys (NULL the columns) on matches.
    Keys may be dotted struct paths ("meta.b": the subfield is nulled,
    siblings kept); missing keys/paths are no-ops (as in the reference —
    previously a dotted key CREATED a corrupt literal-dot column and a
    missing key raised)."""
    from pyspark.sql import types as T

    def null_at(col, dtype, segs):
        fld = next((f for f in dtype.fields if f.name == segs[0]), None)
        if fld is None:
            return None
        if len(segs) == 1:
            return col.withField(segs[0],
                                 F.lit(None).cast(fld.dataType))
        if not isinstance(fld.dataType, T.StructType):
            return None
        inner = null_at(col[segs[0]], fld.dataType, segs[1:])
        return None if inner is None else col.withField(segs[0], inner)

    cond = _target_cond(table, ids, flt, id_col)
    out = table
    for key in keys:
        segs = key.split(".")
        if segs[0] not in table.columns:
            continue
        dtype = table.schema[segs[0]].dataType
        if len(segs) == 1:
            new = F.lit(None).cast(dtype)
        else:
            if not isinstance(dtype, T.StructType):
                continue
            new = null_at(F.col(segs[0]), dtype, segs[1:])
            if new is None:
                continue
        out = out.withColumn(
            segs[0], F.when(cond, new).otherwise(F.col(segs[0])))
    return out


def clear_payload(
    table: DataFrame,
    payload_cols: list[str],
    *,
    ids: list | None = None,
    flt: dict[str, Any] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """ClearPayload / ClearPayloadByFilter: NULL every payload column."""
    return delete_payload(table, payload_cols, ids=ids, flt=flt, id_col=id_col)


def update_vectors(
    table: DataFrame,
    updates: DataFrame,
    vec_cols: list[str],
    *,
    id_col: str = "id",
) -> DataFrame:
    """UpdateVectors (vector_ops.rs:12-19): set named vectors on existing
    points, leaving payload and absent vector names untouched."""
    right = updates.select(
        F.col(id_col).alias("__uid"),
        *[F.col(c).alias(f"__new_{c}") for c in vec_cols if c in updates.columns],
    )
    out = table.join(F.broadcast(right), table[id_col] == right["__uid"], "left")
    for c in vec_cols:
        if f"__new_{c}" in out.columns:
            out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c)))
    return out.drop("__uid", *[f"__new_{c}" for c in vec_cols if f"__new_{c}" in out.columns])


def delete_vectors(
    table: DataFrame,
    vec_cols: list[str],
    *,
    ids: list | None = None,
    flt: dict[str, Any] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """DeleteVectors / DeleteVectorsByFilter: NULL named vector columns."""
    cond = _target_cond(table, ids, flt, id_col)
    out = table
    for c in vec_cols:
        out = out.withColumn(c, F.when(cond, F.lit(None)).otherwise(F.col(c)))
    return out


# ---------------------------------------------------------------------------
# Delta Lake twins (SURVEY §2.1's preferred mapping where a transactional
# table format is available): the same upsert semantics expressed as a
# MERGE INTO, so the mutation rewrites only the touched files instead of
# snapshotting the whole table. Env-gated — delta-spark is optional; the
# pure-DataFrame transforms above remain the portable path and the
# oracle-gated source of truth for semantics.
# ---------------------------------------------------------------------------


def prepare_upsert_batch(
    updates: DataFrame,
    *,
    id_col: str = "id",
    version_col: str | None = None,
) -> DataFrame:
    """Collapse an upsert batch to ONE row per id — MERGE requires a
    unique source key. With ``version_col`` the highest version wins
    (same resolution as :func:`upsert_points`); without, duplicates
    collapse arbitrarily (a DataFrame batch has no order)."""
    if version_col is None:
        return updates.dropDuplicates([id_col])
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col(version_col).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_merge_condition(
    id_col: str = "id",
    version_col: str | None = None,
) -> tuple[str, str | None]:
    """(match condition, update gate) SQL strings for the upsert MERGE:
    match on id; with versions, update only strictly-newer sources — the
    stale-op skip (collection_updater.rs:41) becomes a WHEN MATCHED AND
    guard, and ties keep the existing row exactly like upsert_points."""
    cond = f"t.{id_col} = s.{id_col}"
    gate = (f"s.{version_col} > t.{version_col}"
            if version_col is not None else None)
    return cond, gate


def upsert_points_delta(
    delta_table,
    updates: DataFrame,
    *,
    id_col: str = "id",
    version_col: str | None = None,
) -> None:
    """MERGE INTO twin of :func:`upsert_points`: insert-or-replace by id
    with the versioned stale-skip, applied transactionally to a
    ``delta.tables.DeltaTable``. At 100 TB this rewrites only the files
    containing matched ids (plus data-skipping pruning on the join key)
    instead of the full-snapshot overwrite the parquet path needs.

    Raises ImportError when delta-spark isn't on the classpath."""
    from delta.tables import DeltaTable  # noqa: F401  (env gate)

    if not hasattr(delta_table, "alias"):
        raise TypeError("delta_table must be a delta.tables.DeltaTable")
    src = prepare_upsert_batch(updates, id_col=id_col,
                               version_col=version_col)
    cond, gate = upsert_merge_condition(id_col, version_col)
    m = delta_table.alias("t").merge(src.alias("s"), cond)
    m = (m.whenMatchedUpdateAll(condition=gate) if gate
         else m.whenMatchedUpdateAll())
    m.whenNotMatchedInsertAll().execute()
