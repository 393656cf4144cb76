"""Collection config / schema validation and PointsTable layout."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from qdrant_spark.schema import CollectionConfig, PayloadField, VectorConfig
from qdrant_spark.sources.parquet import PointsTable


@pytest.fixture()
def config():
    return CollectionConfig(
        vectors={"": VectorConfig(dim=4, distance="dot"),
                 "colbert": VectorConfig(dim=4, kind="multi"),
                 "text": VectorConfig(dim=0, kind="sparse")},
        payload={"city": PayloadField("keyword", nullable_marker=True),
                 "price": PayloadField("float"),
                 "location": PayloadField("geo", array=False)},
    )


def test_struct_type_shape(config):
    st = config.to_struct_type()
    names = st.fieldNames()
    assert names[:2] == ["id", "version"]
    assert "vec" in names and "vec_colbert" in names and "vec_text" in names
    assert "city" in names and "city__isnull" in names
    assert st["vec"].dataType.simpleString() == "array<float>"
    assert st["vec_colbert"].dataType.simpleString() == "array<array<float>>"
    assert st["city"].dataType.simpleString() == "array<string>"
    assert st["location"].dataType.simpleString() == "struct<lon:double,lat:double>"


def test_validate_reports_drift(spark, config):
    df = spark.createDataFrame([("1", 0)], "id: string, version: long")
    problems = config.validate(df)
    assert any("vec" in p for p in problems)
    assert any("city" in p for p in problems)


def test_invalid_configs_rejected():
    with pytest.raises(ValueError):
        VectorConfig(dim=4, distance="nope")
    with pytest.raises(ValueError):
        VectorConfig(dim=4, kind="graph")


def test_points_table_roundtrip_and_shards(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t = PointsTable(spark, f"{tmp}/pts", id_col="id")
        df = spark.createDataFrame(
            [(str(i), i % 3, float(i)) for i in range(30)],
            "id: string, tenant: int, val: double",
        )
        t.write(df, shard_buckets=4)
        back = t.read()
        assert back.count() == 30
        assert "__shard" in back.columns
        assert back.select("__shard").distinct().count() <= 4

        ups = spark.createDataFrame(
            [("5", 99, 99.0), ("100", 1, 1.0)], "id: string, tenant: int, val: double"
        )
        t.upsert(ups)
        got = {r["id"]: r["val"] for r in t.read().collect()}
        assert got["5"] == 99.0 and got["100"] == 1.0 and len(got) == 31


def test_points_table_partition_pruning(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t = PointsTable(spark, f"{tmp}/pts", id_col="id", partition_by=["tenant"])
        df = spark.createDataFrame(
            [(str(i), i % 3, float(i)) for i in range(30)],
            "id: string, tenant: int, val: double",
        )
        t.write(df)
        pruned = t.read().filter(F.col("tenant") == 1)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert pruned.count() == 10
        assert "PartitionFilters: [isnotnull(tenant" in plan or "tenant#" in plan


def test_points_table_optimize_and_vacuum(spark, tmp_path):
    import glob

    from qdrant_spark.sources.parquet import PointsTable

    path = str(tmp_path / "pts")
    t = PointsTable(spark, path, id_col="id")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("blk"),
        (F.col("id") % 3 == 0).alias("__deleted"),
    ).repartition(16)
    t.write(df)
    assert len(glob.glob(f"{path}/*.parquet")) >= 16

    n = t.optimize(target_rows_per_file=500, zorder_by="blk")
    assert n == 1000
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 2  # ceil(1000/500)
    assert t.read().count() == 1000

    removed = t.vacuum()
    assert removed == 334  # ids divisible by 3 in [0, 1000)
    out = t.read()
    assert out.count() == 666 and "__deleted" not in out.columns
    # idempotent: second vacuum is a no-op (column gone)
    assert t.vacuum() == 0


def test_points_table_snapshots(spark, tmp_path):
    """Snapshot API op (snapshot_api.rs shape): create → mutate → list →
    restore round-trips the pre-mutation state; delete removes it."""
    from qdrant_spark.sources.parquet import PointsTable

    path = str(tmp_path / "pts")
    t = PointsTable(spark, path, id_col="id")
    t.write(spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")))

    name = t.create_snapshot("before")
    assert name == "before"
    # mutate the live table
    t.write(spark.range(10).select(F.col("id"), F.lit(0).alias("v")))
    assert t.read().count() == 10

    snaps = t.list_snapshots()
    assert [s["name"] for s in snaps] == ["before"]
    assert snaps[0]["rows"] == 100

    assert t.restore_snapshot("before") == 100
    rows = {r["id"]: r["v"] for r in t.read().collect()}
    assert len(rows) == 100 and rows[7] == 14

    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.restore_snapshot("nope")
    assert t.delete_snapshot("before") is True
    assert t.delete_snapshot("before") is False
    assert t.list_snapshots() == []
