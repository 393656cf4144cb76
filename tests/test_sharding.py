"""Shard-key routing (ShardKeySelector shard_selector_internal.rs:30-62,
fallback routing shard_holder/mod.rs:721-784, hash routing hash_ring.rs)."""

import pytest
from pyspark.sql import functions as F

from qdrant_spark.operators.sharding import (
    assign_shard_key, auto_shard_key, select_shards,
)


def test_assign_and_auto_shard_key(embeddings):
    lit = assign_shard_key(embeddings, "tenant_a")
    assert lit.select("shard_key").distinct().collect()[0][0] == "tenant_a"
    by_col = assign_shard_key(embeddings, F.col("label").cast("string"))
    assert by_col.filter(F.col("shard_key") != F.col("label").cast("string")).count() == 0

    auto = auto_shard_key(embeddings, 8, id_col="vec_id")
    keys = [r[0] for r in auto.select("shard_key").distinct().collect()]
    assert set(keys) <= set(range(8)) and len(keys) == 8
    # deterministic routing: same id -> same shard on re-ingest
    again = auto_shard_key(embeddings, 8, id_col="vec_id")
    assert auto.select("vec_id", "shard_key").exceptAll(
        again.select("vec_id", "shard_key")).count() == 0


def test_select_shards_single_many_empty(embeddings):
    sh = auto_shard_key(embeddings, 4, id_col="vec_id")
    n = sh.count()
    one = select_shards(sh, 2)
    assert one.filter(F.col("shard_key") != 2).count() == 0
    many = select_shards(sh, [1, 3])
    assert many.count() == (sh.filter(F.col("shard_key").isin([1, 3])).count())
    assert select_shards(sh, None).count() == n  # Empty = all shards


def test_select_shards_fallback(embeddings):
    sh = assign_shard_key(embeddings, F.when(F.col("label") < 2, "hot")
                          .otherwise("cold"))
    # target exists -> target
    t = select_shards(sh, {"target": "hot", "fallback": "cold"})
    assert t.select("shard_key").distinct().collect()[0][0] == "hot"
    # target missing -> fallback (both via probe and via metadata keys)
    f = select_shards(sh, {"target": "gone", "fallback": "cold"})
    assert f.select("shard_key").distinct().collect()[0][0] == "cold"
    m = select_shards(sh, {"target": "gone", "fallback": "cold"},
                      existing_keys=["hot", "cold"])
    assert m.select("shard_key").distinct().collect()[0][0] == "cold"


def test_shard_selector_prunes_partitions(embeddings, tmp_path):
    """With shard_key as a partition column, the selector must reach the
    scan as a PartitionFilter — the reference's 'never touch other
    shards'."""
    path = str(tmp_path / "sharded")
    auto_shard_key(embeddings, 4, id_col="vec_id") \
        .write.partitionBy("shard_key").parquet(path)
    spark = embeddings.sparkSession
    tbl = spark.read.parquet(path)
    got = select_shards(tbl, [0, 2])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "shard_key" in plan.split("PartitionFilters", 1)[1][:200]


def test_universal_query_shard_key_routing(embeddings):
    from qdrant_spark.query import universal_query

    sh = assign_shard_key(embeddings, F.when(F.col("vec_id") < 100, "a")
                          .otherwise("b")).cache()
    req = {"query": {"nearest": {"id": 0}}, "limit": 5, "shard_key": "a"}
    out = universal_query(sh, req, id_col="vec_id", vec_col="embedding").collect()
    assert len(out) == 5 and all(r["vec_id"] < 100 for r in out)
    # routing happens before planning: same request on shard b returns only b
    req_b = dict(req, shard_key="b", query={"nearest": [float(i % 7) - 3.0 for i in range(64)]})
    out_b = universal_query(sh, req_b, id_col="vec_id", vec_col="embedding").collect()
    assert out_b and all(r["vec_id"] >= 100 for r in out_b)
