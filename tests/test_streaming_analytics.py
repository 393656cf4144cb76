"""Streaming analytics: stream results must equal the equivalent batch
computation (windowed stats, dedup), and the stateful last-write-wins
operator must resolve versions across micro-batches like batch upsert."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qdrant_spark.streaming.analytics import (
    dedup_stream, latest_version_stream, windowed_event_stats,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


@pytest.fixture(scope="module")
def events_stream_dir(spark, events, tmp_path_factory):
    """Events split into 3 files so maxFilesPerTrigger=1 yields 3
    micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    events.repartitionByRange(3, "event_id").write.mode("overwrite").parquet(d)
    return d


def _run_stream(df, name, mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return name


def test_windowed_stats_stream_matches_batch(spark, events, events_stream_dir):
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(events_stream_dir))
    agg = windowed_event_stats(stream, window="1 hour", watermark="30 minutes")
    _run_stream(agg, "win_stats", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("win_stats").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in windowed_event_stats(events, window="1 hour").collect()
    }
    assert got == want and len(want) > 10


def test_windowed_stats_sliding_window(spark, events):
    """Sliding windows in batch mode: every event lands in window/slide
    windows, so total count across windows is a multiple of row count."""
    out = windowed_event_stats(events, window="2 hours", slide="1 hour",
                               group_cols=()).agg(F.sum("n_events")).first()[0]
    assert out == 2 * events.count()


def test_dedup_stream_matches_distinct(spark, events, events_stream_dir, tmp_path):
    """Stream the same files TWICE (re-delivery) — horizon-bounded dedup
    must collapse them back to the original row count."""
    d = str(tmp_path / "dup")
    base = spark.read.parquet(events_stream_dir)
    base.write.mode("overwrite").parquet(d)
    base.write.mode("append").parquet(d)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 2).parquet(d))
    out = dedup_stream(stream, id_cols=("event_id",), watermark="365 days")
    _run_stream(out, "dedup_out", "append")
    assert spark.table("dedup_out").count() == events.count()
    # batch path: plain distinct-by-id
    assert dedup_stream(base, id_cols=("event_id",)).count() == events.count()


def test_latest_version_stream(spark, tmp_path):
    """Versions arrive across micro-batches, newest-last and stale-last for
    different ids; final resolved winner per id == batch argmax, and stale
    redeliveries after the high-water mark emit nothing."""
    d = str(tmp_path / "updates")
    rows1 = [(1, 1, "a1"), (1, 2, "a2"), (2, 5, "b5")]
    rows2 = [(1, 3, "a3"), (2, 4, "b4-stale")]  # id2's v4 < stored v5
    schema = "id long, version long, payload string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(d)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(d)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = latest_version_stream(stream, id_col="id", version_col="version",
                                payload_cols=["payload"])
    _run_stream(out, "lv_out", "update")
    emitted = spark.table("lv_out").collect()
    # versions emitted per id strictly increase (stale batch emitted nothing)
    by_id: dict[int, list[int]] = {}
    for r in sorted(emitted, key=lambda r: r["version"]):
        by_id.setdefault(r["id"], []).append(r["version"])
    assert all(vs == sorted(set(vs)) for vs in by_id.values())
    # final winner matches the batch argmax
    final: dict[int, tuple] = {}
    for r in emitted:
        if r["id"] not in final or r["version"] > final[r["id"]][0]:
            final[r["id"]] = (r["version"], r["payload"])
    batch = latest_version_stream(
        spark.read.parquet(d), id_col="id", version_col="version",
        payload_cols=["payload"])
    want = {r["id"]: (r["version"], r["payload"]) for r in batch.collect()}
    assert final == want == {1: (3, "a3"), 2: (5, "b5")}


def test_streaming_ann_ingest_matches_batch_assignment(spark, tmp_path):
    """Streaming ingest-time index maintenance: new embedding batches are
    assigned to FIXED centroids inside foreachBatch (assign_to_ivf's
    map-only argmin), accumulated in a parquet table partitioned by
    cluster. After the stream drains, the streamed assignment must equal
    assigning the whole corpus in one batch — stream == batch, the
    exactly-once contract for index maintenance."""
    import numpy as np

    from qdrant_spark.operators.ann import IvfIndex, assign_to_ivf, build_ivf

    rng = np.random.default_rng(11)
    all_rows = [(i, [float(x) for x in v])
                for i, v in enumerate(rng.normal(0, 1, size=(120, 8)))]
    schema = "id long, vec array<float>"
    full = spark.createDataFrame(all_rows, schema)
    # centroids fitted once on the first slice (the live-corpus shape:
    # periodic refit, fixed centroids between refits)
    seed_df = spark.createDataFrame(all_rows[:40], schema)
    base = build_ivf(seed_df, n_clusters=4, vec_col="vec", id_col="id", seed=5)

    src = str(tmp_path / "stream_src")
    out_dir = str(tmp_path / "streamed_assign")
    spark.createDataFrame(all_rows[:40], schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(all_rows[40:80], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(all_rows[80:], schema).coalesce(1) \
        .write.mode("append").parquet(src)

    empty = spark.createDataFrame([], schema)

    def do_batch(batch_df, batch_id):
        idx = IvfIndex(assigned=empty.withColumn("__cluster", F.lit(0).cast("int")).limit(0),
                       centroids=base.centroids, vec_col="vec", id_col="id")
        assigned = assign_to_ivf(idx, batch_df).assigned
        assigned.write.mode("append").partitionBy("__cluster").parquet(out_dir)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(do_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    streamed = {(r["id"], r["__cluster"])
                for r in spark.read.parquet(out_dir).collect()}
    expected = {(r["id"], r["__cluster"])
                for r in assign_to_ivf(
                    IvfIndex(assigned=empty.withColumn("__cluster", F.lit(0).cast("int")).limit(0),
                             centroids=base.centroids, vec_col="vec", id_col="id"),
                    full).assigned.collect()}
    assert streamed == expected and len(streamed) == 120
