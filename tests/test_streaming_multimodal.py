"""Streaming upsert ingestion and multimodal column plumbing."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from qdrant_spark.functions.multimodal import (
    blob_size,
    content_hash,
    extract_features,
    fake_decode,
    frame_sample,
    real_decode,
)
from qdrant_spark.streaming.ingest import ParquetPointsSink, start_upsert_stream


def test_streaming_upsert_applies_batches(spark):
    with tempfile.TemporaryDirectory() as tmp:
        sink = ParquetPointsSink(spark, f"{tmp}/table", id_col="id")
        base = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id: long, tag: string, val: double"
        )
        sink.apply_batch(base, 0)

        # micro-batch: update id 2, insert id 3
        b1 = spark.createDataFrame(
            [(2, "B", 20.0), (3, "c", 3.0)], "id: long, tag: string, val: double"
        )
        sink.apply_batch(b1, 1)
        got = {r["id"]: (r["tag"], r["val"]) for r in sink.read().collect()}
        assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0)}


def test_streaming_end_to_end_file_source(spark):
    with tempfile.TemporaryDirectory() as tmp:
        inp = f"{tmp}/in"
        spark.createDataFrame(
            [(1, 1.0, 1), (2, 2.0, 1)], "id: long, val: double, version: long"
        ).coalesce(1).write.mode("append").parquet(inp)
        spark.createDataFrame(
            [(2, 20.0, 2), (3, 3.0, 2)], "id: long, val: double, version: long"
        ).coalesce(1).write.mode("append").parquet(inp)

        sink = ParquetPointsSink(
            spark, f"{tmp}/table", id_col="id", version_col="version"
        )
        stream = spark.readStream.schema(
            "id long, val double, version long"
        ).option("maxFilesPerTrigger", "1").parquet(inp)
        q = start_upsert_stream(stream, sink, checkpoint_dir=f"{tmp}/ckpt")
        q.awaitTermination(120)

        got = {r["id"]: (r["val"], r["version"]) for r in sink.read().collect()}
        # id 2 must resolve to the higher version regardless of batch split
        assert got[2] == (20.0, 2)
        assert set(got) == {1, 2, 3}


def test_content_hash_and_size(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"hello")), (2, bytearray(b""))], "id: long, blob: binary"
    )
    rows = {r["id"]: (r["h"], r["n"]) for r in df.select(
        "id", content_hash("blob").alias("h"), blob_size("blob").alias("n")
    ).collect()}
    import hashlib

    assert rows[1] == (hashlib.md5(b"hello").hexdigest(), 5)
    assert rows[2][1] == 0


def test_extract_features_deterministic(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"imgdata-a")), (2, bytearray(b"imgdata-b")), (3, None)],
        "id: long, blob: binary",
    )
    out = {r["id"]: r["embedding"] for r in
           extract_features(df, dim=8).collect()}
    assert out[3] is None
    assert [pytest.approx(x, rel=1e-6) for x in out[1]] == fake_decode(b"imgdata-a", 8)
    assert len(out[2]) == 8 and out[1] != out[2]


def test_frame_sample_explodes(spark):
    df = spark.createDataFrame([(7, bytearray(b"xyz"))], "id: long, blob: binary")
    rows = frame_sample(df).collect()
    assert len(rows) == (3 % 4) + 1
    assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
    assert all(r["id"] == 7 and len(r["frame_blob"]) == 16 for r in rows)


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"x")


def test_resize_media_deterministic(spark):
    from qdrant_spark.functions.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, b"imagebytes"), (2, b"other"), (3, None)], "id: long, blob: binary"
    )
    out = resize_media(df, width=8, height=4).collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id[1]["blob"]) == 32 and by_id[1]["width"] == 8
    assert by_id[3]["blob"] is None
    # deterministic: same input -> same bytes
    again = {r["id"]: r["blob"] for r in resize_media(df, width=8, height=4).collect()}
    assert again[1] == by_id[1]["blob"]
