"""Z-order layout: the Morton key must interleave correctly, and a
Z-ordered write must make row-group stats selective on BOTH columns
(checked by counting parquet files whose min/max range covers a point
predicate — must be a minority of files for both dimensions)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from qdrant_spark.plans.layout import zorder_key, zorder_write


def _py_spread16(v: int) -> int:
    x = v & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def test_zorder_key_matches_python(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1024)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_key(F.col("a"), F.col("b"))).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == (_py_spread16(a) | (_py_spread16(b) << 1))


def test_zorder_locality_both_dimensions(spark, tmp_path):
    """10k rows over two independent uniform columns: after zorder_write,
    a point predicate on EITHER column must be coverable by a minority of
    files (min/max stats tight on both), which linear sort by one column
    cannot achieve for the other."""
    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("x"),
        (F.col("id") * 104729 % 10_000).alias("y"),
    )
    path = str(tmp_path / "z")
    zorder_write(df, ("x", "y"), path, n_files=32)

    files = glob.glob(f"{path}/*.parquet")
    assert len(files) >= 16

    def covering_fraction(col):
        probe = 5000
        cover = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            fmin = min(md.row_group(g).column(idx).statistics.min
                       for g in range(md.num_row_groups))
            fmax = max(md.row_group(g).column(idx).statistics.max
                       for g in range(md.num_row_groups))
            if fmin <= probe <= fmax:
                cover += 1
        return cover / len(files)

    # each dimension: most files must be skippable for a point lookup
    assert covering_fraction("x") <= 0.6
    assert covering_fraction("y") <= 0.6
    # sanity: data round-trips
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.columns == ["x", "y"]
