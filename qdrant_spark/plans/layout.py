"""Physical-layout helpers: Z-order (Morton) sort keys for multi-column
data locality.

Partitioning handles ONE pruning dimension (shard key, tenant, IVF
cluster, geo cell). When two access patterns share a table — e.g. tenant +
time, or geo cell + event type — a Z-order sort key interleaves the bits
of both columns so parquet row-group min/max statistics stay tight on each
dimension, and either predicate skips row groups. This is the open-table-
format Z-ORDER shape (Delta/Iceberg) expressed as plain column math:
``df.repartitionByRange(N, z).sortWithinPartitions(z).write...``.

Everything is JVM-side bit arithmetic — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits16(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` so there is a zero bit between
    consecutive bits (the classic Morton bit-twiddle, column math)."""
    x = v.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def _rank16(df: DataFrame, col: str) -> Column:
    """Quantile rank of a column into 16-bit buckets via ``ntile`` — makes
    Z-order robust to skewed/unbounded domains (ids, timestamps)."""
    from pyspark.sql import Window

    return (F.ntile(1 << 16).over(Window.orderBy(F.col(col))) - 1).cast("long")


def zorder_key(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two non-negative integral columns
    into one 32-bit Morton key: ``z = spread(a) | spread(b) << 1``.
    Callers quantize their columns into [0, 65535] first (e.g. ntile,
    ``floor(ts / bucket)``, geo cell index split into lat/lon parts)."""
    return _spread_bits16(a).bitwiseOR(F.shiftleft(_spread_bits16(b), 1))


def zorder_write(
    df: DataFrame,
    cols: tuple[str, str],
    path: str,
    n_files: int = 64,
    quantize: bool = True,
) -> None:
    """Write ``df`` Z-ordered on two columns: range-partition then sort by
    the Morton key so every parquet file covers a small rectangle of the
    (a, b) space — min/max row-group stats stay selective on BOTH columns.
    ``quantize=True`` ntile-ranks each column first (one pass; use False
    when the columns are already small non-negative ints).

    Note the ntile ranking uses a global window (one shuffle) — at 100 TB
    replace with ``approxQuantile``-derived bucket boundaries, same key
    shape."""
    a, b = (F.col(c) for c in cols)
    if quantize:
        qa, qb = _rank16(df, cols[0]), _rank16(df, cols[1])
    else:
        qa, qb = a.cast("long"), b.cast("long")
    keyed = df.withColumn("__z", zorder_key(qa, qb))
    (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
