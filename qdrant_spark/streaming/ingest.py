"""Continuous ingestion: Structured Streaming -> upsert into a points table.

Reference: qdrant's update pipeline is an acknowledged-write queue + WAL
applied by update workers (lib/collection/src/update_handler.rs:88-191,
lib/shard/src/wal.rs); searches see writes after flush via proxy segments.
There are no streaming QUERY semantics (SURVEY §2.8) — the analogue is
exactly this: a micro-batched upsert stream with read-your-acknowledged-
writes after each batch commit.

Spark mapping: ``readStream -> foreachBatch(upsert) -> parquet snapshot``.
Each micro-batch applies the same MERGE-shaped ``upsert_points`` transform
used by the batch mutation surface, then atomically swaps the snapshot
directory. With Delta/Iceberg available this becomes a real MERGE INTO;
the plan shape (anti-join + union on id) is identical.

The checkpoint directory gives exactly-once batch application — the WAL
equivalent (stream restarts resume from the last committed batch).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from qdrant_spark.operators.mutate import upsert_points


class ParquetPointsSink:
    """foreachBatch sink: maintains a parquet snapshot of the points table
    under ``table_dir``, applying each micro-batch as an upsert.

    Layout: ``table_dir/_v<N>`` snapshot directories + ``table_dir/CURRENT``
    pointer file — readers always see a complete snapshot (poor-man's
    transaction log; swap is a one-line file write).

    ``partition_cols`` commits each snapshot parquet-PARTITIONED by the
    given columns — the persisted layout the cluster-pruned search
    routes turn into file-level PartitionFilters (index-maintaining
    sinks set ``("__cluster",)``)."""

    def __init__(self, spark: SparkSession, table_dir: str, *,
                 id_col: str = "id", version_col: str | None = None,
                 partition_cols: tuple[str, ...] = ()):
        self.spark = spark
        self.table_dir = table_dir
        self.id_col = id_col
        self.version_col = version_col
        self.partition_cols = tuple(partition_cols)
        os.makedirs(table_dir, exist_ok=True)

    # -- snapshot plumbing ---------------------------------------------------

    def _current_path(self) -> str | None:
        ptr = os.path.join(self.table_dir, "CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            name = f.read().strip()
        return os.path.join(self.table_dir, name) if name else None

    def read(self) -> DataFrame | None:
        path = self._current_path()
        return self.spark.read.parquet(path) if path else None

    def _commit(self, df: DataFrame, batch_id: int) -> None:
        name = f"_v{batch_id}"
        out = os.path.join(self.table_dir, name)
        w = df.write.mode("overwrite")
        if self.partition_cols:
            w = w.partitionBy(*self.partition_cols)
        w.parquet(out)
        with open(os.path.join(self.table_dir, "CURRENT"), "w") as f:
            f.write(name)
        # retire old snapshots (keep the previous one for in-flight readers)
        keep = {name, f"_v{batch_id - 1}"}
        for d in os.listdir(self.table_dir):
            if d.startswith("_v") and d not in keep:
                shutil.rmtree(os.path.join(self.table_dir, d), ignore_errors=True)

    # -- foreachBatch --------------------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        current = self.read()
        if current is None:
            merged = batch_df
        else:
            merged = upsert_points(
                current, batch_df, id_col=self.id_col, version_col=self.version_col
            )
        # safe while reading the previous snapshot: we write a NEW _v dir
        self._commit(merged, batch_id)


def start_upsert_stream(
    stream_df: DataFrame,
    sink: ParquetPointsSink,
    *,
    checkpoint_dir: str,
    trigger: dict[str, Any] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
):
    """Wire a streaming DataFrame into the sink. Returns the StreamingQuery."""

    def do_batch(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        sink.apply_batch(batch_df, batch_id)

    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(do_batch)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
