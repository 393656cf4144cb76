"""PointsTable: parquet-backed collection storage with scale-aware layout.

The reference's storage ladder (segments, mmap tiers, tenant-aware layout —
SURVEY §4.2, `PayloadSchemaParams::tenant_optimization` types.rs:2712) maps
to parquet layout choices:

- ``partition_by`` (e.g. a tenant / shard-key column, `ShardKey`
  types.rs:6309): directory partitioning -> Catalyst partition pruning for
  multitenant filters, the equivalent of qdrant's tenant segment placement.
- ``bucket_by`` on id (via a stable hash column): co-locates same-id rows
  for merge/upsert joins — the hash-ring analogue (hash_ring.rs:140).
- cluster column from IVF (operators/ann.py): partition by cluster for
  nprobe partition pruning.

Snapshots (versioned directories + CURRENT pointer) come from
streaming/ingest.ParquetPointsSink; this module is the batch-side reader/
writer with the same layout.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rm(path: str) -> None:
    """Remove an intermediate rewrite directory (local filesystem; on a real
    deployment the versioned-snapshot sink in streaming/ingest.py replaces
    this read-modify-write dance entirely)."""
    shutil.rmtree(path, ignore_errors=True)


class PointsTable:
    def __init__(self, spark: SparkSession, path: str, *, id_col: str = "id",
                 partition_by: list[str] | None = None):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.partition_by = partition_by or []

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def write(self, df: DataFrame, *, mode: str = "overwrite",
              shard_buckets: int | None = None) -> None:
        """Persist with the declared layout. ``shard_buckets`` adds a
        ``__shard`` column (stable hash of id, the hash-ring analogue) and
        partitions by it so upserts and id-lookups prune files."""
        writer_df = df
        parts = list(self.partition_by)
        if shard_buckets:
            writer_df = df.withColumn(
                "__shard", F.pmod(F.xxhash64(F.col(self.id_col)), F.lit(shard_buckets))
            )
            parts.append("__shard")
        w = writer_df.write.mode(mode)
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(self.path)

    def upsert(self, updates: DataFrame, *, version_col: str | None = None) -> None:
        """Read-modify-write upsert snapshot (MERGE shape; see
        operators/mutate.upsert_points). With a transactional format this
        becomes a real MERGE INTO with the same join plan."""
        from qdrant_spark.operators.mutate import upsert_points

        current = self.read()
        merged = upsert_points(current, updates, id_col=self.id_col,
                               version_col=version_col)
        tmp = f"{self.path}__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)
        _rm(tmp)

    def optimize(self, *, target_rows_per_file: int = 1_000_000,
                 zorder_by: str | None = None) -> int:
        """Compaction — the merge_optimizer analogue (SURVEY §4.3,
        lib/shard/src/optimizers/merge_optimizer.rs): rewrite the table
        into ceil(n/target) files per partition. ``zorder_by`` sorts
        within partitions by that column first (e.g. the IVF ``__cluster``
        or a tenant key) so min/max parquet stats give row-group skipping
        on it — the poor man's Z-order, right shape for one column.
        Returns the row count rewritten."""
        import math

        df = self.read()
        n = df.count()
        n_files = max(1, math.ceil(n / target_rows_per_file))
        if zorder_by is not None:
            df = df.repartitionByRange(n_files, F.col(zorder_by)) \
                   .sortWithinPartitions(zorder_by)
        else:
            df = df.repartition(n_files)
        tmp = f"{self.path}__compact"
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
        _rm(tmp)
        return n

    # -- snapshots (src/actix/api/snapshot_api.rs: create/list/restore/
    # delete as first-class collection ops) ---------------------------------

    def _snapshot_dir(self, name: str | None = None) -> str:
        base = f"{self.path}__snapshots"
        return base if name is None else f"{base}/{name}"

    def create_snapshot(self, name: str | None = None) -> str:
        """Write a full consistent copy of the table under
        ``<path>__snapshots/<name>/`` with a manifest (row count + schema),
        mirroring the reference's collection snapshot op. The copy is a
        Spark write so it works on any storage the session can reach; the
        manifest uses the driver filesystem like the rest of this module's
        local-path plumbing. Returns the snapshot name."""
        import json
        import os
        import time

        df = self.read()
        n = df.count()
        if name is None:
            name = f"snap-{int(time.time())}-{n}"
        dest = self._snapshot_dir(name)
        df.write.mode("errorifexists").parquet(dest)
        with open(os.path.join(dest, "_manifest.json"), "w") as f:
            json.dump({"name": name, "rows": n, "id_col": self.id_col,
                       "schema": df.schema.jsonValue()}, f)
        return name

    def list_snapshots(self) -> list[dict]:
        """Manifests of all snapshots, oldest-first by name."""
        import json
        import os

        base = self._snapshot_dir()
        if not os.path.isdir(base):
            return []
        out = []
        for name in sorted(os.listdir(base)):
            mpath = os.path.join(base, name, "_manifest.json")
            if os.path.isfile(mpath):
                with open(mpath) as f:
                    out.append(json.load(f))
        return out

    def restore_snapshot(self, name: str) -> int:
        """Replace the live table with the snapshot's contents (the
        recover/restore op). Returns rows restored. The snapshot is read
        fully before the overwrite so a restore onto the same path is
        safe."""
        import os

        dest = self._snapshot_dir(name)
        if not os.path.isdir(dest):
            raise ValueError(f"unknown snapshot {name!r}")
        snap = self.spark.read.parquet(dest)
        tmp = f"{self.path}__restore"
        snap.write.mode("overwrite").parquet(tmp)
        restored = self.spark.read.parquet(tmp)
        restored.write.mode("overwrite").parquet(self.path)
        n = self.read().count()
        _rm(tmp)
        return n

    def delete_snapshot(self, name: str) -> bool:
        """Drop a snapshot directory; True if it existed."""
        import os

        dest = self._snapshot_dir(name)
        existed = os.path.isdir(dest)
        _rm(dest)
        return existed

    def vacuum(self, *, deleted_col: str = "__deleted") -> int:
        """Drop soft-deleted rows — the vacuum_optimizer analogue
        (vacuum_optimizer.rs:76-91). Returns rows removed. No-op when the
        marker column doesn't exist."""
        df = self.read()
        if deleted_col not in df.columns:
            return 0
        live = df.filter(~F.coalesce(F.col(deleted_col), F.lit(False))) \
                 .drop(deleted_col)
        removed = df.count() - live.count()
        tmp = f"{self.path}__vacuum"
        live.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
        _rm(tmp)
        return removed
