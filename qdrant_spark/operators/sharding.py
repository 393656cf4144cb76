"""Shard-key routing: the distributed-placement surface re-expressed as
partition-column pruning.

Reference: custom sharding — every point op and query carries an optional
``shard_key`` selector (``ShardKeySelector``: one key, many keys, or
target-with-fallback — lib/collection/src/operations/shard_selector_internal.rs:30-62;
``ShardKey::{Keyword, Number}`` lib/segment/src/types.rs:6309); default
sharding routes by hashing the point id over a hash ring
(lib/collection/src/hash_ring.rs:140). Reads with a fallback route to the
target key's shards when they exist, else to the fallback key's
(shard_holder/mod.rs:721-784).

Spark-first shape: a shard is a partition directory. ``shard_key`` is a
plain column written with ``partitionBy``, so a selector compiles to an
``isin`` filter that Catalyst turns into directory-level partition pruning —
the query never opens non-selected shards, exactly like the reference's
shard routing, with zero custom machinery at read time. At 100 TB this is
the difference between scanning one tenant and scanning the fleet.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assign_shard_key(points: DataFrame, key: Any,
                     col: str = "shard_key") -> DataFrame:
    """Custom sharding: attach a user-chosen shard key (a literal for a
    whole upsert batch, or a Column computed per point — e.g. a tenant
    field). Write with ``.write.partitionBy(col)`` to make it a shard."""
    return points.withColumn(col, key if isinstance(key, Column) else F.lit(key))


def auto_shard_key(points: DataFrame, n_shards: int, *, id_col: str = "id",
                   col: str = "shard_key") -> DataFrame:
    """Default sharding analogue: stable-hash the point id into one of
    ``n_shards`` buckets (hash_ring.rs routing). Deterministic across runs,
    so re-ingest routes identically."""
    return points.withColumn(
        col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int"))


def _normalize(selector: Any) -> list:
    return list(selector) if isinstance(selector, (list, tuple, set)) else [selector]


def shard_selector_condition(selector: Any, col: str = "shard_key") -> Column:
    """Compile ShardKey / ShardKeys to a pruning predicate."""
    return F.col(col).isin(_normalize(selector))


def select_shards(
    points: DataFrame,
    selector: Any,
    *,
    col: str = "shard_key",
    existing_keys: Iterable[Any] | None = None,
) -> DataFrame:
    """Route a read. ``selector`` is a key, a list of keys, or the fallback
    form ``{"target": k, "fallback": k2}``; ``None`` selects all shards
    (``ShardSelectorInternal::Empty``).

    Fallback resolution needs to know whether the target shard exists — in
    the reference that is the shard_key→ids metadata map, and the Spark
    analogue is the partition directory listing: pass it as
    ``existing_keys`` (e.g. from the table's partition values). Without it,
    a bounded ``distinct()`` probe on the shard column computes the same
    set (one column scan, cardinality = shard count — fine at any corpus
    width, but prefer the metadata path in a hot loop)."""
    if selector is None:
        return points
    if isinstance(selector, dict):
        target, fallback = selector["target"], selector["fallback"]
        if existing_keys is None:
            existing_keys = [
                r[0] for r in points.select(col).distinct().collect()
            ]
        chosen = target if target in set(existing_keys) else fallback
        return points.filter(shard_selector_condition(chosen, col))
    return points.filter(shard_selector_condition(selector, col))
