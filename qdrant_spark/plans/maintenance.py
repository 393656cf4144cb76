"""Background-optimizer analogues (SURVEY §4.3): driver-side maintenance.

The reference runs four segment optimizers in background threads
(lib/shard/src/optimizers/): merge_optimizer (too many small segments →
merge), vacuum_optimizer (too many soft-deleted rows → rewrite),
indexing_optimizer (segment grew past ``indexing_threshold_kb`` → build the
HNSW/mmap index, segment_optimizer.rs:217-220), and
config_mismatch_optimizer (stored index params differ from the collection
config → rebuild).

Spark mapping: merge and vacuum are :meth:`PointsTable.optimize` /
:meth:`PointsTable.vacuum` (sources/parquet.py). This module covers the
other two as ONE idempotent command, :func:`ensure_ann_index` — the
"index maintenance job" a scheduler would run after ingest batches:

- below ``indexing_threshold`` rows it does nothing (plain scans are the
  faster plan there — the same crossover the query-time dispatcher uses,
  operators/dispatch.FULL_SCAN_THRESHOLD);
- above it, it builds an IVF index and persists it cluster-partitioned
  (directory pruning at probe time) together with a meta file recording
  the build params and corpus size;
- on later runs it LOADS the persisted index when the meta still matches,
  REBUILDS when the requested params changed (config_mismatch_optimizer)
  or the corpus drifted past ``stale_fraction`` since the build
  (indexing_optimizer's grew-past-threshold re-trigger). Small drift is
  the incremental path's job (ann.assign_to_ivf), not a rebuild.

Scale shape: the only corpus passes are the KMeans sample fit + one
assignment pass inside build_ivf; load touches nothing but the meta file.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
from pyspark.sql import DataFrame

from qdrant_spark.operators.ann import IvfIndex, build_ivf, persist_ivf
from qdrant_spark.operators.dispatch import FULL_SCAN_THRESHOLD

_META = "ivf_meta.json"
_DATA = "assigned"


def _meta_path(path: str) -> str:
    return os.path.join(path, _META)


def read_index_meta(path: str) -> dict[str, Any] | None:
    try:
        with open(_meta_path(path)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def load_ann_index(spark, path: str) -> IvfIndex:
    """Re-open a persisted index from its meta + cluster-partitioned
    parquet (no corpus pass)."""
    meta = read_index_meta(path)
    if meta is None:
        raise FileNotFoundError(f"no index meta at {path}")
    return IvfIndex(
        assigned=spark.read.parquet(os.path.join(path, _DATA)),
        centroids=np.asarray(meta["centroids"], dtype=np.float64),
        vec_col=meta["vec_col"],
        id_col=meta["id_col"],
    )


def ensure_ann_index(
    points: DataFrame,
    path: str,
    *,
    n_clusters: int = 16,
    vec_col: str = "vec",
    id_col: str = "id",
    seed: int = 42,
    fit_fraction: float | None = None,
    indexing_threshold: int = FULL_SCAN_THRESHOLD,
    stale_fraction: float = 0.2,
    total: int | None = None,
) -> tuple[IvfIndex | None, str]:
    """Idempotent index maintenance; returns ``(index, action)`` with
    action in ``{"skipped", "loaded", "built", "rebuilt"}``.

    ``total`` skips the row-count job when the caller already knows it.
    """
    n = points.count() if total is None else int(total)
    if n < indexing_threshold:
        # indexing_optimizer: small segments stay plain (is_big_for_index
        # false, indexing_optimizer.rs:74) — even if an old index exists,
        # the dispatcher's plain route wins at this size
        return None, "skipped"

    requested = {
        "n_clusters": int(n_clusters),
        "vec_col": vec_col,
        "id_col": id_col,
        "seed": int(seed),
        "fit_fraction": fit_fraction,
    }
    meta = read_index_meta(path)
    action = "built"
    if meta is not None:
        stored = {k: meta.get(k) for k in requested}
        if stored != requested:
            action = "rebuilt"  # config_mismatch_optimizer
        elif abs(n - meta["n_rows"]) > stale_fraction * max(meta["n_rows"], 1):
            action = "rebuilt"  # corpus drifted past the re-index trigger
        else:
            return load_ann_index(points.sparkSession, path), "loaded"

    index = build_ivf(points, n_clusters=n_clusters, vec_col=vec_col,
                      id_col=id_col, seed=seed, fit_fraction=fit_fraction)
    index = persist_ivf(index, os.path.join(path, _DATA))
    os.makedirs(path, exist_ok=True)
    with open(_meta_path(path), "w") as f:
        json.dump({**requested, "n_rows": n, "dim": index.centroids.shape[1],
                   "centroids": index.centroids.tolist()}, f)
    return index, action
