"""Geo cell index: the layout analogue of the reference's geo field index
(lib/segment/src/index/field_index/geo_index/ — geohash cells mapped to
posting lists, queried via region-to-cell covering).

Spark-native shape: quantize (lat, lon) into fixed-degree grid cells stored
as a LONG column; persist the table partitioned (or Z-ordered) by that
column, and every geo condition first computes its covering cell set
driver-side — the cell predicate becomes partition pruning / row-group
skipping — then applies the EXACT per-row geo predicate from `filters.py`
on the survivors. Pruning is strictly a superset filter, so results are
identical to the unindexed scan (the correctness gate asserts equality).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qdrant_spark.filters import EARTH_RADIUS_M, apply_filter

#: above this many covering cells the predicate stops paying for itself —
#: fall back to the plain exact scan (mirrors the reference's
#: region-covering cap, geo_index max_region_points)
MAX_COVER_CELLS = 8192


def _n_lon(precision_deg: float) -> int:
    return int(math.ceil(360.0 / precision_deg)) + 1


def geo_cell(lat: Column, lon: Column, precision_deg: float = 5.0) -> Column:
    """Grid cell id for a (lat, lon) pair: ``lat_idx * n_lon + lon_idx``
    with ``precision_deg``-sized cells. Pure column math.

    Longitude is normalized into [-180, 180) via pmod so +180.0 and
    -180.0 (the same physical meridian) land in the SAME cell — without
    this, a covering range ending exactly at +180 could prune a point
    stored with the opposite-signed boundary longitude, breaking the
    "pruning is strictly a superset" contract."""
    n_lon = _n_lon(precision_deg)
    lat_idx = F.floor((lat + F.lit(90.0)) / F.lit(precision_deg))
    lon_idx = F.floor(F.pmod(lon + F.lit(180.0), F.lit(360.0)) / F.lit(precision_deg))
    return (lat_idx * F.lit(n_lon) + lon_idx).cast("long")


def add_geo_cells(
    df: DataFrame,
    key: str = "location",
    precision_deg: float = 5.0,
    cell_col: str = "__geo_cell",
) -> DataFrame:
    """Attach the cell column for a struct field holding ``lat``/``lon``.
    At scale, write the result ``partitionBy(cell_col)`` (or Z-order on
    it) so covering-cell predicates prune files."""
    lat = F.col(f"{key}.lat")
    lon = F.col(f"{key}.lon")
    return df.withColumn(cell_col, geo_cell(lat, lon, precision_deg))


def _cell_ids(lat_indices, lon_indices, n_lon: int) -> list[int]:
    return [la * n_lon + lo for la in lat_indices for lo in lon_indices]


def _lat_range_idx(lat_min: float, lat_max: float, p: float) -> range:
    lo = int(math.floor((max(lat_min, -90.0) + 90.0) / p))
    hi = int(math.floor((min(lat_max, 90.0) + 90.0) / p))
    return range(lo, hi + 1)


def _lon_range_idx(lon_min: float, lon_max: float, p: float) -> set[int]:
    """Antimeridian-aware: lon_min > lon_max means the range wraps.

    Seam handling: +180 and -180 are the same meridian, so a range that
    touches either boundary includes BOTH cells that boundary can map to
    (cell 0 for the normalized form, the last lon cell for tables whose
    cell column predates the geo_cell pmod normalization) — a superset,
    so pruning stays conservative."""
    last = int(math.floor(360.0 / p))

    def rng(a: float, b: float) -> set[int]:
        lo = int(math.floor((max(a, -180.0) + 180.0) / p))
        hi = int(math.floor((min(b, 180.0) + 180.0) / p))
        out = set(range(lo, hi + 1))
        if min(b, 180.0) >= 180.0 or max(a, -180.0) <= -180.0:
            out |= {0, last}
        return out

    if lon_min <= lon_max:
        return rng(lon_min, lon_max)
    return rng(lon_min, 180.0) | rng(-180.0, lon_max)


def covering_cells(cond: dict[str, Any], precision_deg: float = 5.0) -> list[int] | None:
    """Cell ids covering a geo condition body (``{"geo_radius": ...}`` /
    ``geo_bounding_box`` / ``geo_polygon``); None when the covering
    exceeds :data:`MAX_COVER_CELLS` (caller falls back to the full scan).
    The covering is conservative (bbox-based), never excludes a match."""
    p = precision_deg
    n_lon = _n_lon(p)
    if "geo_bounding_box" in cond:
        b = cond["geo_bounding_box"]
        lat_r = _lat_range_idx(b["bottom_right"]["lat"], b["top_left"]["lat"], p)
        lon_r = _lon_range_idx(b["top_left"]["lon"], b["bottom_right"]["lon"], p)
    elif "geo_radius" in cond:
        b = cond["geo_radius"]
        lat0, lon0 = float(b["center"]["lat"]), float(b["center"]["lon"])
        r = float(b["radius"])
        dlat = math.degrees(r / EARTH_RADIUS_M)
        lat_min, lat_max = lat0 - dlat, lat0 + dlat
        # narrowest parallel in the band dictates the lon spread
        band_cos = min(
            math.cos(math.radians(max(min(lat_min, 90.0), -90.0))),
            math.cos(math.radians(max(min(lat_max, 90.0), -90.0))),
        )
        if band_cos <= 1e-6 or lat_min <= -90.0 or lat_max >= 90.0:
            lon_r = set(range(0, n_lon))
        else:
            dlon = dlat / band_cos
            if dlon >= 180.0:
                lon_r = set(range(0, n_lon))
            else:
                lo, hi = lon0 - dlon, lon0 + dlon
                if lo < -180.0:
                    lo += 360.0
                if hi > 180.0:
                    hi -= 360.0
                lon_r = _lon_range_idx(lo, hi, p)
        lat_r = _lat_range_idx(lat_min, lat_max, p)
    elif "geo_polygon" in cond:
        pts = cond["geo_polygon"]["exterior"]["points"]
        lats = [float(q["lat"]) for q in pts]
        lons = [float(q["lon"]) for q in pts]
        lat_r = _lat_range_idx(min(lats), max(lats), p)
        lon_r = _lon_range_idx(min(lons), max(lons), p)
    else:
        raise ValueError(f"not a geo condition: {list(cond)!r}")
    cells = _cell_ids(lat_r, lon_r, n_lon)
    if len(cells) > MAX_COVER_CELLS:
        return None
    return cells


def geo_pruned_filter(
    df: DataFrame,
    cond: dict[str, Any],
    precision_deg: float = 5.0,
    cell_col: str = "__geo_cell",
) -> DataFrame:
    """Exact geo filter with cell pre-pruning: the covering-cell predicate
    (partition pruning on a cell-partitioned table) narrows the scan, then
    the exact condition from ``filters.py`` decides membership — results
    always equal ``apply_filter`` without the index."""
    body = {k: v for k, v in cond.items() if k != "key"}
    cells = covering_cells(body, precision_deg)
    pruned = df if cells is None else df.filter(F.col(cell_col).isin(cells))
    return apply_filter(pruned, {"must": [cond]})
