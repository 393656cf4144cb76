"""Geo cell index: pruned results must EQUAL the unindexed exact filter
for every condition type (pruning is a superset cover), and the covering
must actually prune cells."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_spark.filters import apply_filter
from qdrant_spark.operators.geo_index import (
    MAX_COVER_CELLS, add_geo_cells, covering_cells, geo_pruned_filter,
)

RADIUS = {"key": "location", "geo_radius":
          {"center": {"lat": -60.0, "lon": -150.0}, "radius": 3_000_000.0}}
BBOX = {"key": "location", "geo_bounding_box":
        {"top_left": {"lat": 60.0, "lon": 170.0},
         "bottom_right": {"lat": -60.0, "lon": -170.0}}}
# testdata longitudes cluster in [-180, -128] (user_id*3.7 % 360 - 180 with
# a small user range), so the polygon sits over that band
POLY = {"key": "location", "geo_polygon":
        {"exterior": {"points": [
            {"lat": -80.0, "lon": -180.0}, {"lat": 70.0, "lon": -170.0},
            {"lat": 60.0, "lon": -125.0}, {"lat": -70.0, "lon": -130.0},
            {"lat": -80.0, "lon": -180.0}]}}}


@pytest.fixture(scope="module")
def geo_points(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    lat = F.pmod(F.col("value"), F.lit(180.0)) - F.lit(90.0)
    lon = F.pmod(F.col("user_id") * F.lit(3.7), F.lit(360.0)) - F.lit(180.0)
    pts = ev.withColumn("location", F.struct(lon.alias("lon"), lat.alias("lat")))
    return add_geo_cells(pts, "location", precision_deg=5.0).cache()


@pytest.mark.parametrize("cond", [RADIUS, BBOX, POLY],
                         ids=["radius", "bbox", "polygon"])
def test_pruned_equals_exact(geo_points, cond):
    exact = {r.event_id for r in
             apply_filter(geo_points, {"must": [cond]}).select("event_id").collect()}
    pruned = {r.event_id for r in
              geo_pruned_filter(geo_points, cond, precision_deg=5.0)
              .select("event_id").collect()}
    assert pruned == exact and exact


@pytest.mark.parametrize("cond", [RADIUS, POLY], ids=["radius", "polygon"])
def test_covering_actually_prunes(geo_points, cond):
    body = {k: v for k, v in cond.items() if k != "key"}
    cells = covering_cells(body, precision_deg=5.0)
    n_total = (180 // 5 + 1) * (360 // 5 + 1)
    assert cells is not None and 0 < len(cells) < n_total * 0.9


def test_antimeridian_bbox_covers_both_sides():
    body = {k: v for k, v in BBOX.items() if k != "key"}
    cells = covering_cells(body, precision_deg=5.0)
    assert cells is not None
    # the wrapped bbox touches lon in [170, 180] and [-180, -170] only:
    # 25 lat rows x ~5 lon columns
    assert len(cells) < 200


def test_oversized_cover_falls_back():
    huge = {"geo_radius": {"center": {"lat": 0.0, "lon": 0.0},
                           "radius": 20_000_000.0}}
    assert covering_cells(huge, precision_deg=0.05) is None or True
    # tiny precision explodes the cover -> None fallback
    cells = covering_cells(huge, precision_deg=0.05)
    assert cells is None


def test_partitioned_layout_prunes_files(spark, geo_points, tmp_path):
    path = str(tmp_path / "geo")
    geo_points.write.mode("overwrite").partitionBy("__geo_cell").parquet(path)
    indexed = spark.read.parquet(path)
    out = geo_pruned_filter(indexed, RADIUS, precision_deg=5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__geo_cell" in plan
    exact = {r.event_id for r in
             apply_filter(geo_points, {"must": [RADIUS]}).select("event_id").collect()}
    assert {r.event_id for r in out.select("event_id").collect()} == exact


def test_antimeridian_seam_not_pruned(spark):
    """A point stored at lon=+180.0 and one at lon=-180.0 sit on the same
    meridian; a bbox covering that meridian must keep both after pruning
    (the 'pruning is strictly a superset' contract at the seam)."""
    pts = spark.createDataFrame(
        [(1, (10.0, 180.0)), (2, (10.0, -180.0)), (3, (10.0, 0.0))],
        "id: long, location: struct<lat: double, lon: double>",
    )
    cells = add_geo_cells(pts, "location", precision_deg=5.0)
    # normalization: +180 and -180 land in the SAME cell
    got = {r["id"]: r["__geo_cell"] for r in cells.collect()}
    assert got[1] == got[2]

    # haversine is periodic in longitude: a radius from lon=178 crossing
    # the meridian reaches the points stored at lon=+/-180 (~219 km away),
    # and its covering range ends exactly at +180 without wrapping — the
    # case where the old covering pruned the opposite-signed cell. Pruned
    # result must equal the unindexed exact scan (superset contract).
    for center_lon in (178.0, -178.0):
        cond = {"key": "location", "geo_radius": {
            "center": {"lat": 10.0, "lon": center_lon}, "radius": 250_000.0}}
        pruned = {r["id"] for r in geo_pruned_filter(
            cells, cond, precision_deg=5.0).collect()}
        exact = {r["id"] for r in apply_filter(
            cells, {"must": [cond]}).collect()}
        assert pruned == exact == {1, 2}, (center_lon, pruned, exact)
