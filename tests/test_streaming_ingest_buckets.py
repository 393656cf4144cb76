"""Incremental (id-bucketed) snapshot commits of ParquetPointsSink:
value-equality with the full-rewrite commit, dirty-bucket-only writes
(clean buckets carried over by hardlink), and the version-conflict
semantics of upsert_points preserved inside dirty buckets."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from qdrant_spark.operators.mutate import upsert_points
from qdrant_spark.streaming.ingest import BUCKET_COL, ParquetPointsSink


def _rows(df):
    return sorted(map(tuple, df.select("id", "payload", "v").collect()))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, payload string, v long")


def _base(spark, n=500):
    return _mk(spark, [(i, f"p{i}", 1) for i in range(n)])


def test_incremental_equals_full_rewrite(spark, tmp_path):
    base = _base(spark)
    b1 = _mk(spark, [(7, "updated", 2), (1_000_001, "new", 1)])
    b2 = _mk(spark, [(7, "stale", 1), (123, "touched", 3)])

    full = ParquetPointsSink(spark, str(tmp_path / "full"),
                             id_col="id", version_col="v")
    inc = ParquetPointsSink(spark, str(tmp_path / "inc"),
                            id_col="id", version_col="v", id_buckets=8)
    for i, b in enumerate([base, b1, b2]):
        full.apply_batch(b, i)
        inc.apply_batch(b, i)
    assert _rows(full.read()) == _rows(inc.read())
    # same rows as the one-shot batch merge
    want = upsert_points(upsert_points(base, b1, id_col="id",
                                       version_col="v"),
                         b2, id_col="id", version_col="v")
    assert _rows(inc.read()) == _rows(want)
    # stale-op skip survived the bucketed path: id 7 keeps version 2
    got = {r["id"]: (r["payload"], r["v"]) for r in inc.read().collect()}
    assert got[7] == ("updated", 2)
    assert got[123] == ("touched", 3)
    # reader surface hides the commit-layout column
    assert BUCKET_COL not in inc.read().columns


def test_incremental_rewrites_only_dirty_buckets(spark, tmp_path):
    inc = ParquetPointsSink(spark, str(tmp_path / "t"),
                            id_col="id", id_buckets=8)
    base = _base(spark)
    inc.apply_batch(base, 0)
    # pick batch ids from ONE bucket so exactly one bucket is dirty
    v0 = os.path.join(str(tmp_path / "t"), "_v0")
    some = (spark.read.parquet(v0)
            .filter(F.col(BUCKET_COL) == 3).limit(5).collect())
    assert some, "bucket 3 unexpectedly empty"
    batch = _mk(spark, [(r["id"], "upd", 9) for r in some])
    inc.apply_batch(batch, 1)
    v1 = os.path.join(str(tmp_path / "t"), "_v1")
    written = {d for d in os.listdir(v1) if d.startswith(BUCKET_COL)}
    assert written == {f"{BUCKET_COL}={b}" for b in range(8)}
    # clean buckets are hardlinks of the previous snapshot's files
    # (st_nlink >= 2), the dirty bucket is freshly written
    def nlinks(bdir):
        files = [os.path.join(dp, f)
                 for dp, _dn, fn in os.walk(os.path.join(v1, bdir))
                 for f in fn]
        assert files
        return {os.stat(p).st_nlink for p in files}

    assert nlinks(f"{BUCKET_COL}=4") == {2}
    assert nlinks(f"{BUCKET_COL}=3") == {1}
    # the updated rows are served
    got = {r["id"]: r["payload"] for r in inc.read().collect()}
    for r in some:
        assert got[r["id"]] == "upd"


def test_incremental_empty_batch_is_pure_carry_over(spark, tmp_path):
    inc = ParquetPointsSink(spark, str(tmp_path / "t"),
                            id_col="id", id_buckets=4)
    base = _base(spark, n=50)
    inc.apply_batch(base, 0)
    inc.apply_batch(base.limit(0), 1)
    assert _rows(inc.read()) == _rows(base)


def test_unbucketed_previous_snapshot_upgrades_once(spark, tmp_path):
    # layout change: a sink that previously committed flat snapshots is
    # reopened with id_buckets set — the next batch re-buckets the
    # whole table, the one after commits incrementally
    d = str(tmp_path / "t")
    flat = ParquetPointsSink(spark, d, id_col="id")
    flat.apply_batch(_base(spark, n=50), 0)
    inc = ParquetPointsSink(spark, d, id_col="id", id_buckets=4)
    inc.apply_batch(_mk(spark, [(1, "x", 2)]), 1)
    v1 = os.path.join(d, "_v1")
    assert any(x.startswith(BUCKET_COL) for x in os.listdir(v1))
    got = {r["id"]: r["payload"] for r in inc.read().collect()}
    assert got[1] == "x" and len(got) == 50
