"""Continuous query serving + IVF-maintaining ingest (streaming/serve.py):
a streamed request log must produce exactly the batch knn_batch answers,
a live corpus must be visible to requests arriving after its commit, and
a streamed-in IVF index must equal the batch-built one."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qdrant_spark.operators.knn import knn, knn_batch
from qdrant_spark.streaming.ingest import ParquetPointsSink
from qdrant_spark.streaming.serve import (
    live_ivf_index, start_ivf_upsert_stream, start_search_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def requests_df(spark, emb):
    """6 requests: the first 6 corpus vectors, re-keyed as qids."""
    return (emb.filter(F.col("vec_id") < 6)
            .select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qvec"))
            .cache())


def _hits(spark, results_dir):
    rows = spark.read.parquet(results_dir).collect()
    return sorted((r["qid"], r["rank"], r["vec_id"], round(r["score"], 6))
                  for r in rows)


def test_search_stream_equals_batch(spark, emb, requests_df, tmp_path):
    req_dir = str(tmp_path / "requests")
    requests_df.repartitionByRange(3, "qid").write.parquet(req_dir)
    stream = (spark.readStream.schema(requests_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(req_dir))
    res_dir, ckpt = str(tmp_path / "results"), str(tmp_path / "ckpt")
    q = start_search_stream(
        stream, emb, results_dir=res_dir, checkpoint_dir=ckpt,
        k=5, metric="cosine", id_col="vec_id", vec_col="embedding",
    )
    q.awaitTermination()
    want = knn_batch(emb, requests_df, metric="cosine", k=5,
                     id_col="vec_id", vec_col="embedding").collect()
    assert _hits(spark, res_dir) == sorted(
        (r["qid"], r["rank"], r["vec_id"], round(r["score"], 6)) for r in want)


def test_search_stream_sees_committed_ingest(spark, emb, tmp_path):
    """Requests answered after an ingest commit see the new points —
    read-your-acknowledged-writes across the two streams; the request
    checkpoint processes each request file exactly once."""
    table_dir = str(tmp_path / "table")
    sink = ParquetPointsSink(spark, table_dir, id_col="vec_id")
    first = emb.filter(F.col("vec_id") < 400)
    sink.apply_batch(first, 0)

    probe = emb.filter(F.col("vec_id") == 450).collect()[0]["embedding"]
    req_dir = str(tmp_path / "requests")
    os.makedirs(req_dir)
    one = spark.createDataFrame([(0, probe)], "qid long, qvec array<float>")
    one.coalesce(1).write.mode("append").parquet(req_dir)

    res_dir, ckpt = str(tmp_path / "results"), str(tmp_path / "ckpt")

    def serve_available():
        stream = (spark.readStream.schema(one.schema)
                  .option("maxFilesPerTrigger", 1).parquet(req_dir))
        q = start_search_stream(
            stream, sink.read, results_dir=res_dir, checkpoint_dir=ckpt,
            k=1, metric="cosine", id_col="vec_id", vec_col="embedding",
        )
        q.awaitTermination()

    serve_available()
    got1 = spark.read.parquet(res_dir).collect()
    assert len(got1) == 1 and got1[0]["vec_id"] != 450  # 450 not ingested yet

    sink.apply_batch(emb.filter(F.col("vec_id") >= 400), 1)
    two = spark.createDataFrame([(1, probe)], "qid long, qvec array<float>")
    two.coalesce(1).write.mode("append").parquet(req_dir)
    serve_available()  # checkpoint resume: only the new request file runs
    by_qid = {r["qid"]: r for r in spark.read.parquet(res_dir).collect()}
    assert len(by_qid) == 2  # qid 0 was NOT re-answered
    assert by_qid[1]["vec_id"] == 450  # the new point is its own top-1


def test_ivf_ingest_stream_matches_batch_index(spark, emb, tmp_path):
    from qdrant_spark.operators.ann import build_ivf, ivf_from_centroids, ivf_search

    cents = build_ivf(emb, n_clusters=8, vec_col="embedding",
                      id_col="vec_id").centroids

    src_dir = str(tmp_path / "points_src")
    emb.repartitionByRange(2, "vec_id").write.parquet(src_dir)
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    sink = ParquetPointsSink(spark, str(tmp_path / "table"), id_col="vec_id")
    q = start_ivf_upsert_stream(
        stream, sink, cents,
        checkpoint_dir=str(tmp_path / "ckpt"), vec_col="embedding",
    )
    q.awaitTermination()

    index = live_ivf_index(sink, cents, vec_col="embedding")
    snap = index.assigned
    assert snap.count() == emb.count() and "__cluster" in snap.columns

    # streamed assignment == batch assignment against the same centroids
    batch = ivf_from_centroids(emb, cents, vec_col="embedding",
                               id_col="vec_id").assigned
    diff = (snap.select("vec_id", "__cluster")
            .exceptAll(batch.select("vec_id", "__cluster")))
    assert diff.count() == 0

    # full probe over the streamed index == exact knn over the raw corpus
    probe = emb.filter(F.col("vec_id") == 123).collect()[0]["embedding"]
    got = [(r["vec_id"], round(r["score"], 6))
           for r in ivf_search(index, probe, k=5, nprobe=8,
                               metric="cosine").collect()]
    want = [(r["vec_id"], round(r["score"], 6))
            for r in knn(emb, probe, k=5, metric="cosine",
                         id_col="vec_id", vec_col="embedding").collect()]
    assert got == want


def test_sparse_index_stream_equals_batch(spark, tmp_path):
    """Streamed-in sparse inverted index == the batch-built one: after the
    stream drains, sparse_knn_index over the live pairs snapshot must
    equal sparse_knn over the final corpus; a re-upsert replaces the
    point's whole posting set (incl. clearing it on an empty vector)."""
    from qdrant_spark.operators.sparse import sparse_knn, sparse_knn_index
    from qdrant_spark.streaming.serve import (
        SparsePairsSink, live_sparse_index, start_sparse_index_stream,
    )

    schema = ("id long, sparse_indices array<long>, "
              "sparse_values array<double>")
    batch1 = spark.createDataFrame(
        [(1, [1, 2], [1.0, 2.0]), (2, [2, 3], [1.0, 1.0])], schema)
    # batch2 re-upserts id 1 (new postings) and clears id 2
    batch2 = spark.createDataFrame(
        [(1, [3], [5.0]), (2, [], []), (3, [1, 3], [2.0, 1.0])], schema)
    src = str(tmp_path / "pts")
    sink = SparsePairsSink(spark, str(tmp_path / "pairs"), id_col="id")

    # two sequential availableNow drains on ONE checkpoint pin the commit
    # order (the checkpoint resumes past batch1's file — the WAL contract)
    for batch in (batch1, batch2):
        batch.coalesce(1).write.mode("append").parquet(src)
        stream = (spark.readStream.schema(batch1.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_sparse_index_stream(
            stream, sink, checkpoint_dir=str(tmp_path / "ckpt"))
        q.awaitTermination()

    idx = live_sparse_index(sink)
    final = batch2
    want = [(r["id"], round(r["score"], 9)) for r in sparse_knn(
        final, [1, 3], [1.0, 1.0], k=5).collect()]
    got = [(r["id"], round(r["score"], 9)) for r in sparse_knn_index(
        idx, [1, 3], [1.0, 1.0], k=5).collect()]
    assert got == want
    # id 2's postings were cleared by the empty re-upsert
    assert idx.pairs.filter(F.col("id") == 2).count() == 0
    # exactly the final posting sets remain
    assert sorted((r["id"], r["dim"], r["v"])
                  for r in idx.pairs.collect()) == [
        (1, 3, 5.0), (3, 1, 2.0), (3, 3, 1.0)]


def test_quant_ingest_stream_matches_batch_codes(spark, emb, tmp_path):
    """stream==batch gate for the quant-maintaining ingest: the snapshot's
    frozen-state codes equal a batch encode, and quant_search over the
    live handle equals the exact scan (rescore is exact)."""
    from qdrant_spark.operators.knn import knn
    from qdrant_spark.operators.quantize import (
        build_quant, encode_quant, quant_search,
    )
    from qdrant_spark.streaming.serve import (
        live_quant_handle, start_quant_upsert_stream,
    )

    handle = build_quant(emb, {"scalar": {"type": "int8"}},
                         vec_col="embedding", id_col="vec_id")
    src_dir = str(tmp_path / "qpoints_src")
    emb.repartitionByRange(2, "vec_id").write.parquet(src_dir)
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    sink = ParquetPointsSink(spark, str(tmp_path / "qtable"),
                             id_col="vec_id")
    q = start_quant_upsert_stream(
        stream, sink, handle, checkpoint_dir=str(tmp_path / "qckpt"))
    q.awaitTermination()

    live = live_quant_handle(sink, handle)
    snap = live.index.codes
    assert snap.count() == emb.count() and "__sq" in snap.columns

    # streamed frozen-state codes == batch encode with the same state
    batch = encode_quant(handle, emb).select("vec_id", "__sq")
    diff = snap.select("vec_id", "__sq").exceptAll(batch)
    assert diff.count() == 0

    # coarse+rescore over the live handle == exact scan
    probe = list(emb.filter(F.col("vec_id") == 123).first()["embedding"])
    got = [(r["vec_id"], round(r["score"], 6))
           for r in quant_search(live, probe, k=5, metric="cosine",
                                 oversampling=8.0).collect()]
    want = [(r["vec_id"], round(r["score"], 6))
            for r in knn(emb, probe, metric="cosine", k=5,
                         vec_col="embedding", id_col="vec_id",
                         select=["vec_id", "score"]).collect()]
    assert got == want


@pytest.mark.parametrize("kind", ["scalar", "binary", "product", "turbo"])
def test_maxsim_quant_ingest_stream_matches_batch(spark, emb, tmp_path,
                                                  kind):
    """stream==batch gate for the quantized-MULTIVECTOR ingest: the
    snapshot's frozen-state token codes equal a batch encode, and the
    quantized MaxSim search over the live index equals the exact MaxSim
    scan (rescore is exact) — for ALL FOUR token-code kinds since r12."""
    from qdrant_spark.operators.multivec import (
        build_maxsim_bq, build_maxsim_pq, build_maxsim_sq, build_maxsim_tq,
        encode_maxsim, maxsim_knn, maxsim_knn_quant,
    )
    from qdrant_spark.streaming.serve import (
        live_maxsim_quant_index, start_maxsim_quant_upsert_stream,
    )

    d_mv = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.slice(F.col("embedding").cast("array<double>"),
                          i * 8 + 1, 8))
    pts = emb.select("vec_id", d_mv.alias("mv"))
    search = maxsim_knn_quant
    if kind == "binary":
        idx = build_maxsim_bq(pts, mv_col="mv", id_col="vec_id")
        code_col = "__mbq"
    elif kind == "product":
        idx = build_maxsim_pq(pts, mv_col="mv", id_col="vec_id",
                              n_subspaces=4, sample_tokens=4000)
        code_col = "__mpq"
    elif kind == "turbo":
        idx = build_maxsim_tq(pts, mv_col="mv", id_col="vec_id", bits=4)
        code_col = "__mtq"
    else:
        idx = build_maxsim_sq(pts, mv_col="mv", id_col="vec_id")
        code_col = "__msq"

    src_dir = str(tmp_path / f"mvq_src_{kind}")
    pts.repartitionByRange(2, "vec_id").write.parquet(src_dir)
    stream = (spark.readStream.schema(pts.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    sink = ParquetPointsSink(spark, str(tmp_path / f"mvq_table_{kind}"),
                             id_col="vec_id")
    q = start_maxsim_quant_upsert_stream(
        stream, sink, idx,
        checkpoint_dir=str(tmp_path / f"mvq_ckpt_{kind}"))
    q.awaitTermination()

    live = live_maxsim_quant_index(sink, idx)
    snap = live.codes
    n = pts.count()
    assert snap.count() == n and code_col in snap.columns

    # streamed frozen-state codes == batch encode with the same state
    # (collect-compare: exceptAll over the nested-lambda encode plan
    # trips a Catalyst attribute-rebinding bug, "key not found:
    # embedding#N" — the data path itself is fine)
    def rows(df):
        return sorted((r["vec_id"], tuple(map(tuple, r[code_col])))
                      for r in df.select("vec_id", code_col).collect())

    assert rows(snap) == rows(encode_maxsim(idx, pts))

    # quantized MaxSim over the live index == exact scan (corpus-wide
    # oversampling keeps every doc through the coarse cut)
    probe_row = pts.filter(F.col("vec_id") == 7).first()
    q_mv = [list(t) for t in probe_row["mv"]]
    got = [(r["vec_id"], round(r["score"], 6)) for r in search(
        live, q_mv, k=5, oversampling=n / 5.0, metric="dot").collect()]
    want = [(r["vec_id"], round(r["score"], 6)) for r in maxsim_knn(
        pts, q_mv, k=5, metric="dot", mv_col="mv",
        id_col="vec_id").collect()]
    assert got == want


def test_maxsim_invlist_ingest_stream_matches_batch(spark, emb, tmp_path):
    """Streamed-in multivector INVLIST == the batch-built layout (r14 —
    the streaming half of the invlist lifecycle): frozen token-space
    centroids assign each micro-batch's tokens map-only, the snapshot
    keeps one full-row copy per distinct (doc, cluster) partitioned by
    cluster, live_maxsim_ivf_index answers bit-identically to the
    batch invlist route, and an upsert's new vectors are scored FRESH
    (the batch layout's frozen-float staleness can't arise: copies
    rewrite in the same commit)."""
    from qdrant_spark.operators.multivec import (
        build_maxsim_ivf, maxsim_knn, maxsim_knn_ivf, persist_maxsim_ivf,
        persist_maxsim_ivf_points,
    )
    from qdrant_spark.streaming.serve import (
        MaxSimInvlistSink, live_maxsim_ivf_index,
        start_maxsim_ivf_upsert_stream,
    )

    td = 8
    mv = emb.select(
        "vec_id",
        F.transform(F.sequence(F.lit(0), F.lit(7)),
                    lambda i: F.slice(F.col("embedding")
                                      .cast("array<double>"),
                                      i * td + 1, td)).alias("mv")).cache()
    batch_idx = build_maxsim_ivf(mv, n_clusters=8, mv_col="mv",
                                 id_col="vec_id")
    cents = batch_idx.centroids
    inv = persist_maxsim_ivf_points(
        persist_maxsim_ivf(batch_idx, str(tmp_path / "tok")),
        str(tmp_path / "inv"))

    src_dir = str(tmp_path / "mv_src")
    mv.repartitionByRange(2, "vec_id").write.parquet(src_dir)
    stream = (spark.readStream.schema(mv.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    sink = MaxSimInvlistSink(spark, str(tmp_path / "invtable"),
                             id_col="vec_id")
    q = start_maxsim_ivf_upsert_stream(
        stream, sink, cents,
        checkpoint_dir=str(tmp_path / "ckpt"), mv_col="mv")
    q.awaitTermination()

    live = live_maxsim_ivf_index(sink, cents, mv_col="mv")
    # same copy multiset as the batch layout
    assert live.clustered_points.count() == inv.clustered_points.count()
    qmv = [list(t) for t in mv.limit(1).collect()[0]["mv"]]
    for npb in (2, 8):
        want = [(r["vec_id"], round(r["score"], 9))
                for r in maxsim_knn_ivf(inv, qmv, k=5, nprobe=npb,
                                        metric="dot").collect()]
        got = [(r["vec_id"], round(r["score"], 9))
               for r in maxsim_knn_ivf(live, qmv, k=5, nprobe=npb,
                                       metric="dot").collect()]
        assert got == want, npb
    # the live probe is file-level pruning, like the batch layout
    plan = maxsim_knn_ivf(live, qmv, k=5, nprobe=1, metric="dot") \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    assert re.search(r"PartitionFilters: \[[^\]]*__cluster[^\]]*IN", plan)

    # update one doc's vectors through the stream: fresh scores, no
    # stale frozen copies (the r13 ADVICE scenario, solved structurally)
    row0 = mv.limit(1).collect()[0]
    upd = spark.createDataFrame(
        [(int(row0["vec_id"]),
          [[float(x) * 3.0 for x in t] for t in row0["mv"]])],
        mv.schema)
    upd.coalesce(1).write.mode("append").parquet(src_dir)
    q = start_maxsim_ivf_upsert_stream(
        stream, sink, cents,
        checkpoint_dir=str(tmp_path / "ckpt"), mv_col="mv")
    q.awaitTermination()
    live2 = live_maxsim_ivf_index(sink, cents, mv_col="mv")
    assert live2.points.count() == mv.count()  # replaced, not appended
    mv2 = mv.filter(F.col("vec_id") != int(row0["vec_id"])) \
        .unionByName(upd)
    want2 = [(r["vec_id"], round(r["score"], 9))
             for r in maxsim_knn(mv2, qmv, k=5, metric="dot",
                                 mv_col="mv", id_col="vec_id").collect()]
    got2 = [(r["vec_id"], round(r["score"], 9))
            for r in maxsim_knn_ivf(live2, qmv, k=5, nprobe=8,
                                    metric="dot").collect()]
    assert got2 == want2


def test_quant_ivf_ingest_stream_matches_batch(spark, emb, tmp_path):
    """Streamed-in COMPOSED quant x IVF == the batch-built layout (r14 —
    the dense twin of the invlist stream; the streaming ingest
    previously never built clustered_full): frozen centroids assign and
    the frozen quantizer encodes each micro-batch map-only, the
    cluster-partitioned snapshot carries codes AND floats, and
    live_quant_ivf_handle answers bit-identically to the batch composed
    index — with file-level PartitionFilters on the probes."""
    import re

    from qdrant_spark.operators.ann import build_ivf, persist_ivf
    from qdrant_spark.operators.quantize import (
        build_quant, compose_quant_ivf, quant_ivf_search,
    )
    from qdrant_spark.streaming.serve import (
        live_quant_ivf_handle, start_quant_ivf_upsert_stream,
    )

    handle = build_quant(emb, {"scalar": {}}, vec_col="embedding",
                         id_col="vec_id")
    ivf = persist_ivf(
        build_ivf(emb, n_clusters=8, vec_col="embedding",
                  id_col="vec_id"),
        str(tmp_path / "ivf"))
    batch_qih = compose_quant_ivf(handle, ivf, nprobe=4)
    assert batch_qih.clustered_full is not None

    src_dir = str(tmp_path / "pts_src")
    emb.repartitionByRange(2, "vec_id").write.parquet(src_dir)
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    from qdrant_spark.streaming.ingest import ParquetPointsSink

    sink = ParquetPointsSink(spark, str(tmp_path / "table"),
                             id_col="vec_id",
                             partition_cols=("__cluster",))
    q = start_quant_ivf_upsert_stream(
        stream, sink, ivf.centroids, handle,
        checkpoint_dir=str(tmp_path / "ckpt"), vec_col="embedding")
    q.awaitTermination()

    live = live_quant_ivf_handle(sink, ivf.centroids, handle, nprobe=4)
    assert live.clustered_full is not None
    assert live.coded.count() == emb.count()
    qv = list(emb.limit(1).collect()[0]["embedding"])
    for npb in (2, 8):
        want = [(r["vec_id"], round(r["score"], 9))
                for r in quant_ivf_search(batch_qih, qv, k=5, nprobe=npb,
                                          oversampling=8.0).collect()]
        got = [(r["vec_id"], round(r["score"], 9))
               for r in quant_ivf_search(live, qv, k=5, nprobe=npb,
                                         oversampling=8.0).collect()]
        assert got == want, npb
    plan = quant_ivf_search(live, qv, k=5, nprobe=2, oversampling=8.0) \
        ._jdf.queryExecution().executedPlan().toString()
    hits = re.findall(r"PartitionFilters: \[[^\]]*__cluster[^\]]*IN",
                      plan)
    assert len(hits) >= 2, plan[:1500]
