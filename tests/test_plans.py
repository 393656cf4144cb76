"""Physical-plan regression tests: the scale claims in README ("Scale
design") asserted against `.explain` output, so a refactor that silently
de-optimizes a plan (lost pushdown, a broadcast that became a sort-merge
join, a top-k that became a global sort) fails CI, not a 100 TB run.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qdrant_spark.filters import apply_filter
from qdrant_spark.operators.knn import knn, knn_batch


def _plan(df, mode: str = "formatted") -> str:
    jdf = df._jdf
    return jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def docs_path(documents):
    return documents


def test_filter_pushdown_reaches_parquet(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flt = {"must": [{"key": "lang", "match": {"value": "en"}},
                    {"key": "n_chars", "range": {"gt": 10}}]}
    plan = _plan(apply_filter(df, flt).select("doc_id"))
    assert "PushedFilters:" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "lang" in pushed and "n_chars" in pushed


def test_projection_prunes_scan_columns(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(df.select("doc_id", "lang"))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "lang" in read and "text" not in read


def test_single_knn_is_take_ordered(embeddings):
    q = [0.0] * 64
    df = knn(embeddings, q, metric="cosine", k=10, vec_col="embedding",
             id_col="vec_id", select=["vec_id", "score"])
    plan = _plan(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_batch_knn_window_broadcasts_queries(embeddings, spark):
    qdf = spark.createDataFrame([(0, [0.0] * 64)], "qid: long, qvec: array<float>")
    df = knn_batch(embeddings, qdf, metric="cosine", k=5, vec_col="embedding",
                   id_col="vec_id", strategy="window")
    plan = _plan(df, "simple")
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_index_search_all_broadcast(documents):
    from qdrant_spark.operators.sparse import bm25_search_index, build_bm25_index

    idx = build_bm25_index(documents)
    df = bm25_search_index(idx, "quality data fox")
    plan = _plan(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_batch_prunes_clusters_no_join(embeddings, spark):
    """The probe map is broadcast inside the Arrow scorer; the plan must be
    a cluster-pruning filter + one MapInArrow — never a pair-materializing
    join or cross product."""
    from qdrant_spark.operators.ann import build_ivf, ivf_search_batch

    idx = build_ivf(embeddings, n_clusters=4, vec_col="embedding", id_col="vec_id")
    qdf = spark.createDataFrame(
        [(0, [0.0] * 64)], "qid: long, qvec: array<float>"
    )
    df = ivf_search_batch(idx, qdf, k=5, nprobe=2)
    plan = _plan(df, "simple")
    assert "MapInArrow" in plan
    assert "__cluster" in plan  # pruning filter present
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_sq_coarse_stage_stays_jvm_side(embeddings):
    from qdrant_spark.operators.quantize import build_sq, sq_search

    idx = build_sq(embeddings, vec_col="embedding", id_col="vec_id")
    q = [0.0] * 64
    df = sq_search(idx, q, k=5, metric="cosine", rescore=False)
    plan = _plan(df, "simple")
    # no python evaluation anywhere in the coarse path
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInArrow" not in plan


def test_grouped_search_no_global_single_partition_window(embeddings):
    """group_by windows must partition by the group key (or qid), never an
    empty partition spec over unbounded input."""
    from qdrant_spark.operators.groupby import group_by

    scored = embeddings.select(
        "vec_id", "label", F.rand(7).alias("score")
    )
    df = group_by(scored, "label", groups=3, group_size=2, id_col="vec_id")
    plan = _plan(df, "simple")
    # the per-group ranking window partitions by the group key
    wins = [l for l in plan.splitlines() if "Window" in l]
    assert wins and any("group_value" in w or "label" in w for w in wins)


def test_single_knn_dispatches_to_arrow_above_threshold(embeddings):
    # the analogue of the reference's full_scan_threshold dispatch
    # (read_view dispatch.rs:56-176): big corpus -> block-matmul scorer
    q = [0.0] * 64
    df = knn(embeddings, q, metric="cosine", k=10, vec_col="embedding",
             id_col="vec_id", select=["vec_id", "score"], arrow_dispatch_bytes=0)
    plan = _plan(df, "simple")
    assert "MapInArrow" in plan or "mapInArrow" in plan
    # small corpus (below cutoff) keeps the zero-python column plan
    df2 = knn(embeddings, q, metric="cosine", k=10, vec_col="embedding",
              id_col="vec_id", select=["vec_id", "score"])
    assert "MapInArrow" not in _plan(df2, "simple")


def test_arrow_single_knn_id_score_scans_once(embeddings):
    """The Q=1 Arrow path must NOT re-join winners onto the corpus when
    the caller only wants (id, score) — that join re-scans the entire
    table a second time (r8: single-query exact at 2M rows 4.5s -> 1.2s)."""
    q = [0.0] * 64
    df = knn(embeddings, q, metric="cosine", k=10, vec_col="embedding",
             id_col="vec_id", select=["vec_id", "score"], arrow_dispatch_bytes=0)
    plan = _plan(df, "simple")
    assert "Join" not in plan
    # asking for a payload column legitimately brings the join back
    df2 = knn(embeddings, q, metric="cosine", k=10, vec_col="embedding",
              id_col="vec_id", select=["vec_id", "label", "score"],
              arrow_dispatch_bytes=0)
    assert "BroadcastHashJoin" in _plan(df2, "simple")


def test_grouped_search_group_ranking_is_bounded(embeddings):
    """Group ranking runs over per-group head rows capped by a limit
    (TakeOrderedAndProject), with the winners broadcast-joined back —
    never a dense_rank window over the full capped-hit set (r8 rework:
    the old global window funneled distinct_groups x group_size rows
    through ONE partition)."""
    from qdrant_spark.operators.groupby import group_by

    scored = embeddings.select("vec_id", "label", F.rand(7).alias("score"))
    df = group_by(scored, "label", groups=3, group_size=2, id_col="vec_id")
    plan = _plan(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # map-side top-k pushdown on the per-group row_number windows
    assert "WindowGroupLimit" in plan


def test_knn_score_expr_from_sql_matches_column_builders(embeddings):
    """distance_to_lit (one-round-trip SQL text) must score bit-identical
    to the Column builders it replaces."""
    from qdrant_spark.functions.distances import distance, distance_to_lit

    q = [float(i) / 64 for i in range(64)]
    for metric in ("cosine", "dot", "euclid", "manhattan"):
        a = embeddings.select(
            "vec_id", distance_to_lit(metric, "embedding", q).alias("s"))
        b = embeddings.select(
            "vec_id", distance(metric, F.col("embedding"), F.lit(q)).alias("s"))
        rows_a = {r["vec_id"]: r["s"] for r in a.collect()}
        rows_b = {r["vec_id"]: r["s"] for r in b.collect()}
        assert rows_a == rows_b, metric  # exact equality, not approx


def test_persisted_ivf_probe_is_partition_pruned(embeddings, tmp_path):
    from qdrant_spark.operators.ann import build_ivf, ivf_search, persist_ivf

    idx = persist_ivf(
        build_ivf(embeddings, n_clusters=4, vec_col="embedding", id_col="vec_id"),
        str(tmp_path / "ivf"),
    )
    q = [0.0] * 64
    df = ivf_search(idx, q, k=5, nprobe=1, metric="cosine")
    plan = _plan(df)
    # the cluster probe must reach the scan as a partition filter
    assert "PartitionFilters" in plan and "__cluster" in plan.split("PartitionFilters", 1)[1][:200]


def test_curation_quality_has_no_exchange(documents):
    """gopher_quality is per-row column math: any Exchange in the plan
    means a refactor introduced a shuffle into a map-only operator."""
    from qdrant_spark.operators.curation import gopher_quality

    plan = _plan(gopher_quality(documents), "simple")
    assert "Exchange" not in plan


def test_stratified_fraction_sample_is_map_only(documents):
    from qdrant_spark.operators.curation import stratified_sample

    plan = _plan(
        stratified_sample(documents, "lang", 0.5, id_col="doc_id"), "simple"
    )
    assert "Exchange" not in plan and "Window" not in plan


def test_weighted_sample_is_map_only(documents):
    from qdrant_spark.operators.curation import weighted_sample

    d = documents.withColumn("__p", F.lit(0.5))
    plan = _plan(weighted_sample(d, "__p", id_col="doc_id"), "simple")
    assert "Exchange" not in plan


def test_chunking_is_partition_local(documents):
    from qdrant_spark.operators.curation import chunk_documents

    plan = _plan(chunk_documents(documents, size=32, overlap=8), "simple")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_decontaminate_broadcasts_benchmark_grams(documents):
    """The benchmark gram set must broadcast; the training side must never
    sort-merge-join (that would shuffle corpus-sized gram lists)."""
    from qdrant_spark.operators.curation import decontaminate

    bench = documents.where("doc_id % 17 = 0")
    train = documents.where("doc_id % 17 <> 0")
    plan = _plan(decontaminate(train, bench, n=3), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_projection_is_codegen_no_udf(embeddings):
    """Signed random projection must stay in codegen'd column expressions —
    no python workers (ArrowEvalPython/BatchEvalPython) in the plan."""
    from qdrant_spark.operators.curation import (
        project_embeddings, random_sign_matrix,
    )

    plan = _plan(
        project_embeddings(embeddings, random_sign_matrix(64, 4, seed=1)),
        "simple",
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_ivf_pq_coarse_reads_only_code_columns(embeddings, tmp_path):
    """The persisted IVF-PQ coarse stage must (a) partition-prune on
    __cluster and (b) NOT read the full-precision vector column — the
    whole point of scanning codes."""
    from qdrant_spark.operators.ann import (
        build_ivf_pq, ivf_pq_search, persist_ivf_pq,
    )

    idx = persist_ivf_pq(
        build_ivf_pq(embeddings, n_clusters=4, n_subspaces=8, n_centroids=16,
                     vec_col="embedding", id_col="vec_id", seed=3),
        str(tmp_path / "pq"),
    )
    q = [0.1] * 64
    coarse = ivf_pq_search(idx, q, k=5, nprobe=2, metric="cosine",
                           rescore=False)
    plan = _plan(coarse)
    scans = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scans and any("__cluster" in l for l in scans)
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads and all("embedding" not in l for l in reads)


def test_incremental_ivf_assignment_is_map_only(embeddings):
    """assign_to_ivf is the live-ingest path: nearest-centroid must be a
    codegen'd literal argmin — no shuffle, no python workers."""
    from qdrant_spark.operators.ann import assign_to_ivf, build_ivf

    idx = build_ivf(embeddings.where("vec_id < 100"), n_clusters=4,
                    vec_col="embedding", id_col="vec_id", seed=3)
    newer = embeddings.where("vec_id >= 100")
    merged = assign_to_ivf(idx, newer)
    # plan of just the newly-assigned branch
    new_branch = merged.assigned.where("vec_id >= 100")
    plan = _plan(new_branch, "simple")
    assert "EvalPython" not in plan


def test_repetition_signals_zero_exchange(spark):
    from qdrant_spark.operators.curation import repetition_signals

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(repetition_signals(df), "simple")
    assert "Exchange" not in plan  # pure per-row column expressions


def test_c4_line_filter_zero_exchange(spark):
    from qdrant_spark.operators.curation import c4_line_filter

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(c4_line_filter(df), "simple")
    assert "Exchange" not in plan


def test_paragraph_dedup_no_window_over_para(spark):
    from qdrant_spark.operators.dedup import paragraph_dedup

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(paragraph_dedup(df), "simple")
    # skew-safe shape: NO window over the raw paragraph value (a
    # boilerplate span would pin all its occurrences on one task) — the
    # first occurrence is a map-side-combined min() agg on md5(para),
    # joined back on the uniformly-distributed (id, pos) key
    assert "Window" not in plan
    assert "partial_min" in plan
    assert "md5" in plan


def test_mixture_sample_is_broadcast_plus_filter(spark):
    from qdrant_spark.operators.curation import mixture_sample

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = mixture_sample(df, "lang", {"en": 0.5, "fr": 0.5}, id_col="doc_id")
    plan = _plan(out, "simple")
    # stratum stats and the scalar T reach the corpus via broadcast joins —
    # never a sort-merge join of the corpus
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_score_vocab_broadcasts(spark):
    from qdrant_spark.operators.curation import lm_score

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # eager model (r15 default): the top-V vocab is collected by a
    # bounded eager job and re-enters as a broadcast LocalRelation —
    # the scoring plan scans the corpus ONCE and carries no in-plan
    # token-agg subtree
    plan = _plan(lm_score(df, vocab_size=100), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "LocalTableScan" in plan
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2
    # lazy model keeps the in-plan top-V: a TakeOrdered, not a
    # single-partition global sort window
    lazy = _plan(lm_score(df, vocab_size=100, eager_model=False), "simple")
    assert "BroadcastHashJoin" in lazy
    assert "SortMergeJoin" not in lazy
    assert "TakeOrderedAndProject" in lazy


def test_multilingual_fmm_tokenize_stays_jvm_side(documents):
    """Chinese dictionary segmentation (r7): the multilingual tokenizer
    without a stemmer compiles to pure Column expressions — the FMM is a
    longest-first regex alternation and the OOV bigram fallback a
    transform/sequence HOF, so there must be NO python worker stage."""
    from qdrant_spark.functions.text import tokenize

    df = documents.select(
        tokenize("text", tokenizer="multilingual").alias("toks"))
    plan = _plan(df, "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInArrow" not in plan


def test_batch_knn_window_has_mapside_topk_combine(embeddings, spark):
    """strategy='window' (and anything 'auto' resolves to it) must not
    shuffle the full scored corpus partitioned by qid: the map-side
    _partial_topk combine (a Python ArrowEvalPython/MapInPandas stage)
    runs BEFORE the per-qid window, so the exchange carries only
    <= partitions*Q*k candidate rows (r8 VERDICT item 8)."""
    qdf = spark.createDataFrame([(0, [0.0] * 64)], "qid: long, qvec: array<float>")
    for strat in ("window", "partial", "auto"):
        df = knn_batch(embeddings, qdf, metric="cosine", k=5,
                       vec_col="embedding", id_col="vec_id", strategy=strat)
        plan = _plan(df, "simple")
        if "MapInPandas" not in plan:
            assert strat == "auto"  # resolved to matmul: no window at all
            assert "Window" not in plan
            continue
        # the combine must sit below the window's exchange
        assert plan.index("MapInPandas") > plan.index("Window")


def test_local_df_nan_in_map_falls_back(spark):
    # r15 ADVICE fix: a NaN inside a MapType cell must take the plain
    # createDataFrame path (Arrow would silently convert it to NULL)
    from qdrant_spark.session import local_df

    df = local_df(spark, [({"a": float("nan")},)], "m map<string,double>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan
    v = df.collect()[0]["m"]["a"]
    assert v != v  # NaN preserved, not NULL
