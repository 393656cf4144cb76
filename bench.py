"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Headline set mirrors the reference's own bench configs (BASELINE.md):
batch KNN (batch_search_bench.rs), filtered search (conditional_search.rs),
facets (facets.rs), fusion/universal-query (batch_query_bench.rs), plus the
scale-path operators (grouped search, text pipeline).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from qdrant_spark.session import get_spark
    from qdrant_spark.filters import apply_filter
    from qdrant_spark.functions.text import quality_features, tokenize
    from qdrant_spark.operators.fusion import rrf
    from qdrant_spark.operators.groupby import group_by
    from qdrant_spark.operators.knn import knn, knn_batch
    from qdrant_spark.operators.points import facet

    spark = get_spark(app_name="qdrant-spark-bench", cpus=cpus)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_emb = emb.count()  # materialize cache before timing

    # Corpus amplification: replicate the embeddings with DETERMINISTIC ids
    # (orig_id * factor + replica). monotonically_increasing_id would
    # assign different ids if the cached frame is ever evicted and
    # recomputed mid-run — the persisted ANN indexes then hold stale ids
    # and the recall lines compare mismatched id spaces.
    def amplify(df, target_rows, n_src):
        factor = max(1, -(-target_rows // n_src))
        reps = spark.range(factor).withColumnRenamed("id", "__rep")
        # jitter each replica (deterministic per-element hash, +-20%):
        # exact duplicates would make every score a 256-way tie — "recall"
        # then measures tie-order luck, and sub-quantization-noise
        # perturbations make ANN recall measure luck among indistinguishable
        # points. The jitter turns the amplified corpus into a realistic
        # near-dup spread (cosine to the source ~0.98-0.99) that a residual
        # PQ codebook can genuinely rank.
        amped = (df.crossJoin(F.broadcast(reps))
                   .withColumn("vec_id",
                               F.col("vec_id") * factor + F.col("__rep"))
                   .drop("__rep"))
        jit = F.transform(
            F.col("embedding"),
            lambda x, i: (x * (
                1.0
                + (F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000))
                   .cast("double") / 1000.0 - 0.5) * 0.4
            )).cast("float"),
        )
        return amped.withColumn("embedding", jit)

    # XL corpus: ~64k rows so the vector path is measured at a size where
    # per-row cost dominates (the raw table is small at every sf).
    # 16 partitions, not 32: python scoring stages run a JVM task thread plus
    # a python worker per partition, so partition count == cores means 2x
    # oversubscription and erratic scheduling. At cluster scale the same
    # sizing falls out of spark.sql.files.maxPartitionBytes.
    xl = amplify(emb, 64_000, n_emb).repartition(16).cache()
    n_xl = xl.count()

    qvecs = [list(r["embedding"]) for r in emb.limit(64).collect()]
    q0 = qvecs[0]
    queries_df = spark.createDataFrame(
        [(i, qvecs[i]) for i in range(64)], "qid: long, qvec: array<float>"
    )

    def q_knn_single():
        return knn(emb, q0, metric="cosine", k=10, vec_col="embedding",
                   id_col="vec_id", select=["vec_id", "score"]).collect()

    def q_knn_batch64():
        return knn_batch(emb, queries_df, metric="cosine", k=10,
                         vec_col="embedding", id_col="vec_id",
                         strategy="matmul").count()

    def q_knn_filtered():
        flt = {"must": [{"key": "label", "match": {"any": [1, 2, 3]}}]}
        return knn(emb, q0, metric="euclid", k=10, vec_col="embedding",
                   id_col="vec_id", flt=flt, select=["vec_id", "score"]).collect()

    def q_fusion_hybrid():
        kw = dict(k=100, vec_col="embedding", id_col="vec_id",
                  select=["vec_id", "score"])
        cos = knn(emb, q0, metric="cosine", **kw)
        dot = knn(emb, q0, metric="dot", **kw)
        return rrf([cos, dot], id_col="vec_id", limit=10).collect()

    def q_grouped():
        scored = emb.withColumn(
            "score",
            F.aggregate(F.zip_with(F.col("embedding").cast("array<double>"),
                                   F.lit(q0).cast("array<double>"),
                                   lambda x, y: x * y),
                        F.lit(0.0), lambda a, x: a + x),
        ).select("vec_id", "label", "score")
        return group_by(scored, "label", groups=10, group_size=5,
                        id_col="vec_id").count()

    def q_knn_batch64_xl():
        return knn_batch(xl, queries_df, metric="cosine", k=10,
                         vec_col="embedding", id_col="vec_id",
                         strategy="matmul").count()

    def q_knn_single_xl():
        # below ARROW_DISPATCH_BYTES: plan-stats dispatch keeps Column math
        return knn(xl, q0, metric="cosine", k=10, vec_col="embedding",
                   id_col="vec_id", select=["vec_id", "score"]).collect()

    # XXL corpus (512k rows): past the dispatch crossover, so the same
    # call auto-routes through the Q=1 Arrow block-matmul scorer
    xxl = amplify(emb, 512_000, n_emb).repartition(16).cache()
    n_xxl = xxl.count()

    def q_knn_single_xxl():
        return knn(xxl, q0, metric="cosine", k=10, vec_col="embedding",
                   id_col="vec_id", select=["vec_id", "score"]).collect()

    def q_knn_single_xxl_disk():
        # exact single-query scan FROM PARQUET — the disk-bound baseline
        # for ann_ivf_single_xxl, which reads the same corpus cluster-
        # partitioned and prunes 28/32 of the files. The pair is the
        # disk-vs-disk proof that IVF partition pruning pays: measured
        # ~3-4x at 512k and 2M rows with recall@10 = 1.0.
        return knn(xxl_disk, q0, metric="cosine", k=10, vec_col="embedding",
                   id_col="vec_id", select=["vec_id", "score"]).collect()

    # ANN / quantized scale paths: index built once (ingest-time), searches
    # amortize it — mirrors the reference's HNSW-build-then-search split.
    # IVF assignments are PERSISTED partitioned by __cluster (persist_ivf)
    # so cluster probing is directory partition pruning, not scan+discard.
    import tempfile

    from qdrant_spark.operators.ann import (
        build_ivf, ivf_search, ivf_search_batch, persist_ivf,
    )
    from qdrant_spark.operators.quantize import (
        build_sq, build_tq, sq_search, tq_search,
    )

    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    xxl.write.mode("overwrite").parquet(f"{ivf_dir}/xxl_plain")
    xxl_disk = spark.read.parquet(f"{ivf_dir}/xxl_plain")
    ivf_xl = persist_ivf(
        build_ivf(xl, n_clusters=32, vec_col="embedding", id_col="vec_id",
                  fit_fraction=0.25),
        f"{ivf_dir}/xl",
    )
    ivf_xxl = persist_ivf(
        build_ivf(xxl, n_clusters=32, vec_col="embedding", id_col="vec_id",
                  fit_fraction=0.1),
        f"{ivf_dir}/xxl",
    )
    from qdrant_spark.operators.ann import build_ivf_pq, ivf_pq_search, persist_ivf_pq

    # IVF-PQ on the xxl corpus, persisted partitioned by cluster: the
    # coarse probe reads ~nprobe/32 of the files AND only the 8-byte code
    # column — both prunings compound on disk (compare knn_single_xxl /
    # ann_ivf_single_xxl, which read the full-width vectors).
    ivfpq_xxl = persist_ivf_pq(
        build_ivf_pq(xxl, n_clusters=32, n_subspaces=8, n_centroids=256,
                     vec_col="embedding", id_col="vec_id", fit_fraction=0.1),
        f"{ivf_dir}/xxl_pq",
    )
    # RAM-resident index (the reference's deployment: quantized index hot in
    # memory): auto mode dispatches this to the FUSED single-stage plan;
    # the disk line below pins mode="coarse" — the narrow-scan 100-TB plan
    from qdrant_spark.operators.ann import IvfPqIndex

    pq_ram_xxl = ivfpq_xxl.assigned.cache()
    pq_ram_xxl.count()
    ivfpq_xxl_ram = IvfPqIndex(
        assigned=pq_ram_xxl, centroids=ivfpq_xxl.centroids,
        codebooks=ivfpq_xxl.codebooks, vec_col="embedding", id_col="vec_id",
    )

    sq_xl = build_sq(xl, vec_col="embedding", id_col="vec_id")
    sq_xl.codes = sq_xl.codes.cache()
    sq_xl.codes.count()
    tq_xl = build_tq(xl, vec_col="embedding", id_col="vec_id", bits=2)
    tq_xl.codes = tq_xl.codes.cache()
    tq_xl.codes.count()

    def q_ann_ivf_batch64_xl():
        return ivf_search_batch(ivf_xl, queries_df, k=10, nprobe=4,
                                metric="cosine").count()

    def q_ann_ivf_single_xxl():
        # single probe reads nprobe/32 of the partitioned corpus — compare
        # against knn_single_xxl (full exact scan) for the pruning win
        return ivf_search(ivf_xxl, q0, k=10, nprobe=4,
                          metric="cosine").collect()

    def q_knn_batch64_xxl():
        # 64q x 512k x 384d exact over the RAM-cached corpus
        return knn_batch(xxl, queries_df, metric="cosine", k=10,
                         vec_col="embedding", id_col="vec_id",
                         strategy="matmul").count()

    def q_knn_batch64_xxl_disk():
        # same exact scan but from parquet — the 100TB shape (nothing is
        # cached at scale). Compare against ann_ivf_batch64_xxl, which also
        # reads parquet but prunes 28/32 cluster partitions per query.
        return knn_batch(xxl_disk, queries_df, metric="cosine", k=10,
                         vec_col="embedding", id_col="vec_id",
                         strategy="matmul").count()

    def q_ann_ivf_batch64_xxl():
        # NOTE: with 64 queries x 4 probes over 32 clusters the probe UNION
        # covers every cluster, so no partition is pruned at this scale —
        # the win is compute (each point scored against ~Q*nprobe/K queries,
        # not Q), which is below overhead here. Measured alternatives that
        # do NOT produce a batch-IVF win at local[32]: 256 clusters (54/256
        # probed but per-cluster-block python overhead eats the IO saved),
        # 2M rows (exact batch matmul stays ~1.2s — BLAS-bound, not IO-
        # bound), related-query batches (the synthetic corpus spreads top-k
        # neighbors over 100+ clusters). The disk-pruning proof is the
        # single-query pair knn_single_xxl_disk vs ann_ivf_single_xxl
        # (~3-4x); at cluster scale (4k+ clusters, Q << clusters/nprobe)
        # the batch plan prunes IO the same way.
        return ivf_search_batch(ivf_xxl, queries_df, k=10, nprobe=4,
                                metric="cosine").count()

    def q_ivf_pq_batch64_xxl():
        # RAM-resident index, auto -> fused: ONE python stage that
        # ADC-shortlists (LUT gathers, no matmul) and exact-rescores only
        # the shortlist in-worker — compare knn_batch64_xxl (full matmul
        # over the same cached corpus, same stage count, ~30x the compute)
        from qdrant_spark.operators.ann import ivf_pq_search_batch

        return ivf_pq_search_batch(ivfpq_xxl_ram, queries_df, k=10, nprobe=4,
                                   oversampling=4.0, metric="cosine").count()

    def q_ivf_pq_batch64_xxl_disk():
        # mode="coarse" pinned: the 100-TB narrow-scan plan over the
        # cluster-partitioned parquet — the ADC pass reads 8 bytes/row of
        # codes vs 256 of floats; compare knn_batch64_xxl_disk
        from qdrant_spark.operators.ann import ivf_pq_search_batch

        return ivf_pq_search_batch(ivfpq_xxl, queries_df, k=10, nprobe=4,
                                   oversampling=4.0, metric="cosine",
                                   mode="coarse").count()

    def q_ivf_pq_single_xxl():
        return ivf_pq_search(ivfpq_xxl, q0, k=10, nprobe=4, oversampling=4.0,
                             metric="cosine").collect()

    def q_sq_rescore_xl():
        return sq_search(sq_xl, q0, k=10, oversampling=3.0,
                         metric="cosine").count()

    def q_tq_rescore_xl():
        # TurboQuant 2-bit coarse (12 bytes/vec scanned vs 1536) + rescore
        return tq_search(tq_xl, q0, k=10, oversampling=3.0,
                         metric="cosine").count()

    # BM25 index built once (ingest-time cost, as in the reference's sparse
    # indexer); the timed query measures search over the postings table
    from qdrant_spark.operators.sparse import bm25_search_index, build_bm25_index

    bm25_idx = build_bm25_index(docs)
    bm25_idx.postings = bm25_idx.postings.cache()
    bm25_idx.postings.count()

    def q_bm25():
        return bm25_search_index(bm25_idx, "fast hash join sort", k=10).collect()

    def q_filter_scan():
        flt = {
            "must": [
                {"key": "l_returnflag", "match": {"value": "R"}},
                {"key": "l_quantity", "range": {"gt": 25.0}},
            ]
        }
        return apply_filter(lineitem, flt).count()

    def q_facet():
        return facet(docs, "source", limit=20).collect()

    def q_text_pipeline():
        pre = docs.withColumn("__toks", tokenize("text"))
        feats = quality_features("text", tokens=F.col("__toks"))
        return (
            pre.select("lang", feats["n_tokens"].alias("nt"),
                       feats["stopword_ratio"].alias("sr"))
            .groupBy("lang").agg(F.avg("nt"), F.avg("sr")).collect()
        )

    def q_dedup_lsh():
        from qdrant_spark.operators.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(docs, n_perms=16, bands=4,
                                 jaccard_threshold=0.3).count()

    def q_curation_pipeline():
        # quality-filter -> chunk: all per-row JVM column expressions
        from qdrant_spark.operators.curation import (
            chunk_documents, gopher_quality,
        )

        q = gopher_quality(docs)
        keep = q.where((F.col("dup_word_frac") < 0.95)
                       & (F.col("n_words") >= 10)).select("doc_id")
        return chunk_documents(docs.join(keep, "doc_id"),
                               size=64, overlap=8).count()

    bench = {
        "knn_single": q_knn_single,
        "knn_batch64": q_knn_batch64,
        "knn_batch64_xl": q_knn_batch64_xl,
        "knn_single_xl": q_knn_single_xl,
        "knn_single_xxl": q_knn_single_xxl,
        "knn_single_xxl_disk": q_knn_single_xxl_disk,
        "ann_ivf_batch64_xl": q_ann_ivf_batch64_xl,
        "ann_ivf_single_xxl": q_ann_ivf_single_xxl,
        "knn_batch64_xxl": q_knn_batch64_xxl,
        "knn_batch64_xxl_disk": q_knn_batch64_xxl_disk,
        "ann_ivf_batch64_xxl": q_ann_ivf_batch64_xxl,
        "ivf_pq_single_xxl": q_ivf_pq_single_xxl,
        "ivf_pq_batch64_xxl": q_ivf_pq_batch64_xxl,
        "ivf_pq_batch64_xxl_disk": q_ivf_pq_batch64_xxl_disk,
        "sq_rescore_xl": q_sq_rescore_xl,
        "tq_rescore_xl": q_tq_rescore_xl,
        "knn_filtered": q_knn_filtered,
        "fusion_hybrid": q_fusion_hybrid,
        "grouped_search": q_grouped,
        "bm25": q_bm25,
        "filter_scan": q_filter_scan,
        "facet": q_facet,
        "text_pipeline": q_text_pipeline,
        "dedup_lsh": q_dedup_lsh,
        "curation_pipeline": q_curation_pipeline,
    }

    # Steady-state timing (criterion-style): one warm-up run, then min of
    # four timed runs. The python-heavy paths need ~3 iterations before the
    # JVM's C2 JIT compiles the columnar→Arrow conversion and the worker
    # pool is fully forked — one-off costs a long-running cluster never
    # sees again, so the min is the honest per-query steady state.
    times: dict[str, float] = {}
    for name, fn in bench.items():
        fn()  # warm-up: plan + cache + python worker pool
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)

    # recall@10 vs the exact scan for the approximate lines (untimed) —
    # BASELINE.md requires ANN numbers to carry their recall
    exact10 = {
        r["vec_id"]
        for r in knn(xxl, q0, metric="cosine", k=10, vec_col="embedding",
                     id_col="vec_id", select=["vec_id", "score"]).collect()
    }

    def _recall(df):
        # NOTE: the PQ recall lines fluctuate +-0.1 run-to-run: MLlib
        # KMeans centroids drift with distributed fp-summation order even
        # under a fixed seed (codebook training itself is id-sorted and
        # deterministic). Correctness is gated by the exact-match oracles,
        # not these lines.
        got = {r["vec_id"] for r in df.collect()}
        return round(len(exact10 & got) / len(exact10), 3)

    recall = {
        "ann_ivf_single_xxl": _recall(
            ivf_search(ivf_xxl, q0, k=10, nprobe=4, metric="cosine")),
        "ivf_pq_single_xxl": _recall(
            ivf_pq_search(ivfpq_xxl, q0, k=10, nprobe=4, oversampling=4.0,
                          metric="cosine")),
        # the amplified corpus is adversarial for ADC: every query sits in
        # a ball of ~256 jittered siblings, so ranking inside the ball
        # needs a shortlist wider than the ball is deep. oversampling is
        # exactly that knob — report it alongside the timed setting.
        "ivf_pq_single_xxl_os16": _recall(
            ivf_pq_search(ivfpq_xxl, q0, k=10, nprobe=4, oversampling=16.0,
                          metric="cosine")),
    }

    import shutil

    shutil.rmtree(ivf_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "recall_at_10": recall,
        "sf": sf,
        "n_embeddings": n_emb,
        "n_embeddings_xl": n_xl,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
