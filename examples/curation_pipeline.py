"""End-to-end training-data curation pipeline on the test tables.

The composition a 100 TB corpus job would run, demonstrated at any SF:

1. profile the corpus (per-lang counts/percentiles), ingest documents +
   embeddings into one points table (id-aligned)
2. clean lines (C4 rules) and drop duplicated paragraphs corpus-wide,
   then drop exact and near duplicates (MinHash-LSH, embedding cosine)
3. quality-filter: Gopher/C4 signals + repetition filters + unigram-LM
   score + text heuristics, then redact PII
4. decontaminate against a held-out benchmark set (n-gram overlap)
5. chunk into token windows and mixture-sample to a target lang mix;
   bucket CCNet-style (head/middle/tail), weight DSIR-style toward a
   target subset, and pack training sequences concat-and-chunk
6. build the BM25 postings index and the IVF ANN index (ingest-time cost)
7. hybrid-retrieve per query: dense prefetch + sparse prefetch -> RRF
8. diversify the final set per source with grouped search

Run: PYTHONPATH=/root/repo python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def run(sf_dir: str = "/root/testdata/sf0.001", cpus: int = 8) -> dict:
    from qdrant_spark import get_spark
    from qdrant_spark.functions.text import quality_features, tokenize
    from qdrant_spark.operators.dedup import (
        embedding_near_dups, exact_dedup, minhash_lsh_pairs,
    )
    from qdrant_spark.operators.groupby import group_by
    from qdrant_spark.operators.knn import knn
    from qdrant_spark.operators.sparse import bm25_search_index, build_bm25_index
    from qdrant_spark.operators.fusion import rrf

    spark = get_spark(app_name="curation-pipeline", cpus=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # -- 1. corpus profile (what are we even looking at) ------------------
    from qdrant_spark.operators.curation import corpus_stats

    profile = {r["lang"]: r["n_docs"] for r in corpus_stats(docs).collect()}

    # -- 2a. line-level cleaning + corpus-level paragraph dedup -----------
    from qdrant_spark.operators.curation import c4_line_filter
    from qdrant_spark.operators.dedup import paragraph_dedup

    cleaned = (
        c4_line_filter(docs, min_words_per_line=3,
                       require_terminal_punct=False)
        .where(~F.col("dropped"))
        .select("doc_id", F.col("text_clean").alias("text"))
    )
    # cache: steps 2b-3 each branch off this frame (exact/LSH/gopher/
    # repetition/LM all re-read it) — without a cache every branch
    # recomputes the paragraph-dedup window chain
    docs = (
        paragraph_dedup(cleaned)
        .where(F.length("text_clean") > 0)
        .select("doc_id", F.col("text_clean").alias("text"))
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
    ).cache()

    # -- 2b. dedup: exact, then LSH near-dup, then embedding near-dup -----
    exact = exact_dedup(docs).filter(~F.col("is_duplicate")).select("doc_id")
    lsh_dups = minhash_lsh_pairs(docs, jaccard_threshold=0.5).select(
        F.col("id_b").alias("doc_id")
    )
    emb_dups = embedding_near_dups(
        emb, vec_col="embedding", id_col="vec_id", threshold=0.995,
        block_col="label",
    ).select(F.col("vec_id_b").alias("doc_id"))
    keep = (
        exact.join(lsh_dups, "doc_id", "left_anti")
        .join(emb_dups, "doc_id", "left_anti")
    )

    # -- 3. quality filter (Gopher signals + heuristics), then PII redact -
    from qdrant_spark.operators.curation import (
        chunk_documents, decontaminate, gopher_quality, pii_redact,
        stratified_sample,
    )

    from qdrant_spark.operators.curation import lm_score, repetition_signals

    gq = gopher_quality(docs).where(
        (F.col("dup_word_frac") < 0.95) & (F.col("n_words") >= 5)
        & (F.col("top_2gram_char_frac") < 0.5)
    ).select("doc_id")
    rep = repetition_signals(docs).where(
        (F.col("dup_5gram_char_frac") < 0.6)
        & (F.col("top_3gram_char_frac") < 0.4)
    ).select("doc_id")
    lm = lm_score(docs, vocab_size=2000).where(
        F.col("oov_frac") < 0.5
    ).select("doc_id")
    gq = gq.join(rep, "doc_id").join(lm, "doc_id")
    toks = tokenize(F.col("text"))
    feats = quality_features("text", tokens=toks)
    quality = (
        pii_redact(docs.join(keep, "doc_id", "left_semi")
                   .join(gq, "doc_id", "left_semi"))
        .withColumn("__nt", feats["n_tokens"])
        .withColumn("__sr", feats["stopword_ratio"])
        .filter((F.col("__nt") >= 5) & (F.col("__sr") <= 0.9))
        .select("doc_id", "text", "lang", "source")
    )

    # -- 4. decontaminate vs a benchmark; 5. chunk + stratified sample ----
    bench = docs.where("doc_id % 97 = 0").select("doc_id", "text")
    dec = decontaminate(quality, bench, n=13)
    quality = quality.join(
        dec.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    chunks = chunk_documents(quality, size=256, overlap=32)
    n_chunks = chunks.count()
    from qdrant_spark.operators.curation import mixture_sample

    sampled = mixture_sample(
        quality, "lang",
        {"en": 0.4, "de": 0.15, "fr": 0.15, "es": 0.15, "zh": 0.15},
        id_col="doc_id",
    )
    # cache: 5b runs four separate actions (buckets, DSIR, packing, count)
    # over this frame — uncached, each replays the full filter chain
    quality = sampled.cache()

    # -- 5b. CCNet buckets + DSIR re-weighting + sequence packing --------
    # (the round-5 additions: bucket the mixture CCNet-style, weight it
    # toward the English subset DSIR-style, and lay out training
    # sequences concat-and-chunk)
    from qdrant_spark.operators.curation import (
        dsir_weights, lm_buckets, pack_sequences,
    )

    buckets = {r["bucket"]: r["cnt"] for r in
               lm_buckets(quality, vocab_size=1000)
               .groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    dsir_top = (dsir_weights(quality,
                             quality.filter(F.col("lang") == "en"),
                             n_buckets=2000)
                .orderBy(F.col("log_ratio").desc()).limit(1).collect())
    packed_seqs = pack_sequences(quality, 512, n_groups=4)
    n_train_seqs = int(packed_seqs.agg(
        F.sum(F.col("end_seq") - F.col("start_seq") + 1)).collect()[0][0])
    pts = quality.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding", "label"),
        "doc_id",
    ).cache()
    n_clean = pts.count()

    # -- 4. indexes (ingest-time) ----------------------------------------
    bm25 = build_bm25_index(pts, text_col="text", id_col="doc_id")
    bm25.postings = bm25.postings.cache()
    bm25.postings.count()

    # -- 5. hybrid retrieval ---------------------------------------------
    qvec = list(emb.limit(1).collect()[0]["embedding"])
    dense = knn(pts, qvec, metric="cosine", k=50, vec_col="embedding",
                id_col="doc_id", select=["doc_id", "score"])
    sparse = bm25_search_index(bm25, "data quality model training", k=50)
    fused = rrf([dense, sparse], id_col="doc_id", limit=30)

    # -- 6. per-source diversity -----------------------------------------
    enriched = fused.join(pts.select("doc_id", "source"), "doc_id")
    final = group_by(enriched, "source", groups=3, group_size=5,
                     id_col="doc_id")
    result = final.collect()
    out = {
        "profile": profile,
        "n_chunks": n_chunks,
        "clean_docs": n_clean,
        "lm_buckets": buckets,
        "dsir_top_doc": dsir_top[0]["doc_id"] if dsir_top else None,
        "n_train_seqs": n_train_seqs,
        "final_rows": len(result),
        "sources": sorted({r["group_value"] for r in result}),
    }
    spark.stop()
    return out


if __name__ == "__main__":
    print(run(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
