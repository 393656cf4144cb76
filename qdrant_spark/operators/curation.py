"""Training-data curation operators: benchmark decontamination, Gopher/C4
quality signals, PII detection/redaction, document chunking, deterministic
stratified sampling, and signed random projection.

These extend the engine beyond the reference's query surface with the
operations a large-scale LLM training-data pipeline needs (BASELINE north
star). Scale notes per operator:

- ``decontaminate``: the benchmark side is tiny relative to the corpus, so
  the gram join is a broadcast hash join — the training side is a map-only
  explode + broadcast-semi probe followed by one aggregation keyed on
  doc_id. No corpus-sized shuffle of text, ever (grams can be hashed to
  64-bit before the join with ``hash_grams=True``).
- ``gopher_quality``: every metric is a per-row column expression
  (split/transform/aggregate/array_sort with comparator) — zero shuffles,
  whole-stage-codegen friendly, embarrassingly parallel at 100 TB.
- ``pii_*``: per-row regexp expressions, zero shuffles.
- ``chunk_documents``: per-row sequence + slice + posexplode; output is
  partition-local (no shuffle), chunk count scales with doc length only.
- ``stratified_sample``: fraction mode is a map-only filter on an
  md5-derived uniform hash — no shuffle, no window, works on a 100 TB scan
  unchanged. Quota mode needs one window per stratum (single shuffle on the
  stratum key); use fraction mode when strata are huge.
- ``project_embeddings``: the sign matrix is tiny and plan-time constant
  (folded into codegen); per-row dot products, no shuffle. For very wide
  in_dim × out_dim use the Arrow matmul in ``operators/knn.py`` instead.
"""

from __future__ import annotations

import hashlib
import math
from typing import Any, Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qdrant_spark.functions.distances import vec_lit

__all__ = [
    "decontaminate",
    "gopher_quality",
    "repetition_signals",
    "lm_score",
    "pii_counts",
    "pii_redact",
    "chunk_documents",
    "stratified_sample",
    "stratified_quota",
    "mixture_sample",
    "corpus_stats",
    "c4_line_filter",
    "random_sign_matrix",
    "project_embeddings",
]


def _word_grams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty if fewer than n words).
    Guarded: Spark's sequence(1, 0) would count DOWN, so short docs get an
    explicit empty array."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _run_stats(items: Column) -> Column:
    """``struct(dup_chars, top_cnt, top_item)`` over an array of strings:
    total characters in items whose value occurs >= 2 times (counting every
    occurrence), plus the most frequent item (ties -> lexicographically
    smallest) and its count.

    One ``array_sort`` + one ``aggregate`` fold: duplicates are adjacent
    after sorting, so a single O(g log g) in-row pass counts runs — no
    per-distinct-item rescan (O(g²)) and no shuffle; the whole thing stays
    a codegen'd column expression. Ascending order + strict ``>`` makes the
    first max-count run win, which IS the smallest-item tiebreak."""
    sorted_i = F.array_sort(items)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("top_cnt"),
        F.lit("").alias("top"),
    )

    def merge(acc: Column, g: Column) -> Column:
        closing = (acc["prev"] != g) & (acc["run"] > 0)
        dup2 = F.when(
            closing & (acc["run"] > 1),
            acc["dup"] + acc["run"] * F.length(acc["prev"]),
        ).otherwise(acc["dup"])
        better = closing & (acc["run"] > acc["top_cnt"])
        return F.struct(
            g.alias("prev"),
            F.when(acc["prev"] != g, F.lit(1).cast("long"))
            .otherwise(acc["run"] + 1).alias("run"),
            dup2.alias("dup"),
            F.when(better, acc["run"]).otherwise(acc["top_cnt"]).alias("top_cnt"),
            F.when(better, acc["prev"]).otherwise(acc["top"]).alias("top"),
        )

    def finish(acc: Column) -> Column:
        dup2 = F.when(
            acc["run"] > 1, acc["dup"] + acc["run"] * F.length(acc["prev"])
        ).otherwise(acc["dup"])
        better = acc["run"] > acc["top_cnt"]
        return F.struct(
            dup2.alias("dup_chars"),
            F.when(better, acc["run"]).otherwise(acc["top_cnt"]).alias("top_cnt"),
            F.when(better, acc["prev"]).otherwise(acc["top"]).alias("top_item"),
        )

    return F.aggregate(sorted_i, zero, merge, finish)


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: Iterable[int] = (2, 3, 4),
    dup_ns: Iterable[int] = (5, 10),
) -> DataFrame:
    """The full Gopher repetition-filter signal set (Rae et al. 2021 §A1.1),
    per document, as pure column expressions — zero shuffles:

    - ``dup_line_char_frac`` — fraction of characters in lines whose exact
      text occurs >= 2 times in the document (every occurrence counted)
    - ``top_{n}gram_char_frac`` (n in ``top_ns``) — characters covered by
      the single most frequent word n-gram: ``cnt * len(gram) / len(text)``
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``) — characters across all
      occurrences of word n-grams that occur >= 2 times, capped at 1.0
      (occurrence-count definition: overlapping occurrences each count
      their characters, unlike the paper's union-of-positions — identical
      formula on the oracle side, documented deviation)

    Fractions are of ``len(text)`` and rounded to 6 decimals; empty or
    sub-n docs yield 0.0. Complexity is O(g log g) per row via
    :func:`_run_stats` — survives any corpus size Spark can scan."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    tlen = F.length(F.col(text_col))

    def frac(chars: Column) -> Column:
        return F.when(tlen > 0, F.round(
            F.least(chars / tlen, F.lit(1.0)), 6)).otherwise(F.lit(0.0))

    cols: list[Column] = [F.col(id_col)]
    line_stats = _run_stats(F.split(F.col(text_col), "\n"))
    cols.append(frac(line_stats["dup_chars"]).alias("dup_line_char_frac"))
    for n in top_ns:
        st = _run_stats(_word_grams(words, n))
        cols.append(
            frac(st["top_cnt"] * F.length(st["top_item"]))
            .alias(f"top_{n}gram_char_frac"))
    for n in dup_ns:
        st = _run_stats(_word_grams(words, n))
        cols.append(frac(st["dup_chars"]).alias(f"dup_{n}gram_char_frac"))
    return docs.select(*cols)


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    lm_docs: DataFrame | None = None,
    vocab_size: int = 2000,
    alpha: float = 1.0,
    eager_model: bool = True,
) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style perplexity proxy
    (Wenzek et al. 2020: documents are ranked by LM score against a clean
    reference corpus; here the LM is a smoothed unigram model).

    Fits add-``alpha`` unigram log-probs over the ``vocab_size`` most
    frequent lowercase whitespace tokens of ``lm_docs`` (default: ``docs``
    itself — self-scoring ranks documents by how typical their vocabulary
    is of the corpus); everything else scores as one shared OOV event.
    Returns ``(id, n_tokens, oov_frac, avg_logprob)`` — higher
    ``avg_logprob`` = more in-distribution; filter/rank on it the way
    CCNet buckets head/middle/tail.

    Scale shape: token counting is one map-side-combined aggregation keyed
    on the token (bounded by vocabulary, not corpus size); the top-V table
    broadcasts; scoring is explode -> broadcast join -> one groupBy(id).
    No shuffle ever carries full text.

    ``eager_model`` (default, r15): the bounded model — the top-V
    (tok, cnt) table and the one-double corpus total — is computed as
    two EAGER jobs and re-enters the plan as a LocalRelation + literals.
    The lazy in-plan alternative (a broadcast 1-row crossJoin per
    reference) re-plans the whole token-agg subtree at every reference
    (exchange reuse verified NOT to fire): the final lm_score plan
    scanned the corpus 4x, lm_buckets 8x. Scoring expressions are
    unchanged (same Spark log/div/add over the same values), so results
    are bit-identical; pass ``eager_model=False`` to keep the fully
    lazy plan."""
    def toks(col: Column) -> Column:
        return F.filter(
            F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != ""
        )

    src = lm_docs if lm_docs is not None else docs
    tok_counts = (
        src.select(F.explode(toks(F.col(text_col))).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    )
    # top-V via orderBy+limit = map-side TakeOrdered, NOT a global window
    # (a windowed row_number over all distinct tokens is a one-partition
    # sort of the whole vocabulary)
    top_v = tok_counts.orderBy(F.col("cnt").desc(), F.col("tok").asc()) \
        .limit(vocab_size)
    if eager_model:
        from qdrant_spark.session import local_df

        spark = docs.sparkSession
        total_val = tok_counts.agg(
            F.coalesce(F.sum("cnt").cast("double"), F.lit(0.0))
        ).collect()[0][0]
        total = F.lit(float(total_val))
        cnts = local_df(spark, [(r["tok"], r["cnt"])
                                for r in top_v.collect()],
                        "tok string, cnt bigint")
    else:
        # corpus token total stays IN-PLAN: a broadcast 1-row crossJoin
        # per reference instead of a driver-side collect
        total = F.col("__total")
        total_df = tok_counts.agg(
            F.coalesce(F.sum("cnt").cast("double"), F.lit(0.0))
            .alias("__total")
        )
        cnts = top_v.crossJoin(F.broadcast(total_df))
    denom = total + F.lit(float(alpha * (vocab_size + 1)))
    vocab = cnts.select(
        "tok",
        F.log((F.col("cnt") + F.lit(float(alpha))) / denom).alias("lp"),
    )

    ex = docs.select(
        F.col(id_col),
        F.explode_outer(toks(F.col(text_col))).alias("tok"),
    )
    scored = ex.join(F.broadcast(vocab), "tok", "left")
    if not eager_model:
        scored = scored.crossJoin(F.broadcast(total_df))
    scored = scored.withColumn(
        "__oov_lp",
        F.when(total > 0,
               F.log(F.lit(float(alpha)) / denom)).otherwise(F.lit(0.0)),
    )
    n_tok = F.count("tok")
    n_oov = F.count(F.when(F.col("tok").isNotNull() & F.col("lp").isNull(),
                           F.lit(1)))
    return scored.groupBy(id_col).agg(
        n_tok.alias("n_tokens"),
        F.round(F.when(n_tok > 0, n_oov / n_tok).otherwise(F.lit(0.0)), 6)
        .alias("oov_frac"),
        F.round(
            F.coalesce(
                F.avg(F.coalesce(
                    F.col("lp"),
                    F.when(F.col("tok").isNotNull(), F.col("__oov_lp")),
                )),
                F.lit(0.0),
            ), 6,
        ).alias("avg_logprob"),
    )


def lm_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    lm_docs: DataFrame | None = None,
    vocab_size: int = 2000,
    alpha: float = 1.0,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    eager_model: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): rank
    documents by LM score and split the corpus at the ``cuts`` percentiles
    — ``head`` = most in-distribution third, ``tail`` = least. Downstream
    mixers weight buckets (head-heavy for quality, tail kept for
    diversity); this is the canonical CCNet shape LLM pipelines reuse.

    Built on :func:`lm_score` (the smoothed-unigram perplexity proxy);
    thresholds are EXACT interpolated percentiles of ``avg_logprob``
    computed in one corpus aggregation (two doubles — with
    ``eager_model``, the r15 default, they collect eagerly and re-enter
    as literals; lazily they stay in-plan via a broadcast 1-row
    crossJoin, which re-plans the whole scored subtree a second time).
    Returns ``(id, n_tokens, oov_frac, avg_logprob, bucket)``.

    Scale shape: lm_score's vocab-bounded aggregations + ONE extra global
    percentile agg (two doubles out) + a map-only bucket assignment. The
    exact percentile sorts score values within the single agg group; at
    corpora where that matters switch the caller to sampled thresholds —
    the assignment logic is unchanged."""
    scored = lm_score(docs, text_col, id_col, lm_docs=lm_docs,
                      vocab_size=vocab_size, alpha=alpha,
                      eager_model=eager_model)
    lo_p, hi_p = float(cuts[0]), float(cuts[1])
    if eager_model:
        row = scored.agg(
            F.round(F.percentile("avg_logprob", F.lit(lo_p)), 6),
            F.round(F.percentile("avg_logprob", F.lit(hi_p)), 6),
        ).collect()[0]
        # None (empty corpus) keeps the lazy path's null-comparison
        # semantics: both WHENs are null -> every row lands in "tail"
        lo = F.lit(row[0]).cast("double")
        hi = F.lit(row[1]).cast("double")
    else:
        cuts_df = scored.agg(
            F.round(F.percentile("avg_logprob", F.lit(lo_p)), 6)
            .alias("__lo"),
            F.round(F.percentile("avg_logprob", F.lit(hi_p)), 6)
            .alias("__hi"),
        )
        scored = scored.crossJoin(F.broadcast(cuts_df))
        lo, hi = F.col("__lo"), F.col("__hi")
    return (
        scored.withColumn(
            "bucket",
            F.when(F.col("avg_logprob") >= hi, F.lit("head"))
            .when(F.col("avg_logprob") >= lo, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("__lo", "__hi")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_tokens_col: str | None = None,
    n_groups: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in a
    deterministic order and cut every ``seq_len`` tokens — the GPT-style
    pretraining packing (each training sequence is a window over the
    concatenated token stream; documents may span sequence boundaries).
    Returns per doc: ``(id, group, n_tokens, tok_start, start_seq,
    end_seq)`` where ``tok_start`` is the token offset of the doc within
    its group's stream and ``start_seq``/``end_seq`` the first/last
    sequence indices it touches — everything a sharded sequence writer
    needs to emit fixed-length samples.

    A single global concatenation order would serialize the cumsum (one
    window over the whole corpus); real pipelines pack per output shard.
    ``n_groups`` deterministic md5 hash-groups (same keying as
    :func:`stratified_sample`) give independent streams that each pack in
    parallel — the window partitions by group, so the sort is per-group.
    Token counts default to whitespace tokens (``n_tokens_col`` supplies
    a caller-tokenized count, e.g. BPE lengths from
    ``functions.text.token_count``)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from pyspark.sql.window import Window

    nt = (F.col(n_tokens_col) if n_tokens_col
          else F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                               lambda t: t != "")))
    grp = F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_groups),
    ).cast("int")
    base = docs.select(
        F.col(id_col),
        grp.alias("group"),
        nt.cast("long").alias("n_tokens"),
    )
    w = (Window.partitionBy("group")
         .orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_start")
    out = base.withColumn("tok_start", start)
    return out.select(
        id_col, "group", "n_tokens", "tok_start",
        F.floor(F.col("tok_start") / seq_len).cast("long").alias("start_seq"),
        F.floor((F.col("tok_start")
                 + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
                / seq_len).cast("long").alias("end_seq"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    eager_model: bool = True,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023): score
    every raw document by the hashed-n-gram importance log-ratio
    ``log p_target(x) - log p_raw(x)`` — the standard recipe for skewing a
    pretraining mixture toward a small high-quality target corpus. Feed
    the (positive-shifted, exponentiated) weight into
    :func:`weighted_sample` to complete the resampling step.

    Features are unigrams + bigrams of lowercase whitespace tokens hashed
    into ``n_buckets`` buckets (md5-derived — reproducible cross-engine);
    both corpus models are add-``alpha`` smoothed bucket distributions.
    Returns ``(id, n_feats, log_ratio)`` where ``log_ratio`` is the SUM
    over the doc's feature occurrences of the per-bucket log-ratio (the
    bag-of-hashed-ngrams likelihood ratio), rounded to 6 places.

    Scale shape: exactly :func:`lm_score` twice — the two bucket-count
    aggregations are bounded by ``n_buckets`` (map-side combined), the
    two bucket tables broadcast, and the raw corpus is touched by ONE
    explode + broadcast-join + groupBy(id). The target corpus is small
    by design (that's the method's premise). ``eager_model`` (default,
    r15): each model's <= ``n_buckets`` (bucket, cnt) rows collect
    eagerly and re-enter as a LocalRelation (totals derive exactly from
    the collected counts); the lazy in-plan alternative re-planned each
    model subtree at every reference (7 scans in the final plan).
    Scoring expressions are unchanged, so results are bit-identical."""
    from qdrant_spark.functions.hashes import token_hash63

    def toks(col: Column) -> Column:
        return F.filter(
            F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != ""
        )

    def feats(df: DataFrame, with_id: bool) -> DataFrame:
        w = toks(F.col(text_col))
        grams = F.concat(w, _word_grams(w, 2))
        lead = [F.col(id_col)] if with_id else []
        ex = df.select(*lead, F.explode_outer(grams).alias("__g"))
        return ex.select(
            *lead,
            F.pmod(token_hash63(F.col("__g")), F.lit(n_buckets))
            .alias("bucket"),
        )

    def model(df: DataFrame, name: str):
        cnts = (feats(df, with_id=False).where(F.col("bucket").isNotNull())
                .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))
        if eager_model:
            # bounded by n_buckets: collect once; the total is EXACTLY
            # the sum of the collected counts (integer math, same value
            # the in-plan sum-cast-double produced)
            from qdrant_spark.session import local_df

            rows = [(r["bucket"], r["cnt"]) for r in cnts.collect()]
            total_val = float(sum(c for _, c in rows))
            cnts = local_df(df.sparkSession, rows,
                            "bucket bigint, cnt bigint")
            total_col = F.lit(total_val)
            total_df = None
        else:
            total_df = cnts.agg(
                F.coalesce(F.sum("cnt").cast("double"), F.lit(0.0))
                .alias(f"__tot_{name}"))
            total_col = F.col(f"__tot_{name}")
            cnts = cnts.crossJoin(F.broadcast(total_df))
        denom = total_col + F.lit(float(alpha * n_buckets))
        lp = cnts.select("bucket",
                         F.log((F.col("cnt") + F.lit(float(alpha))) / denom)
                         .alias(f"lp_{name}"))
        return lp, total_df, denom

    lp_t, tot_t, denom_t = model(target, "t")
    lp_r, tot_r, denom_r = model(docs, "r")
    oov_t = F.log(F.lit(float(alpha)) / denom_t)
    oov_r = F.log(F.lit(float(alpha)) / denom_r)
    scored = (
        feats(docs, with_id=True)
        .join(F.broadcast(lp_t), "bucket", "left")
        .join(F.broadcast(lp_r), "bucket", "left")
    )
    if tot_t is not None:
        scored = scored.crossJoin(F.broadcast(tot_t))
    if tot_r is not None:
        scored = scored.crossJoin(F.broadcast(tot_r))
    scored = scored.withColumn(
        "__d",
        F.when(F.col("bucket").isNull(), F.lit(None)).otherwise(
            F.coalesce(F.col("lp_t"), oov_t)
            - F.coalesce(F.col("lp_r"), oov_r)))
    return scored.groupBy(id_col).agg(
        F.count("__d").alias("n_feats"),
        F.round(F.coalesce(F.sum("__d"), F.lit(0.0)), 6).alias("log_ratio"),
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with a benchmark
    set (the GPT-3/Pile exact-substring decontamination shape).

    Returns one row per training doc: ``(id_col, contaminated_grams,
    contaminated)`` where ``contaminated_grams`` counts DISTINCT shared
    grams. The benchmark grams are distinct-ed and broadcast; the training
    side never shuffles its text.
    """
    def grams_of(df: DataFrame) -> DataFrame:
        words = F.split(F.col(text_col), r"\s+")
        g = F.explode(_word_grams(words, n)).alias("gram")
        out = df.select(F.col(id_col), g)
        if hash_grams:
            out = out.select(id_col, F.xxhash64("gram").alias("gram"))
        return out

    bench_grams = grams_of(benchmark).select("gram").distinct()
    hits = (
        grams_of(train)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("contaminated_grams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("contaminated_grams", F.lit(0)).alias("contaminated_grams"),
            (F.coalesce("contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


_DEFAULT_STOPWORDS = ("the", "a", "an", "of", "and", "in", "to", "is")


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: Iterable[str] = _DEFAULT_STOPWORDS,
    keep: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher/C4-style quality signals, all as per-row column
    expressions (no shuffle):

    - ``n_words``, ``mean_word_len``
    - ``dup_word_frac``  = 1 - distinct/total words
    - ``stopword_count`` = words in a small stopword list (Gopher requires
      >= 2 to keep a doc)
    - ``alpha_word_frac`` = words containing at least one alphabetic char
    - ``dup_line_frac``  = 1 - distinct/total newline-separated lines
    - ``top_2gram_char_frac`` = chars covered by the most frequent word
      2-gram (count * len(gram) / len(text)); ties break to the
      lexicographically smallest gram

    The top-2-gram argmax is one sorted-run fold per row
    (:func:`_run_stats` — O(g log g), no per-distinct-gram rescan).

    ``keep`` carries source columns (e.g. the text itself) through to the
    output, so a filter-then-process pipeline consumes the quality
    signals in the SAME scan instead of joining the kept ids back onto
    the corpus — the join-back plan scans and tokenizes the corpus twice
    (guide §2.4: remove shuffles/passes outright; r14).
    """
    keep = [c for c in (keep or []) if c not in (id_col,)]
    docs = docs.select(
        F.col(id_col),
        F.col(text_col),
        *[F.col(c) for c in keep if c != text_col],
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__words"),
        F.split(F.col(text_col), "\n").alias("__lines"),
    ).withColumn("__grams", _word_grams(F.col("__words"), 2))
    words, lines, grams = F.col("__words"), F.col("__lines"), F.col("__grams")
    top = _run_stats(grams)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_words = F.size(words)
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(
            F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
            / n_words, 6,
        ).alias("mean_word_len"),
        F.round(1.0 - F.size(F.array_distinct(words)) / n_words, 6).alias(
            "dup_word_frac"
        ),
        F.size(F.filter(words, lambda w: F.array_contains(sw, w))).alias(
            "stopword_count"
        ),
        F.round(
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words, 6
        ).alias("alpha_word_frac"),
        F.round(1.0 - F.size(F.array_distinct(lines)) / F.size(lines), 6).alias(
            "dup_line_frac"
        ),
        F.when(F.size(grams) > 0, F.round(
            top["top_cnt"] * F.length(top["top_item"]) / F.length(text_col), 6
        )).otherwise(F.lit(0.0)).alias("top_2gram_char_frac"),
        *[F.col(c) for c in keep],
    )


# RE2-safe patterns (no lookarounds/backrefs) so the same regex runs in
# Spark (Java regex) and any RE2-based oracle engine.
PII_PATTERNS: Mapping[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}",
}


def pii_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: Mapping[str, str] = PII_PATTERNS,
) -> DataFrame:
    """Count PII matches per document and kind: ``(id, n_email, n_ipv4,
    n_phone, n_pii)``. Pure per-row regexp — no shuffle."""
    counts = [
        F.size(F.regexp_extract_all(text_col, F.lit(pat), 0)).alias(f"n_{kind}")
        for kind, pat in patterns.items()
    ]
    out = docs.select(F.col(id_col), *counts)
    total = None
    for kind in patterns:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: Mapping[str, str] = PII_PATTERNS,
    token: str = "[PII:{kind}]",
) -> DataFrame:
    """Replace every PII match with a typed token; other columns pass
    through with the redacted text under the original column name."""
    col: Column = F.col(text_col)
    for kind, pat in patterns.items():
        col = F.regexp_replace(col, pat, token.format(kind=kind))
    return docs.withColumn(text_col, col)


def chunk_documents(
    docs: DataFrame,
    size: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into whitespace-token windows of ``size`` tokens
    stepping by ``size - overlap``: ``(id, chunk_idx, chunk_text,
    n_tokens)``. The number of chunks is ``ceil(max(0, n - overlap) /
    step)`` (min 1 for non-empty docs), so consecutive chunks share exactly
    ``overlap`` tokens and no chunk is fully contained in the previous one.
    Per-row explode — partition-local, no shuffle.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda k: F.slice(words, k * step + 1, size),
    )
    return (
        docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "w"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join("w", " ").alias("chunk_text"),
            F.size("w").cast("long").alias("n_tokens"),
        )
    )


def _hash_bucket(id_col: str, salt: str) -> Column:
    """First 8 hex chars of md5(id || ':' || salt) — uniform in [0, 16^8);
    compared lexicographically it is numeric order (lowercase hex both in
    Spark and DuckDB/standard md5), so fraction thresholds are portable
    string literals."""
    return F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 8
    )


def fraction_threshold(fraction: float) -> str:
    """Hex-string threshold t such that P[hash < t] == fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(min(int(fraction * (1 << 32)), (1 << 32) - 1), "08x")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[Any, float] | float,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its
    md5-hash bucket is under the stratum's threshold. Map-only — no
    shuffle, no window, reproducible across runs and engines. ``fractions``
    is either one float or a dict per stratum value (missing strata use
    ``default_fraction``)."""
    bucket = _hash_bucket(id_col, salt)
    if isinstance(fractions, Mapping):
        thr: Column = F.lit(fraction_threshold(default_fraction))
        expr = None
        for value, frac in fractions.items():
            cond = F.col(strata_col) == F.lit(value)
            t = F.lit(fraction_threshold(frac))
            expr = F.when(cond, t) if expr is None else expr.when(cond, t)
        thr = expr.otherwise(thr) if expr is not None else thr
    else:
        thr = F.lit(fraction_threshold(float(fractions)))
    return df.where(bucket < thr)


def stratified_quota(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
    salt: str = "strata",
) -> DataFrame:
    """Deterministic top-``quota`` rows per stratum, ordered by the md5
    hash bucket (a reproducible shuffle order). One window shuffle on the
    stratum key; prefer :func:`stratified_sample` when strata are huge."""
    from pyspark.sql import Window

    bucket = _hash_bucket(id_col, salt)
    w = Window.partitionBy(strata_col).orderBy(bucket, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    weights: Mapping[str, float],
    *,
    total: int | None = None,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Target-mixture sampling (the Pile/DoReMi domain-balancing shape):
    draw the LARGEST sample whose stratum proportions match ``weights``
    (optionally capped at ``total`` rows in expectation), entirely
    in-plan — no driver-side counting.

    The feasible size is ``T = min_s(n_s / w_s)`` (the binding stratum is
    taken whole); each stratum then keeps ``w_s * T / n_s`` of its rows
    via the deterministic md5 Bernoulli filter (:func:`_hash_bucket`), so
    the output is reproducible and oracle-checkable. Strata missing from
    ``weights`` (or weighted 0) are dropped; strata named in ``weights``
    but absent from the data are ignored in the min (you cannot sample
    what is not there — the realized mixture then over-weights the rest).

    Plan: one small groupBy(stratum) count -> broadcast; one broadcast
    scalar for T; the corpus pass itself is a map-only filter. One
    aggregation shuffle total, bounded by the number of strata."""
    wmap = F.create_map(
        *[F.lit(x) for k, v in weights.items() for x in (k, float(v))]
    )
    w_col = wmap[F.col(stratum_col)]
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
        .where(w_col.isNotNull() & (w_col > 0))
    )
    tmin = counts.select((F.col("__n") / w_col).alias("__cap")).agg(
        F.min("__cap").alias("__T")
    )
    joined = (
        df.join(F.broadcast(counts), stratum_col)
        .crossJoin(F.broadcast(tmin))
    )
    T = F.least(F.col("__T"), F.lit(float(total))) if total is not None \
        else F.col("__T")
    frac = w_col * T / F.col("__n")
    # 8-hex-char threshold from the fraction, computed in-plan (same
    # truncation as fraction_threshold, portable to the SQL oracle)
    th = F.lpad(
        F.lower(F.hex(
            F.least(F.floor(frac * F.lit(4294967296.0)),
                    F.lit(4294967295.0)).cast("bigint")
        )), 8, "0",
    )
    return (
        joined.where(_hash_bucket(id_col, salt) < th)
        .drop("__n", "__T")
    )


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    blocklist: Iterable[str] = ("javascript", "lorem ipsum", "{"),
    min_lines: int = 1,
) -> DataFrame:
    """C4's line-level cleaning (Raffel et al. 2020 §2.2), per document and
    entirely in-row — zero shuffles:

    a line survives iff it has >= ``min_words_per_line`` words, ends in
    terminal punctuation (``. ! ? "``) when ``require_terminal_punct``,
    and contains no blocklisted needle (case-insensitive; C4 drops
    "javascript" / "lorem ipsum" / curly-brace lines). Documents keeping
    fewer than ``min_lines`` lines are flagged ``dropped`` (C4 discards
    pages with < 3 sentences; the caller filters on the flag so the
    decision is auditable).

    Returns ``(id, text_clean, n_lines, n_kept, dropped)``."""
    lines = F.split(F.col(text_col), "\n")

    def keep(line: Column) -> Column:
        ok = F.size(F.filter(
            F.split(F.trim(line), r"\s+"), lambda t: t != ""
        )) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & F.trim(line).rlike('[.!?"]$')
        low = F.lower(line)
        for needle in blocklist:
            ok = ok & ~low.contains(needle.lower())
        return ok

    kept = F.filter(lines, keep)
    return docs.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(kept) < min_lines).alias("dropped"),
    )


def corpus_stats(
    docs: DataFrame,
    stratum_col: str = "lang",
    *,
    num_col: str = "n_chars",
    distinct_col: str | None = "source",
    percentiles: Iterable[float] = (0.5, 0.9),
) -> DataFrame:
    """Per-stratum corpus profile: doc count, sum/mean and EXACT
    interpolated percentiles of ``num_col``, distinct ``distinct_col``
    values — the first look any curation run takes at a new corpus.

    One aggregation shuffle on the stratum key; the exact percentile is
    Spark's built-in ``percentile`` (sort within group — fine for bounded
    strata; switch to ``percentile_approx`` when a single stratum is
    billions of rows and 1% error is acceptable)."""
    # explicit BIGINT for INTEGRAL inputs only: DuckDB types integer sums
    # as HUGEINT, Spark as LONG — pin both sides so value-hash comparison
    # is type-stable. A fractional num_col must keep its double sum (the
    # long cast would silently truncate it).
    from pyspark.sql import types as T

    num_dt = docs.schema[num_col].dataType
    sum_col = F.sum(num_col)
    if isinstance(num_dt, (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType)):
        sum_col = sum_col.cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        sum_col.alias(f"sum_{num_col}"),
        F.round(F.avg(num_col), 6).alias(f"avg_{num_col}"),
    ]
    for p in percentiles:
        aggs.append(
            F.round(F.percentile(num_col, F.lit(float(p))), 6)
            .alias(f"p{int(p * 100)}_{num_col}")
        )
    if distinct_col:
        aggs.append(F.countDistinct(distinct_col).alias(f"n_{distinct_col}"))
    return docs.groupBy(stratum_col).agg(*aggs)


def random_sign_matrix(in_dim: int, out_dim: int, seed: int = 0) -> list[list[int]]:
    """Deterministic ±1 sign matrix (out_dim × in_dim) derived from md5 —
    reproducible everywhere without a PRNG: sign(i, j) = +1 iff the first
    hex digit of md5("{seed}:{i}:{j}") < 8."""
    mat = []
    for i in range(out_dim):
        row = []
        for j in range(in_dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        mat.append(row)
    return mat


def project_embeddings(
    emb: DataFrame,
    signs: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float | None = None,
) -> DataFrame:
    """Signed random projection (Achlioptas): y_i = scale * <x, s_i> with
    s_i in {±1}^d; preserves pairwise distances in expectation
    (Johnson-Lindenstrauss). The sign matrix is a plan-time literal, so
    each output dim is one codegen'd fold over the vector — no UDF, no
    shuffle. Default scale 1/sqrt(out_dim)."""
    out_dim = len(signs)
    if scale is None:
        scale = 1.0 / math.sqrt(out_dim)
    x = F.col(vec_col).cast("array<double>")
    dims = [
        F.round(
            F.aggregate(
                F.zip_with(
                    x,
                    vec_lit(signs[i]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            * F.lit(scale),
            6,
        ).alias(f"p{i}")
        for i in range(out_dim)
    ]
    return emb.select(F.col(id_col), *dims)


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level word n-gram count table ``(gram, cnt)`` — the count
    table behind contamination / repetition analyses. One explode + one
    aggregation on the gram key; Spark's partial (map-side) aggregation
    collapses per-partition duplicates before the shuffle, so the shuffle
    volume is bounded by distinct grams per partition, not corpus tokens."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    out = (
        docs.select(F.explode(_word_grams(words, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )
    if min_count > 1:
        out = out.where(F.col("cnt") >= min_count)
    return out


def weighted_sample(
    df: DataFrame,
    prob_col: str | Column,
    id_col: str = "doc_id",
    salt: str = "weighted",
) -> DataFrame:
    """Deterministic per-row Bernoulli keep with row-specific probability
    (quality-weighted downsampling): keep iff uniform_hash(id) < p. Pure
    map-side filter — no shuffle, reproducible across runs and engines
    (md5-derived uniform, same construction as :func:`stratified_sample`)."""
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    bucket = F.conv(_hash_bucket(id_col, salt), 16, 10).cast("double")
    return df.where(bucket / F.lit(4294967296.0) < p)
