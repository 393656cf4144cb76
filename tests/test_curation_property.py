"""Property tests for the curation operators against pure-Python models:
chunking must losslessly cover the token stream with the declared overlap,
n-gram counting must match a Counter, and the deterministic samplers must
be pure functions of (id, salt)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4),
    min_size=1, max_size=40,
)
doc_sets = st.lists(words, min_size=1, max_size=6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=doc_sets, size=st.integers(2, 8), overlap=st.integers(0, 6))
def test_chunking_covers_tokens_with_overlap(spark, docs, size, overlap):
    from qdrant_spark.operators.curation import chunk_documents

    if overlap >= size:
        overlap = size - 1
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)], "doc_id: long, text: string"
    )
    out = chunk_documents(df, size=size, overlap=overlap).collect()
    step = size - overlap
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, w in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        n_chunks = max(1, math.ceil(max(0, len(w) - overlap) / step))
        assert len(chunks) == n_chunks
        # stitching chunk k's tokens after dropping the overlap prefix
        # reconstructs the original token stream exactly
        stitched = chunks[0].chunk_text.split()
        for c in chunks[1:]:
            toks = c.chunk_text.split()
            assert stitched[-overlap:] == toks[:overlap] or overlap == 0
            stitched.extend(toks[overlap:])
        assert stitched == w
        assert all(c.n_tokens <= size for c in chunks)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=doc_sets, n=st.integers(1, 4))
def test_ngram_counts_match_counter(spark, docs, n):
    from qdrant_spark.operators.curation import ngram_counts

    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)], "doc_id: long, text: string"
    )
    got = {r.gram: r.cnt for r in ngram_counts(df, n=n).collect()}
    want = Counter()
    for w in docs:
        for i in range(len(w) - n + 1):
            want[" ".join(w[i:i + n])] += 1
    assert got == dict(want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30,
                    unique=True),
       frac=st.floats(0.0, 1.0), salt=st.text("xyz", min_size=1, max_size=4))
def test_stratified_fraction_is_pure_function_of_id_salt(spark, ids, frac, salt):
    from qdrant_spark.operators.curation import (
        fraction_threshold, stratified_sample,
    )

    df = spark.createDataFrame([(i, "g") for i in ids], "doc_id: long, g: string")
    out = stratified_sample(df, "g", frac, id_col="doc_id", salt=salt)
    got = {r.doc_id for r in out.collect()}
    thr = fraction_threshold(frac)
    want = {
        i for i in ids
        if hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8] < thr
    }
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=6), min_size=0, max_size=25))
def test_run_stats_matches_counter(spark, items):
    """_run_stats (sorted-run fold) == Counter semantics: dup_chars counts
    every occurrence of any value seen >= 2 times; top is the max-count
    value with smallest-value tiebreak."""
    from pyspark.sql import functions as F

    from qdrant_spark.operators.curation import _run_stats

    df = spark.createDataFrame([(0,)], "id: long").select(
        F.lit(0).alias("id"),
        _run_stats(F.array(*[F.lit(x) for x in items]) if items
                   else F.array().cast("array<string>")).alias("st"),
    )
    r = df.collect()[0]["st"]
    c = Counter(items)
    exp_dup = sum(n * len(v) for v, n in c.items() if n > 1)
    assert r["dup_chars"] == exp_dup
    if items:
        exp_cnt, exp_top = max((n, v) for v, n in c.items())[0], \
            min(v for v, n in c.items() if n == max(c.values()))
        assert r["top_cnt"] == exp_cnt and r["top_item"] == exp_top
    else:
        assert r["top_cnt"] == 0
