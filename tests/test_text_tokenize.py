"""Property test: the JVM-side tokenizer (Column expressions) must agree
with the driver-side tokenizer for every option combination — filter
compilation tokenizes queries in Python while documents tokenize in Spark,
so any divergence silently breaks full-text match semantics
(TextIndexParams options: index.rs:260-360)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from qdrant_spark.functions.text import tokenize, tokenize_py

STOPWORDS = {"the", "a", "of"}

texts = st.text(
    alphabet=st.sampled_from("ab cd THE a of xyzq .,-é9_"),
    min_size=0,
    max_size=40,
)
options = st.fixed_dictionaries(
    {
        "tokenizer": st.sampled_from(["word", "whitespace", "prefix"]),
        "lowercase": st.booleans(),
        "min_token_len": st.sampled_from([None, 1, 2, 3]),
        "max_token_len": st.sampled_from([None, 3, 5]),
        "stopwords": st.sampled_from([None, STOPWORDS]),
    }
)


@pytest.fixture(scope="module")
def tok_spark(spark):
    def run(batch, **kw):
        df = spark.createDataFrame([(t,) for t in batch], "t: string")
        rows = df.select(tokenize(F.col("t"), **kw).alias("toks")).collect()
        return [list(r["toks"]) for r in rows]

    return run


@given(batch=st.lists(texts, min_size=1, max_size=8), opts=options)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tokenize_spark_matches_python(tok_spark, batch, opts):
    got = tok_spark(batch, **opts)
    exp = [tokenize_py(t, **opts) for t in batch]
    assert got == exp


def test_prefix_tokenizer_shape(tok_spark):
    [toks] = tok_spark(["Hello ok"], tokenizer="prefix", min_token_len=2,
                       max_token_len=4)
    assert toks == ["he", "hel", "hell", "ok"]


def test_stopword_and_length_filters(tok_spark):
    [toks] = tok_spark(["The quick brown fox of doom"], stopwords=STOPWORDS,
                       min_token_len=4)
    assert toks == ["quick", "brown", "doom"]


def test_shingles_short_and_empty_docs(spark):
    # regression: docs with fewer than n tokens/chars made sequence(1, 0)
    # count DOWN and slice(toks, 0, n) abort the whole job
    from qdrant_spark.functions.text import shingles

    df = spark.createDataFrame(
        [(1, "two tokens"), (2, ""), (3, "one"), (4, "a b c d")],
        "doc_id: long, text: string",
    )
    word = {r["doc_id"]: list(r["s"]) for r in
            df.select("doc_id", shingles("text", n=3).alias("s")).collect()}
    assert word[1] == [] and word[2] == [] and word[3] == []
    assert word[4] == ["a b c", "b c d"]
    char = {r["doc_id"]: list(r["s"]) for r in
            df.select("doc_id", shingles("text", n=5, mode="char").alias("s")).collect()}
    assert char[3] == [] and char[2] == []
    assert char[1][:2] == ["two t", "wo to"]


def test_phrase_match_doc_shorter_than_phrase(spark):
    from qdrant_spark.filters import filter_column

    df = spark.createDataFrame(
        [(1, "big data"), (2, ""), (3, "big data systems at scale")],
        "id: long, body: string",
    )
    cond = {"must": [{"key": "body",
                      "match": {"phrase": "big data systems"}}]}
    got = sorted(r["id"] for r in df.filter(filter_column(df, cond)).collect())
    assert got == [3]
