"""Positional text index: build, text/phrase match vs the filter DSL,
BM25 reuse, and edge cases (repeated phrase tokens, short docs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_spark.filters import apply_filter
from qdrant_spark.operators.text_index import (
    build_text_index,
    phrase_match_index,
    text_match_index,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "fast hash join beats slow sort merge join"),
        (2, "hash join"),
        (3, "join hash"),          # both tokens, wrong order
        (4, "fast"),               # shorter than the phrase
        (5, "a b a b a"),          # repeated-token phrases
        (6, ""),                   # empty doc
        (7, "the hash, JOIN!"),    # punctuation/case folding
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


@pytest.fixture(scope="module")
def tiny_index(tiny):
    idx = build_text_index(tiny)
    idx.postings = idx.postings.cache()
    return idx


def ids(df):
    return sorted(r[0] for r in df.collect())


def test_postings_positions(tiny_index):
    row = (
        tiny_index.postings
        .filter((F.col("doc_id") == 5) & (F.col("term") == "a"))
        .collect()[0]
    )
    assert list(row["positions"]) == [0, 2, 4]
    assert row["tf"] == 3 and row["dl"] == 5.0


def test_phrase_match(tiny_index):
    assert ids(phrase_match_index(tiny_index, "hash join")) == [1, 2, 7]
    assert ids(phrase_match_index(tiny_index, "join hash")) == [3]
    assert ids(phrase_match_index(tiny_index, "sort merge join")) == [1]
    # phrase longer than any doc containing the terms
    assert ids(phrase_match_index(tiny_index, "fast hash join beats slow sort merge join extra")) == []


def test_phrase_repeated_tokens(tiny_index):
    assert ids(phrase_match_index(tiny_index, "a b a")) == [5]
    assert ids(phrase_match_index(tiny_index, "b a b")) == [5]
    assert ids(phrase_match_index(tiny_index, "a a")) == []


def test_text_match_modes(tiny_index):
    assert ids(text_match_index(tiny_index, "fast join")) == [1]
    assert ids(text_match_index(tiny_index, "fast join", mode="any")) == [1, 2, 3, 4, 7]
    # empty query = vacuous
    assert ids(text_match_index(tiny_index, "")) == [1, 2, 3, 4, 5, 7]


def test_matches_filter_dsl_on_corpus(documents, tiny):
    """Index results == filter-DSL results (which re-tokenize per query)
    for both match.text and match.phrase on the real corpus."""
    idx = build_text_index(documents)
    for phrase in ("hash join", "sort merge"):
        dsl = apply_filter(
            documents, {"must": [{"key": "text", "match": {"phrase": phrase}}]}
        ).select("doc_id")
        assert ids(phrase_match_index(idx, phrase)) == ids(dsl)
    dsl = apply_filter(
        documents, {"must": [{"key": "text", "match": {"text": "fast hash"}}]}
    ).select("doc_id")
    assert ids(text_match_index(idx, "fast hash")) == ids(dsl)


def test_params_propagate(spark):
    rows = [(1, "Les Requêtes Rapides"), (2, "requete rapide")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    idx = build_text_index(df, ascii_folding=True)
    assert ids(text_match_index(idx, "requetes")) == [1]
    # stemming folds inflections on both sides
    idx2 = build_text_index(
        spark.createDataFrame(
            [(1, "merging queries"), (2, "merged query")],
            "doc_id: long, text: string",
        ),
        stemmer={"type": "snowball", "language": "english"},
    )
    assert ids(text_match_index(idx2, "merge queried")) == [1, 2]


def test_bm25_reuse(tiny_index):
    """The positional postings serve BM25 without a second build and agree
    with the standalone BM25 index."""
    from qdrant_spark.operators.sparse import bm25_search_index, build_bm25_index

    via_text = bm25_search_index(tiny_index.to_bm25(), "hash join", k=5).collect()
    via_bm25 = bm25_search_index(
        build_bm25_index(tiny_index.postings.sparkSession.createDataFrame(
            [(r["doc_id"], r["text"]) for r in _TINY_ROWS], "doc_id: long, text: string"
        )),
        "hash join", k=5,
    ).collect()
    assert [(r[0], round(r[1], 6)) for r in via_text] == [
        (r[0], round(r[1], 6)) for r in via_bm25
    ]


_TINY_ROWS = [
    {"doc_id": 1, "text": "fast hash join beats slow sort merge join"},
    {"doc_id": 2, "text": "hash join"},
    {"doc_id": 3, "text": "join hash"},
    {"doc_id": 4, "text": "fast"},
    {"doc_id": 5, "text": "a b a b a"},
    {"doc_id": 6, "text": ""},
    {"doc_id": 7, "text": "the hash, JOIN!"},
]
