"""Materialized full-text index with token positions.

Reference semantics: the full-text inverted index stores, per (token,
document), the token's positions when phrase matching is enabled
(lib/segment/src/index/field_index/full_text_index/inverted_index/mod.rs:
479-494 — ``positions`` per posting), so ``match.phrase`` evaluates
against postings instead of re-tokenizing documents per query
(phrase search: full_text_index/inverted_index/positions.rs shape).

Spark mapping: the index IS a DataFrame ``(id, term, positions, tf, dl)``
built with ONE tokenization pass and ONE shuffle (posexplode → groupBy).
Phrase matching is then the classic positional-postings join:

    query token i at offset i  ⋈  postings on term
    → candidate (id, start = pos - i)
    → a phrase hit is a (id, start) with ALL m offsets present.

Only posting lists of the query's own terms are touched (broadcast join
prunes the rest), and only candidate documents shuffle — never the corpus
text. At 100 TB persist the postings bucketed by ``term`` so each query
term reads one bucket; tf/dl ride along so the same table serves BM25
(operators/sparse.Bm25Index) without a second index build.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qdrant_spark.filters import apply_filter
from qdrant_spark.functions.text import tokenize, tokenize_py
from qdrant_spark.session import local_df


@dataclass
class TextIndex:
    """Positional postings ``(id, term, positions array<int>, tf, dl)``.

    ``params`` are the tokenizer options the index was built with
    (TextIndexParams, lib/segment/src/data_types/index.rs:260-360);
    queries against the index tokenize with the SAME options so document
    and query token streams agree."""

    postings: DataFrame
    n_docs: int
    id_col: str
    params: dict[str, Any] = field(default_factory=dict)

    def to_bm25(self):
        """The same postings serve BM25 scoring — no second build."""
        from qdrant_spark.operators.sparse import Bm25Index

        return Bm25Index(
            postings=self.postings.select(self.id_col, "term", "dl", "tf"),
            n_docs=self.n_docs,
            id_col=self.id_col,
        )


def build_text_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    flt: dict[str, Any] | None = None,
    **params: Any,
) -> TextIndex:
    """One tokenization pass, one shuffle: posexplode carries the token
    position through the groupBy so each posting row ends with the sorted
    position list (inverted_index/mod.rs:479-494), its tf, and the doc
    length dl (for BM25 reuse)."""
    df = apply_filter(docs, flt)
    toks = tokenize(F.col(text_col), **params)
    postings = (
        df.select(
            F.col(id_col),
            F.size(toks).alias("dl"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .groupBy(id_col, "term", "dl")
        .agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        .select(id_col, "term", "positions", "tf", F.col("dl").cast("double"))
    )
    return TextIndex(postings=postings, n_docs=df.count(), id_col=id_col,
                     params=dict(params))


def text_match_index(index: TextIndex, text: str, *, mode: str = "all") -> DataFrame:
    """Documents matching ``match.text`` (mode='all', reference default) or
    ``match.text_any`` (mode='any') via the postings — only the query
    terms' posting lists are read."""
    q_tokens = sorted(set(tokenize_py(text, **index.params)))
    spark = index.postings.sparkSession
    if not q_tokens:  # vacuous match, reference treats empty token set as all
        return index.postings.select(index.id_col).distinct()
    q = local_df(spark, [(t,) for t in q_tokens], "term: string")
    hits = (
        index.postings.join(F.broadcast(q), "term")
        .groupBy(index.id_col)
        .agg(F.countDistinct("term").alias("__nm"))
    )
    if mode == "all":
        hits = hits.filter(F.col("__nm") == len(q_tokens))
    return hits.select(index.id_col)


def phrase_match_index(index: TextIndex, phrase: str) -> DataFrame:
    """Documents containing the query tokens at consecutive positions
    (match.phrase): join each query token at offset i against the postings,
    normalize every occurrence to its implied phrase start (pos - i), and
    keep (id, start) pairs where all m offsets landed. Duplicate query
    tokens are handled by counting distinct offsets, not terms."""
    q_tokens = tokenize_py(phrase, **index.params)
    if not q_tokens:
        return index.postings.select(index.id_col).distinct()
    m = len(q_tokens)
    spark = index.postings.sparkSession
    q = local_df(
        spark, [(t, i) for i, t in enumerate(q_tokens)],
        "term: string, off: int"
    )
    starts = (
        index.postings.join(F.broadcast(q), "term")
        .select(index.id_col, "off", F.explode("positions").alias("pos"))
        .select(index.id_col, "off", (F.col("pos") - F.col("off")).alias("start"))
        .filter(F.col("start") >= 0)
    )
    hits = (
        starts.groupBy(index.id_col, "start")
        .agg(F.countDistinct("off").alias("__nm"))
        .filter(F.col("__nm") == m)
    )
    return hits.select(index.id_col).distinct()
