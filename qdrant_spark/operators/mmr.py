"""Maximal Marginal Relevance re-ranking.

Reference: ``MmrInternal`` (lib/shard/src/query/mod.rs:212-222) and the
algorithm (lib/shard/src/query/mmr/mod.rs:42-99,198-260): from a bounded
candidate set (``candidates_limit`` pre-fetched nearest neighbors), greedily
select argmax  lambda * relevance - (1 - lambda) * max_sim_to_selected.

The greedy loop is inherently sequential per query, but candidates are
bounded (~limit * oversampling), so the Spark shape is: candidates flow in
as a DataFrame, ``applyInPandas`` runs one NumPy greedy loop per query
group — each group is small, groups parallelize across executors. This is
exactly the reference's collection-level rescore placement (MMR must see
the globally merged candidates, planned_query.rs:62-101).

Similarities use qdrant's internal larger-is-better convention (Euclid/
Manhattan enter negated), matching how the reference's scorer feeds MMR.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _sim_matrix(V: np.ndarray, metric: str) -> np.ndarray:
    if metric == "dot":
        return V @ V.T
    if metric == "cosine":
        n = np.linalg.norm(V, axis=1)
        n[n == 0] = 1.0
        return (V @ V.T) / np.outer(n, n)
    d = V[:, None, :] - V[None, :, :]
    if metric == "euclid":
        return -np.sqrt((d * d).sum(axis=2))
    if metric == "manhattan":
        return -np.abs(d).sum(axis=2)
    raise ValueError(metric)


def mmr_rerank_pd(
    pdf: pd.DataFrame,
    *,
    lambda_: float,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
) -> pd.DataFrame:
    """Greedy MMR over one candidate group (driver-free, pure pandas/NumPy)."""
    V = np.array(list(pdf[vec_col]), dtype=np.float64)
    rel = pdf["score"].to_numpy(dtype=np.float64)
    if metric in ("euclid", "manhattan"):
        # incoming scores are user-facing distances (smaller=better); flip
        # into the internal larger-is-better convention the sim matrix uses
        # (the reference recomputes relevance in that convention,
        # lib/shard/src/query/mmr/mod.rs relevance_similarities)
        rel = -rel
    ids = pdf[id_col].to_numpy()
    n = len(pdf)
    sim = _sim_matrix(V, metric)
    selected: list[int] = []
    remaining = list(range(n))
    while remaining and len(selected) < k:
        if not selected:
            scores = rel[remaining]
        else:
            max_sim = sim[np.ix_(remaining, selected)].max(axis=1)
            scores = lambda_ * rel[remaining] - (1.0 - lambda_) * max_sim
        # argmax with id-asc tie-break
        best_pos = min(
            range(len(remaining)), key=lambda i: (-scores[i], ids[remaining[i]])
        )
        sel_idx = remaining.pop(best_pos)
        selected.append(sel_idx)
    out = pdf.iloc[selected][[c for c in pdf.columns if c != vec_col]].copy()
    out["rank"] = np.arange(1, len(selected) + 1, dtype=np.int64)
    return out


def mmr(
    candidates: DataFrame,
    *,
    lambda_: float = 0.5,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str | None = None,
) -> DataFrame:
    """MMR re-rank a candidate DataFrame (id, score, vec[, qid]).

    Returns the selected rows (minus the vector) with a 1-based ``rank``
    in selection order."""
    out_fields = [f for f in candidates.schema.fields if f.name != vec_col]
    schema = T.StructType(out_fields + [T.StructField("rank", T.LongType())])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["__g"], errors="ignore")
        return mmr_rerank_pd(
            pdf, lambda_=lambda_, k=k, metric=metric, id_col=id_col, vec_col=vec_col
        )

    if qid_col:
        return candidates.groupBy(qid_col).applyInPandas(run, schema)
    return (
        candidates.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(run, schema)
    )
