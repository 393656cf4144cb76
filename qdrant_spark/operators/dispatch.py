"""Selectivity-aware filtered-search dispatch.

The reference picks a physical strategy per query: estimate the filter's
cardinality from the payload indexes (lib/segment/src/index/
query_estimator.rs:133-243), and route — small cardinality → plain
filtered scan (scoring only matching rows beats walking the vector index
past non-matching entries), large cardinality → vector index with the
filter applied during traversal, ambiguous → a sampled cardinality check
with an Agresti-Coull confidence interval
(lib/segment/src/index/sample_estimation.rs) before deciding
(lib/segment/src/index/hnsw_index/hnsw/read_view/dispatch.rs:56-176).

Spark-first mapping: the "payload index" is the stats table
:func:`qdrant_spark.catalog.field_index_stats` materializes (count /
nulls / n_distinct / min-max per indexed field — the columnar analogue of
postings sizes); the "plain scan" is the exact filtered
:func:`~qdrant_spark.operators.knn.knn` whose predicate pushes down to
the parquet scan; the "vector index" is the IVF probe
(:func:`~qdrant_spark.operators.ann.ivf_search`), where a filter applied
after cluster pruning can collapse recall when selective — exactly the
failure mode this dispatcher exists to avoid. When the IVF path runs
under a filter, ``nprobe`` is scaled by the estimated selectivity so the
probed clusters still hold ~nprobe clusters' worth of MATCHING rows.

Estimation bounds are deliberately columnar: without per-value postings,
a match condition on a field with ``n`` non-null rows and ``D`` distinct
values is bounded by ``[0, n - D + 1]`` with expectation ``n / D`` —
loose enough that the sampled check does the real work in the mid-band,
which is one seeded job over <= ``max_sample`` rows.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass
from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qdrant_spark.filters import filter_column


@dataclass(frozen=True)
class CardinalityEstimation:
    """min / expected / max number of matching points
    (lib/segment/src/index/field_index/mod.rs CardinalityEstimation)."""

    min: int
    exp: int
    max: int

    @classmethod
    def exact(cls, n: int) -> "CardinalityEstimation":
        return cls(n, n, n)

    @classmethod
    def unknown(cls, total: int) -> "CardinalityEstimation":
        return cls(0, total // 2, total)


@dataclass(frozen=True)
class FieldCardStats:
    """Per-field stats consumed by the estimator — one row of
    :func:`qdrant_spark.catalog.field_index_stats`."""

    n: int            # non-null count
    nulls: int
    n_distinct: int
    min_num: float | None = None
    max_num: float | None = None


def stats_from_index(stats_df: DataFrame) -> dict[str, FieldCardStats]:
    """Collect a ``field_index_stats`` result into the estimator's shape
    (tiny: one row per indexed field)."""
    out: dict[str, FieldCardStats] = {}
    for r in stats_df.collect():
        out[r["field"]] = FieldCardStats(
            n=int(r["n"]), nulls=int(r["nulls"]),
            n_distinct=int(r["n_distinct"]),
            min_num=None if r["min_num"] is None else float(r["min_num"]),
            max_num=None if r["max_num"] is None else float(r["max_num"]),
        )
    return out


# ---------------------------------------------------------------------------
# combination rules (query_estimator.rs:110-243 semantics)
# ---------------------------------------------------------------------------


def combine_must(ests: Sequence[CardinalityEstimation],
                 total: int) -> CardinalityEstimation:
    """AND: inclusion-exclusion lower bound, min of maxima, independence
    product for the expectation."""
    if not ests:
        return CardinalityEstimation.exact(total)
    mn = total
    for e in ests:
        mn = max(0, mn + e.min - total)
    mx = min(e.max for e in ests)
    p = 1.0
    for e in ests:
        p *= e.exp / total if total else 0.0
    return CardinalityEstimation(mn, round(p * total), mx)


def combine_should(ests: Sequence[CardinalityEstimation],
                   total: int) -> CardinalityEstimation:
    """OR: complement rule ``(1 - prod(1 - p_i)) * total`` for the
    expectation; max of minima / capped sum of maxima for the bounds."""
    if not ests:
        return CardinalityEstimation.exact(0)
    if total == 0:
        return CardinalityEstimation.exact(0)
    miss = 1.0
    for e in ests:
        miss *= 1.0 - e.exp / total
    return CardinalityEstimation(
        max(e.min for e in ests),
        round((1.0 - miss) * total),
        min(sum(e.max for e in ests), total),
    )


def combine_min_should(ests: Sequence[CardinalityEstimation], min_count: int,
                       total: int) -> CardinalityEstimation:
    """At least ``min_count`` of N: OR over the AND of every
    ``min_count``-combination (query_estimator.rs:158-186)."""
    if min_count > len(ests):
        return CardinalityEstimation.exact(0)
    from itertools import combinations

    inter = [combine_must(list(c), total)
             for c in combinations(ests, min_count)]
    return combine_should(inter, total)


def invert(est: CardinalityEstimation, total: int) -> CardinalityEstimation:
    return CardinalityEstimation(
        max(0, total - est.max), max(0, total - est.exp), max(0, total - est.min)
    )


# ---------------------------------------------------------------------------
# per-condition estimation from field stats
# ---------------------------------------------------------------------------


def _as_number(v: Any) -> float | None:
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.timestamp()
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            try:
                return _dt.datetime.fromisoformat(v.replace("Z", "+00:00")).timestamp()
            except ValueError:
                return None
    return None


def _est_match_one(st: FieldCardStats) -> CardinalityEstimation:
    """match.value with only (n, D) stats: uniform expectation n/D; the
    other D-1 values each account for >= 1 row, bounding max."""
    if st.n_distinct <= 0:
        return CardinalityEstimation.exact(0)
    return CardinalityEstimation(
        0, round(st.n / st.n_distinct), max(0, st.n - st.n_distinct + 1)
    )


def _est_range(st: FieldCardStats, rng: Mapping[str, Any]) -> CardinalityEstimation:
    """Numeric/datetime range under a uniform-distribution assumption over
    the observed [min, max] (the classic columnar-stats estimate)."""
    if st.min_num is None or st.max_num is None:
        return CardinalityEstimation(0, st.n // 2, st.n)
    lo, hi = st.min_num, st.max_num
    glo, ghi = lo, hi
    for key in ("gt", "gte"):
        if (v := _as_number(rng.get(key))) is not None:
            glo = max(glo, v)
    for key in ("lt", "lte"):
        if (v := _as_number(rng.get(key))) is not None:
            ghi = min(ghi, v)
    if ghi < glo:
        return CardinalityEstimation.exact(0)
    span = hi - lo
    frac = 1.0 if span <= 0 else (ghi - glo) / span
    return CardinalityEstimation(0, round(st.n * frac), st.n)


def estimate_condition(cond: Mapping[str, Any],
                       stats: Mapping[str, FieldCardStats],
                       total: int) -> CardinalityEstimation:
    if "has_id" in cond:
        return CardinalityEstimation.exact(min(len(list(cond["has_id"])), total))
    if "is_empty" in cond:
        st = stats.get(cond["is_empty"]["key"])
        if st is None:
            return CardinalityEstimation.unknown(total)
        # scalar-typed declared fields: empty == absent == NULL
        return CardinalityEstimation.exact(min(st.nulls, total))
    if "is_null" in cond:
        st = stats.get(cond["is_null"]["key"])
        if st is None:
            return CardinalityEstimation.unknown(total)
        # JSON-null count is bounded by the NULL count; without a marker
        # column they coincide
        return CardinalityEstimation(0, min(st.nulls, total), min(st.nulls, total))
    if any(k in cond for k in ("must", "should", "must_not", "min_should")) or not cond:
        return estimate_filter(cond, stats, total)
    if "key" in cond:
        st = stats.get(cond["key"])
        if st is None:
            return CardinalityEstimation.unknown(total)
        if "match" in cond:
            m = cond["match"]
            if "value" in m:
                return _est_match_one(st)
            if "any" in m:
                vals = list(m["any"])
                return combine_should([_est_match_one(st)] * len(vals), st.n)
            if "except" in m:
                vals = list(m["except"])
                hit = combine_should([_est_match_one(st)] * len(vals), st.n)
                return invert(hit, st.n)
            # text / phrase / prefix: no postings stats in the columnar layout
            return CardinalityEstimation.unknown(total)
        if "range" in cond:
            return _est_range(st, cond["range"])
    # nested / geo / values_count / has_vector: no stats-side estimator
    return CardinalityEstimation.unknown(total)


def estimate_filter(flt: Mapping[str, Any] | None,
                    stats: Mapping[str, FieldCardStats],
                    total: int) -> CardinalityEstimation:
    """Estimate a full Filter object (must AND should AND min_should AND
    must_not — query_estimator.rs:216-243 clause structure)."""
    if not flt:
        return CardinalityEstimation.exact(total)
    parts: list[CardinalityEstimation] = []
    if must := flt.get("must"):
        must = must if isinstance(must, list) else [must]
        parts.append(combine_must(
            [estimate_condition(c, stats, total) for c in must], total))
    if should := flt.get("should"):
        should = should if isinstance(should, list) else [should]
        parts.append(combine_should(
            [estimate_condition(c, stats, total) for c in should], total))
    if mn := flt.get("min_should"):
        parts.append(combine_min_should(
            [estimate_condition(c, stats, total) for c in mn["conditions"]],
            int(mn["min_count"]), total))
    if must_not := flt.get("must_not"):
        must_not = must_not if isinstance(must_not, list) else [must_not]
        parts.append(combine_must(
            [invert(estimate_condition(c, stats, total), total)
             for c in must_not], total))
    return combine_must(parts, total)


# ---------------------------------------------------------------------------
# sampled cardinality check (sample_estimation.rs)
# ---------------------------------------------------------------------------


def agresti_coull_interval(trials: int, positive: int,
                           total: int) -> tuple[int, int]:
    """(expected cardinality, +-interval at z=2) — the reference's
    Agresti-Coull approximation (sample_estimation.rs:9-18)."""
    z = 2.0
    n_hat = trials + z * z
    p_hat = (positive + z * z / 2.0) / n_hat
    interval = z * math.sqrt((p_hat / n_hat) * (1.0 - p_hat))
    return int(p_hat * total), int(interval * total)


def sample_check_cardinality(
    df: DataFrame,
    flt: Mapping[str, Any],
    threshold: int,
    total: int,
    *,
    max_sample: int = 1000,
    seed: int = 42,
    text_params: dict | None = None,
) -> bool:
    """True when the filter's cardinality is (confidently) above
    ``threshold``. One seeded-sample job counting trials and matches
    together; the iterative early-exit of the reference collapses to a
    single interval test because Spark prices per-job, not per-row."""
    # no .limit() cap: LIMIT reads the first-scanned partitions only, which
    # skews the positive rate whenever the filter correlates with layout —
    # the Bernoulli fraction alone keeps the sample uniform (see
    # points.count_estimate)
    frac = min(1.0, 1.2 * max_sample / max(total, 1))
    sample = df if frac >= 1.0 else df.sample(fraction=frac, seed=seed)
    cond = filter_column(df, dict(flt), text_params=text_params)
    row = sample.agg(
        F.count(F.lit(1)).alias("trials"),
        F.count(F.when(cond, F.lit(1))).alias("positive"),
    ).collect()[0]
    trials, positive = int(row["trials"]), int(row["positive"])
    if trials == 0:
        return False
    exp, interval = agresti_coull_interval(trials, positive, total)
    if exp - interval > threshold:
        return True
    if exp + interval < threshold:
        return False
    return exp > threshold


# ---------------------------------------------------------------------------
# per-cluster filter stats (the IVF-native ACORN analogue)
# ---------------------------------------------------------------------------
#
# The reference's filtered-HNSW traversal steers the graph walk by which
# neighbors pass the filter (ACORN-style, types.rs:629-650 + the
# hnsw_index graph traversal). The IVF-native analogue: an ingest-time
# histogram (field, value, cluster) -> match count, so the filtered probe
# selector can see WHERE the matching points live instead of assuming
# they spread uniformly over clusters. A filter correlated with cluster
# geometry (all matches in a few clusters — e.g. a tenant or label field
# that also shaped the embedding space) makes the global-selectivity
# nprobe boost arbitrarily wrong: it widens the probe ring around the
# query while every match sits elsewhere. With the histogram the selector
# walks clusters in centroid-distance order, skips zero-match clusters,
# and stops once it has covered nprobe clusters' worth of matching mass.


def _norm_stat_val(v: Any, ftype: str | None = None) -> str | None:
    """Normalize a filter value to its histogram key for a field of type
    ``ftype`` ('bool'/'int'/'float'/'string'); None = cannot normalize
    confidently (type mismatch) — the caller must fall back rather than
    claim an exact zero."""
    if ftype is None:  # legacy untyped stats (hand-built in tests)
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    if ftype == "bool":
        return ("true" if v else "false") if isinstance(v, bool) else None
    if isinstance(v, bool):
        return None
    if ftype == "int":
        if isinstance(v, int):
            return str(v)
        if isinstance(v, float) and v.is_integer():
            return str(int(v))  # filter 3.0 matches stored int 3
        return None
    if ftype == "float":
        # Spark renders double->string via Java Double.toString; Python's
        # repr agrees for plain decimals ("3.0", "0.1") but not exponent
        # forms ("1e+20" vs "1.0E20"). Unmatched keys are caught by the
        # caller's seen-value check, so a rendering miss degrades to a
        # safe fallback, never a wrong zero.
        return str(float(v)) if isinstance(v, (int, float)) else None
    if ftype == "string":
        return v if isinstance(v, str) else None
    return None


@dataclass(frozen=True)
class ClusterFieldStats:
    """(field, normalized value) -> {cluster: count} — exact at build
    time; rebuild with the index after bulk ingests (same staleness
    contract as the centroids themselves). ``field_types`` records each
    covered field's scalar type ('bool'/'int'/'float'/'string'); array
    fields are exploded element-wise at build (array_distinct first, so a
    value's histogram counts ROWS containing it) and carry an 'array_'
    prefix. None = legacy untyped stats."""

    counts: Mapping[tuple[str, str], Mapping[int, int]]
    n_clusters: int
    field_types: Mapping[str, str] | None = None


_STAT_TYPE_TAGS = {
    "boolean": "bool",
    "byte": "int", "short": "int", "integer": "int", "long": "int",
    "float": "float", "double": "float",
    "string": "string",
}


def build_cluster_field_stats(
    assigned: DataFrame,
    fields: Sequence[str],
    *,
    cluster_col: str = "__cluster",
    n_clusters: int | None = None,
) -> ClusterFieldStats:
    """One map-side-combined aggregation over the assigned corpus for ALL
    fields (melted in-row), collected driver-side — bounded by
    clusters x sum(distinct values), the same low-cardinality contract as
    registering a keyword payload index. Array-typed fields are exploded
    (distinct elements per row, so per-value counts = rows containing the
    value); unsupported types (struct/map/nested array) are skipped and
    recorded as uncovered."""
    from pyspark.sql import types as T

    field_types: dict[str, str] = {}
    pair_arrays = []  # each: array<struct<f:string, v:string>> per row
    for f in fields:
        dt = assigned.schema[f].dataType
        if isinstance(dt, T.ArrayType):
            tag = _STAT_TYPE_TAGS.get(dt.elementType.typeName())
            if tag is None:
                continue  # nested/unsupported element type: not covered
            field_types[f] = f"array_{tag}"

            def _tag_elem(fname):
                # closure factory: a default-arg lambda would look
                # two-parameter to F.transform, which then passes the
                # array INDEX as the second argument
                return lambda x: F.struct(F.lit(fname).alias("f"),
                                          x.alias("v"))

            pair_arrays.append(F.coalesce(
                F.transform(
                    F.array_distinct(F.col(f).cast("array<string>")),
                    _tag_elem(f),
                ),
                F.array().cast("array<struct<f:string,v:string>>"),
            ))
        else:
            tag = _STAT_TYPE_TAGS.get(dt.typeName())
            if tag is None:
                continue
            field_types[f] = tag
            pair_arrays.append(F.array(
                F.struct(F.lit(f).alias("f"),
                         F.col(f).cast("string").alias("v"))))
    rows = []
    if pair_arrays:
        rows = (
            assigned.select(F.col(cluster_col).alias("__c"),
                            F.explode(F.concat(*pair_arrays)).alias("p"))
            .where(F.col("p.v").isNotNull())
            .groupBy("p.f", "p.v", "__c")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    counts: dict[tuple[str, str], dict[int, int]] = {}
    clusters = set()
    for r in rows:
        counts.setdefault((r["f"], r["v"]), {})[int(r["__c"])] = int(r["n"])
        clusters.add(int(r["__c"]))
    return ClusterFieldStats(
        counts=counts,
        n_clusters=n_clusters if n_clusters is not None
        else (max(clusters) + 1 if clusters else 0),
        field_types=field_types,
    )


def per_cluster_matches(
    flt: Mapping[str, Any] | None,
    cstats: ClusterFieldStats | None,
) -> dict[int, int] | None:
    """Per-cluster match counts for filters the histogram can answer
    EXACTLY: a single must condition with match.value / match.any on a
    covered (field, value) set. Anything else returns None (the caller
    falls back to the global-selectivity boost) — an AND of conditions
    would only give a per-cluster upper bound, and stopping a probe walk
    on an upper bound under-probes."""
    if not flt or cstats is None:
        return None
    if set(flt) != {"must"}:
        return None
    must = flt["must"]
    if isinstance(must, Mapping):
        must = [must]
    if len(must) != 1:
        return None
    cond = must[0]
    key, m = cond.get("key"), cond.get("match")
    if not key or not isinstance(m, Mapping):
        return None
    if "value" in m:
        vals = [m["value"]]
    elif "any" in m:
        vals = list(m["any"])
    else:
        return None
    if cstats.field_types is not None:
        ftype = cstats.field_types.get(key)
        if ftype is None:
            return None  # field not covered (or unsupported type)
        if ftype.startswith("array_"):
            # element histograms count rows-containing-value, which is
            # exact for ONE value; multiple values over-count rows that
            # contain several of them (upper bound -> would under-probe)
            if len(vals) != 1:
                return None
            ftype = ftype[len("array_"):]
    else:
        ftype = None  # legacy untyped stats: normalize by python type
        if key not in {f for f, _ in cstats.counts}:
            return None
    per: dict[int, int] = {}
    seen_any = False
    for v in vals:
        nv = _norm_stat_val(v, ftype)
        if nv is None:
            return None  # value not confidently normalizable for ftype
        hist = cstats.counts.get((key, nv))
        if hist is None:
            # Value never observed. For exactly-rendered types (bool/int/
            # string) that's a true zero contribution; for floats an
            # "unseen" key can be a Python-vs-Spark string-rendering miss
            # (e.g. exponent-form doubles), so a mixed any-list would
            # silently undercount matching mass and under-probe — decline
            # instead and let the caller fall back.
            if ftype == "float":
                return None
            continue  # exact-rendered value truly unseen: zero matches
        seen_any = True
        # a scalar field matches one value per row -> value histograms
        # are disjoint and their per-cluster sum is exact
        for c, n in hist.items():
            per[c] = per.get(c, 0) + n
    if not seen_any:
        # No requested value was ever observed under any key. Either the
        # filter truly matches nothing, or the value->string rendering
        # disagrees with Spark's cast (e.g. exponent-form doubles) — we
        # cannot tell which, so refuse to answer rather than return an
        # exact-zero that silently empties the search.
        return None
    return per


def select_probe_clusters(
    centroids,
    query_vector: Sequence[float],
    matches: Mapping[int, int],
    *,
    nprobe: int,
    k: int,
) -> list[int]:
    """Walk clusters in centroid-distance order, skipping zero-match
    clusters, until the probed set covers ``nprobe`` clusters' worth of
    matching mass (and at least ``k`` candidates when available)."""
    import numpy as np

    total_matches = sum(matches.values())
    if total_matches == 0:
        return []
    n_clusters = len(centroids)
    target = max(k, -(-nprobe * total_matches // n_clusters))
    q = np.asarray(query_vector, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))
    probes: list[int] = []
    cum = 0
    for c in order:
        n = matches.get(int(c), 0)
        if n == 0:
            continue
        probes.append(int(c))
        cum += n
        if cum >= target and len(probes) >= min(nprobe, len(matches)):
            break
    return probes


# ---------------------------------------------------------------------------
# the dispatcher
# ---------------------------------------------------------------------------

#: Default plain-vs-index crossover (points). The reference's HNSW default
#: is 10_000 (segment config full_scan_threshold); the IVF-probe fixed
#: cost on Spark is of the same order of scoring ~10^4 rows, so the same
#: default holds.
FULL_SCAN_THRESHOLD = 10_000


def choose_filtered_strategy(
    flt: Mapping[str, Any],
    stats: Mapping[str, FieldCardStats],
    total: int,
    *,
    full_scan_threshold: int = FULL_SCAN_THRESHOLD,
    sampler: Callable[[], bool] | None = None,
) -> tuple[str, CardinalityEstimation]:
    """dispatch.rs:120-176 — 'plain' when max < threshold, 'ivf' when
    min > threshold, else ask the sampler (fall back to the expectation)."""
    est = estimate_filter(flt, stats, total)
    if est.max < full_scan_threshold:
        return "plain", est
    if est.min > full_scan_threshold:
        return "ivf", est
    if sampler is not None:
        return ("ivf" if sampler() else "plain"), est
    return ("ivf" if est.exp > full_scan_threshold else "plain"), est


def auto_search(
    index,  # IvfIndex
    query_vector: Sequence[float],
    *,
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
    flt: dict[str, Any] | None = None,
    stats: Mapping[str, FieldCardStats] | None = None,
    total: int | None = None,
    full_scan_threshold: int = FULL_SCAN_THRESHOLD,
    sample: bool = True,
    max_sample: int = 1000,
    seed: int = 42,
    filter_probe_boost: bool = True,
    exact: bool = False,
    return_strategy: bool = False,
    cluster_stats: ClusterFieldStats | None = None,
):
    """Filtered ANN with the reference's strategy dispatch (module
    docstring). Returns the result DataFrame, or ``(df, strategy, est)``
    with ``return_strategy=True``.

    ``stats`` / ``total`` come from :func:`stats_from_index` /
    a cached ``count()``; when absent the corpus is counted once.
    ``filter_probe_boost`` widens ``nprobe`` by 1/selectivity (capped at
    the cluster count) on the index path, so a 30%-selective filter still
    surfaces ~``nprobe`` clusters' worth of matching candidates — the
    recall-preservation analogue of the reference's filter-aware graph
    traversal. ``cluster_stats`` upgrades that GLOBAL boost to per-cluster
    awareness for histogram-answerable filters: the probe set is chosen
    by where the matches actually live (see the ACORN-analogue section
    above), which both fixes recall when the filter correlates with
    cluster geometry and skips zero-match clusters the boost would read."""
    from qdrant_spark.operators.ann import ivf_search
    from qdrant_spark.operators.knn import knn

    points = index.assigned
    if total is None:
        total = points.count()
    est = CardinalityEstimation.exact(total)

    if exact:
        strategy = "plain"
    elif flt is None:
        strategy = "plain" if total < full_scan_threshold else "ivf"
    else:
        sampler = None
        if sample:
            def sampler() -> bool:
                return sample_check_cardinality(
                    points, flt, full_scan_threshold, total,
                    max_sample=max_sample, seed=seed)
        strategy, est = choose_filtered_strategy(
            flt, stats or {}, total,
            full_scan_threshold=full_scan_threshold, sampler=sampler)

    if strategy == "plain":
        out = knn(points, query_vector, metric=metric, k=k,
                  vec_col=index.vec_col, id_col=index.id_col, flt=flt,
                  select=[index.id_col, "score"])
    else:
        probe_set = None
        if flt is not None:
            pc = per_cluster_matches(flt, cluster_stats)
            if pc is not None:
                probe_set = select_probe_clusters(
                    index.centroids, query_vector, pc, nprobe=nprobe, k=k)
        np_eff = nprobe
        if probe_set is None and flt is not None and filter_probe_boost:
            sel = max(est.exp, 1) / max(total, 1)
            np_eff = min(len(index.centroids),
                         int(math.ceil(nprobe / max(sel, 1e-9))))
        out = ivf_search(index, query_vector, k=k, nprobe=np_eff,
                         metric=metric, flt=flt, probe_clusters=probe_set)
    if return_strategy:
        return out, strategy, est
    return out
