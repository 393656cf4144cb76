"""Read operators (retrieve/scroll/count/facet/unique/sample) vs oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_spark.operators.points import (
    count,
    count_df,
    facet,
    retrieve,
    sample,
    scroll,
    unique_values,
)


def test_retrieve_projection(points_basic):
    got = retrieve(points_basic, ["1", "3"], with_payload=["city"], with_vector=True)
    assert sorted(got.columns) == ["city", "id", "vec"]
    rows = {r["id"]: r for r in got.collect()}
    assert set(rows) == {"1", "3"}
    assert rows["3"]["city"] == ["Berlin", "Moscow"]


def test_scroll_by_id_keyset(points_basic):
    page = scroll(points_basic, limit=3, offset_id="3")
    ids = [r["id"] for r in page.select("id").collect()]
    # string ids sort lexicographically: 3 < 4 < 5
    assert ids == sorted([i for i in map(str, range(1, 11)) if i >= "3"])[:3]


def test_scroll_order_by_value(points_basic):
    page = scroll(
        points_basic,
        limit=3,
        order_by="price",
        direction="desc",
        flt={"must": [{"key": "price", "range": {"gt": 0}}]},
    )
    rows = page.select("id", "price").collect()
    assert [r["id"] for r in rows] == ["2", "1", "3"]


def test_scroll_random_is_seeded(points_basic):
    a = [r["id"] for r in scroll(points_basic, limit=5, random_seed=7).collect()]
    b = [r["id"] for r in scroll(points_basic, limit=5, random_seed=7).collect()]
    assert a == b and len(a) == 5


def test_count_with_filter(points_basic):
    assert count(points_basic) == 10
    assert count(points_basic, {"must": [{"key": "city", "match": {"value": "Berlin"}}]}) == 3
    row = count_df(points_basic, {"must": [{"key": "city", "match": {"value": "Berlin"}}]}).collect()
    assert row[0]["count"] == 3


def test_facet_array_field(points_basic):
    rows = facet(points_basic, "city").collect()
    got = [(r["value"], r["count"]) for r in rows]
    # Berlin x3, London x2, Moscow x2; count desc then value asc
    assert got == [("Berlin", 3), ("London", 2), ("Moscow", 2)]


def test_facet_respects_filter_and_limit(documents):
    rows = facet(documents, "lang", limit=2).collect()
    oracle = (
        documents.groupBy("lang")
        .count()
        .orderBy(F.col("count").desc(), F.col("lang").asc())
        .limit(2)
        .collect()
    )
    assert [(r["value"], r["count"]) for r in rows] == [
        (r["lang"], r["count"]) for r in oracle
    ]


def test_unique_values(points_basic):
    vals = {r["value"] for r in unique_values(points_basic, "city").collect()}
    assert vals == {"Berlin", "London", "Moscow"}


def test_sample_deterministic(embeddings):
    a = sorted(r["vec_id"] for r in sample(embeddings, 20, seed=3).collect())
    b = sorted(r["vec_id"] for r in sample(embeddings, 20, seed=3).collect())
    assert a == b and len(a) == 20


def test_retrieve_payload_selectors(points_basic):
    from qdrant_spark.operators.points import retrieve

    inc = retrieve(points_basic, ["1"], with_payload={"include": ["city"]})
    assert set(inc.columns) == {"id", "city"}
    exc = retrieve(points_basic, ["1"], with_payload={"exclude": ["city"]})
    assert "city" not in exc.columns and "price" in exc.columns
    import pytest

    with pytest.raises(ValueError):
        retrieve(points_basic, ["1"], with_payload={"bogus": []})


def test_count_estimate_brackets_exact(documents):
    from qdrant_spark.operators.points import count, count_estimate

    flt = {"must": [{"key": "lang", "match": {"value": "en"}}]}
    exact = count(documents, flt)
    est, interval = count_estimate(documents, flt, max_sample=200)
    assert est - interval - 1 <= exact <= est + interval + 1
    # small corpus: the sample covers everything -> exact with zero interval
    est2, iv2 = count_estimate(documents, flt, max_sample=10_000)
    assert (est2, iv2) == (exact, 0)
    # no filter: the total is the answer
    n = documents.count()
    assert count_estimate(documents, None, total=n) == (n, 0)


def test_facet_estimate_brackets_exact(documents):
    """Scaled quarter-sample counts land within sampling error of the
    exact facet, are deterministic, and keep (est desc, value asc) order."""
    from qdrant_spark.operators.points import facet, facet_estimate

    exact = {r["value"]: r["count"] for r in
             facet(documents, "lang", limit=10).collect()}
    est = facet_estimate(documents, "lang", limit=10, fraction=0.25,
                         seed=7, id_col="doc_id").collect()
    got = {r["value"]: r["est_count"] for r in est}
    # deterministic md5 sample: second call identical
    again = {r["value"]: r["est_count"] for r in
             facet_estimate(documents, "lang", limit=10, fraction=0.25,
                            seed=7, id_col="doc_id").collect()}
    assert got == again
    # each estimate within ~4 sigma of a binomial quarter-sample
    for v, c in exact.items():
        assert v in got, v
        sigma = 4.0 * (c * 0.75 / 0.25) ** 0.5  # 4*sqrt(c*(1-f)/f)
        assert abs(got[v] - c) <= max(sigma, 40), (v, c, got[v])
    vals = [(r["est_count"], r["value"]) for r in est]
    assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))
    import pytest as _p
    with _p.raises(ValueError):
        facet_estimate(documents, "lang", fraction=0.0, id_col="doc_id")


def test_facet_and_unique_values_on_nested_path(spark):
    """Facet keys may be dotted struct paths (JsonPath facet keys in the
    reference); nested ARRAY subfields count each distinct value once."""
    from qdrant_spark.operators.points import facet, unique_values

    df = spark.createDataFrame(
        [(1, {"lang": "en", "tags": ["a", "b", "a"]}),
         (2, {"lang": "de", "tags": ["b"]}),
         (3, {"lang": "en", "tags": None})],
        "id: long, meta: struct<lang: string, tags: array<string>>")
    hits = facet(df, "meta.lang").collect()
    assert [(r["value"], r["count"]) for r in hits] == [("en", 2), ("de", 1)]
    arr = facet(df, "meta.tags").collect()
    assert [(r["value"], r["count"]) for r in arr] == [("b", 2), ("a", 1)]
    uv = unique_values(df, "meta.lang").collect()
    assert sorted(r[0] for r in uv) == ["de", "en"]
