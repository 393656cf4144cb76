"""Filter-DSL compiler tests against the canonical 10-point fixture
(reference: tests/openapi/helpers/collection_setup.py + test_filter*.py)."""

import pytest

from qdrant_spark.filters import apply_filter


def ids(df, flt):
    out = apply_filter(df, flt).select("id").collect()
    return sorted((r["id"] for r in out), key=int)


def test_match_value(points_basic):
    assert ids(points_basic, {"must": [{"key": "city", "match": {"value": "Berlin"}}]}) == [
        "1", "2", "3",
    ]


def test_match_value_and(points_basic):
    flt = {
        "must": [
            {"key": "city", "match": {"value": "Berlin"}},
            {"key": "city", "match": {"value": "London"}},
        ]
    }
    assert ids(points_basic, flt) == ["2"]


def test_should_or(points_basic):
    flt = {
        "should": [
            {"key": "city", "match": {"value": "London"}},
            {"key": "price", "range": {"lt": 9.2}},
        ]
    }
    assert ids(points_basic, flt) == ["2", "4"]


def test_must_not(points_basic):
    flt = {"must_not": [{"key": "city", "match": {"value": "Berlin"}}]}
    # everything except 1,2,3 — including points with missing city
    assert ids(points_basic, flt) == ["4", "5", "6", "7", "8", "9", "10"]


def test_match_any(points_basic):
    flt = {"must": [{"key": "city", "match": {"any": ["London", "Moscow"]}}]}
    assert ids(points_basic, flt) == ["2", "3", "4"]


def test_match_except(points_basic):
    flt = {"must": [{"key": "city", "match": {"except": ["Berlin"]}}]}
    # at least one value not Berlin: 2 (London), 3 (Moscow), 4
    assert ids(points_basic, flt) == ["2", "3", "4"]


def test_match_except_empty_list_matches_field_presence(points_basic):
    # tests/openapi/test_match_except_empty.py: except [] -> has the field
    flt = {"must": [{"key": "city", "match": {"except": []}}]}
    assert ids(points_basic, flt) == ["1", "2", "3", "4"]


def test_range(points_basic):
    flt = {"must": [{"key": "price", "range": {"gte": 9.5, "lt": 11.0}}]}
    assert ids(points_basic, flt) == ["1", "3"]


def test_values_count(points_basic):
    flt = {"must": [{"key": "city", "values_count": {"gte": 2}}]}
    assert ids(points_basic, flt) == ["2", "3", "4"]


def test_is_empty(points_basic):
    flt = {"must": [{"is_empty": {"key": "city"}}]}
    # absent (5,6), JSON-null stored as NULL (7), empty array (8, 10), 9 absent
    assert ids(points_basic, flt) == ["5", "6", "7", "8", "9", "10"]


def test_is_null_marker(points_basic):
    flt = {"must": [{"is_null": {"key": "city"}}]}
    assert ids(points_basic, flt) == ["7"]


def test_has_id(points_basic):
    flt = {"must": [{"has_id": ["1", "7", "100"]}]}
    assert ids(points_basic, flt) == ["1", "7"]


def test_has_vector(points_basic):
    flt = {"must": [{"has_vector": "vec"}]}
    assert ids(points_basic, flt) == ["1", "2", "3", "4", "5", "6", "7", "8"]


def test_min_should(points_basic):
    flt = {
        "min_should": {
            "conditions": [
                {"key": "city", "match": {"value": "Berlin"}},
                {"key": "city", "match": {"value": "London"}},
                {"key": "price", "range": {"gte": 9.5}},
            ],
            "min_count": 2,
        }
    }
    # 1: berlin+price(10>=9.5)=2 ✓; 2: berlin+london+price(11)=3 ✓;
    # 3: berlin+price(9.5)=2 ✓; 4: london+price(9.0 no)=1 ✗
    assert ids(points_basic, flt) == ["1", "2", "3"]


def test_nested_filter_object(points_basic):
    flt = {
        "must": [
            {
                "must_not": [{"key": "city", "match": {"value": "Moscow"}}],
                "should": [{"key": "price", "range": {"gte": 10.0}}],
            }
        ]
    }
    assert ids(points_basic, flt) == ["1", "2"]


def test_empty_filter_matches_all(points_basic):
    assert len(ids(points_basic, None)) == 10
    assert len(ids(points_basic, {})) == 10


def test_nested_same_element_semantics(spark):
    # FIXTURES.md F5 shape: same-element AND inside exists
    df = spark.createDataFrame(
        [
            ("1", [{"name": "a", "population": 5.0}, {"name": "b", "population": 100.0}]),
            ("2", [{"name": "a", "population": 100.0}]),
        ],
        "id string, cities array<struct<name string, population double>>",
    )
    flt = {
        "must": [
            {
                "nested": {
                    "key": "cities",
                    "filter": {
                        "must": [
                            {"key": "name", "match": {"value": "a"}},
                            {"key": "population", "range": {"gte": 50.0}},
                        ]
                    },
                }
            }
        ]
    }
    got = sorted(r["id"] for r in apply_filter(df, flt).select("id").collect())
    # point 1 has name=a (pop 5) and pop>=50 (name b) but NOT on same element
    assert got == ["2"]


def test_geo_radius(spark):
    df = spark.createDataFrame(
        [
            ("berlin", {"lon": 13.4050, "lat": 52.5200}),
            ("potsdam", {"lon": 13.0645, "lat": 52.3906}),
            ("moscow", {"lon": 37.6173, "lat": 55.7558}),
        ],
        "id string, location struct<lon double, lat double>",
    )
    flt = {
        "must": [
            {
                "key": "location",
                "geo_radius": {"center": {"lon": 13.4050, "lat": 52.5200}, "radius": 50000},
            }
        ]
    }
    got = sorted(r["id"] for r in apply_filter(df, flt).select("id").collect())
    assert got == ["berlin", "potsdam"]


def test_geo_bounding_box_antimeridian(spark):
    df = spark.createDataFrame(
        [
            ("fiji", {"lon": 179.0, "lat": -17.0}),
            ("samoa", {"lon": -172.0, "lat": -13.0}),
            ("berlin", {"lon": 13.4, "lat": 52.5}),
        ],
        "id string, location struct<lon double, lat double>",
    )
    flt = {
        "must": [
            {
                "key": "location",
                "geo_bounding_box": {
                    "top_left": {"lon": 170.0, "lat": 0.0},
                    "bottom_right": {"lon": -160.0, "lat": -30.0},
                },
            }
        ]
    }
    got = sorted(r["id"] for r in apply_filter(df, flt).select("id").collect())
    assert got == ["fiji", "samoa"]


def test_geo_polygon_with_hole(spark):
    df = spark.createDataFrame(
        [("in", {"lon": 1.0, "lat": 1.0}), ("hole", {"lon": 5.0, "lat": 5.0}), ("out", {"lon": 20.0, "lat": 1.0})],
        "id string, location struct<lon double, lat double>",
    )
    flt = {
        "must": [
            {
                "key": "location",
                "geo_polygon": {
                    "exterior": {
                        "points": [
                            {"lon": 0.0, "lat": 0.0},
                            {"lon": 10.0, "lat": 0.0},
                            {"lon": 10.0, "lat": 10.0},
                            {"lon": 0.0, "lat": 10.0},
                            {"lon": 0.0, "lat": 0.0},
                        ]
                    },
                    "interiors": [
                        {
                            "points": [
                                {"lon": 4.0, "lat": 4.0},
                                {"lon": 6.0, "lat": 4.0},
                                {"lon": 6.0, "lat": 6.0},
                                {"lon": 4.0, "lat": 6.0},
                                {"lon": 4.0, "lat": 4.0},
                            ]
                        }
                    ],
                },
            }
        ]
    }
    got = sorted(r["id"] for r in apply_filter(df, flt).select("id").collect())
    assert got == ["in"]


def test_text_match(spark):
    df = spark.createDataFrame(
        [("1", "The quick brown Fox"), ("2", "quick red fox jumps"), ("3", "lazy dog")],
        "id string, body string",
    )
    all_t = {"must": [{"key": "body", "match": {"text": "quick fox"}}]}
    assert sorted(r["id"] for r in apply_filter(df, all_t).select("id").collect()) == ["1", "2"]
    any_t = {"must": [{"key": "body", "match": {"text_any": "dog fox"}}]}
    assert sorted(r["id"] for r in apply_filter(df, any_t).select("id").collect()) == ["1", "2", "3"]
    phrase = {"must": [{"key": "body", "match": {"phrase": "brown fox"}}]}
    assert sorted(r["id"] for r in apply_filter(df, phrase).select("id").collect()) == ["1"]
    prefix = {"must": [{"key": "body", "match": {"prefix": "laz"}}]}
    assert sorted(r["id"] for r in apply_filter(df, prefix).select("id").collect()) == ["3"]


# --- JsonPath array accessors (json_path/mod.rs:24-33, value_get :319-340) --


def _jp_df(spark):
    return spark.createDataFrame(
        [
            (1, [{"b": 1, "c": [10, 20]}, {"b": 2, "c": [30]}], {"xs": [5, 6]}),
            (2, [{"b": 7, "c": []}], {"xs": []}),
            (3, [], None),
            (4, None, {"xs": [9]}),
        ],
        "id: long, a: array<struct<b: long, c: array<long>>>, m: struct<xs: array<long>>",
    )


def _ids(df, flt):
    from qdrant_spark.filters import apply_filter

    return sorted(r["id"] for r in apply_filter(df, flt).collect())


def test_jsonpath_wildcard_key(spark):
    df = _jp_df(spark)
    assert _ids(df, {"must": [{"key": "a[].b", "match": {"value": 2}}]}) == [1]
    assert _ids(df, {"must": [{"key": "a[].b", "range": {"gte": 7}}]}) == [2]


def test_jsonpath_index_key(spark):
    df = _jp_df(spark)
    assert _ids(df, {"must": [{"key": "a[0].b", "match": {"value": 1}}]}) == [1]
    # index out of range -> no value -> no match
    assert _ids(df, {"must": [{"key": "a[1].b", "match": {"value": 2}}]}) == [1]
    assert _ids(df, {"must": [{"key": "m.xs[1]", "match": {"value": 6}}]}) == [1]


def test_jsonpath_double_wildcard(spark):
    df = _jp_df(spark)
    assert _ids(df, {"must": [{"key": "a[].c[]", "match": {"value": 30}}]}) == [1]
    assert _ids(df, {"must": [{"key": "a[].c", "values_count": {"gte": 2}}]}) == [1]


def test_jsonpath_is_empty_and_unknown(spark):
    df = _jp_df(spark)
    assert _ids(df, {"must": [{"is_empty": {"key": "a[].c[]"}}]}) == [2, 3, 4]
    # unknown path segment -> never matches
    assert _ids(df, {"must": [{"key": "a[].zz", "match": {"value": 1}}]}) == []


def test_has_id_ambiguous_id_column_raises(spark):
    """r5 ADVICE: multiple *_id columns and no "id" column -> has_id gives
    a descriptive error (not an unresolved-column AnalysisException);
    other conditions on the same frame stay usable."""
    import pytest

    from qdrant_spark.filters import apply_filter

    df = spark.createDataFrame(
        [(1, 2, "x")], ["doc_id", "vec_id", "val"])
    with pytest.raises(ValueError, match="pass id_col="):
        apply_filter(df, {"must": [{"has_id": [1]}]})
    # non-has_id filters don't touch id inference
    assert apply_filter(
        df, {"must": [{"key": "val", "match": {"value": "x"}}]}).count() == 1
    # explicit id_col resolves it
    assert apply_filter(df, {"must": [{"has_id": [2]}]},
                        id_col="vec_id").count() == 1


# --- SliceCondition (types.rs:3856-3928) ------------------------------------


def test_slice_disjoint_cover_and_nesting(spark):
    """For fixed total the slices are disjoint and cover all points; the
    hash is unsalted so slice 0 of total 4 is a subset of slice 0 of
    total 2 (types.rs:3867-3869)."""
    df = spark.range(0, 400).withColumnRenamed("id", "pid")
    seen = []
    for idx in range(4):
        flt = {"must": [{"slice": {"total": 4, "index": idx}}]}
        part = sorted(
            r["pid"] for r in apply_filter(df, flt, id_col="pid").collect())
        assert part, f"slice {idx}/4 of 400 uniform ids is empty"
        seen.extend(part)
    assert sorted(seen) == list(range(400))  # disjoint + covering
    s0of4 = {r["pid"] for r in apply_filter(
        df, {"must": [{"slice": {"total": 4, "index": 0}}]},
        id_col="pid").collect()}
    s0of2 = {r["pid"] for r in apply_filter(
        df, {"must": [{"slice": {"total": 2, "index": 0}}]},
        id_col="pid").collect()}
    assert s0of4 < s0of2  # strict subset: smaller sample nests in larger


def test_slice_composes_and_validates(points_basic):
    both = ids(points_basic, {"must": [{"slice": {"total": 1, "index": 0}},
                                       {"key": "city", "match": {"value": "Berlin"}}]})
    assert both == ["1", "2", "3"]  # total=1 selects everything
    with pytest.raises(ValueError, match="less than the total"):
        ids(points_basic, {"must": [{"slice": {"total": 3, "index": 3}}]})
    with pytest.raises(ValueError, match="positive"):
        ids(points_basic, {"must": [{"slice": {"total": 0, "index": 0}}]})
