"""Property test: compiled filters vs a pure-Python reference evaluator.

Mirrors the reference's proptest strategy (SURVEY §5): random payloads with
missing / empty / scalar-vs-array values, random filter trees, and an
independent evaluator that implements the documented semantics directly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qdrant_spark.filters import apply_filter

VOCAB = ["red", "green", "blue", "gold"]


# --- pure-Python reference evaluator ---------------------------------------


def _values(row, key):
    v = row.get(key)
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def eval_cond(row, cond):
    if "has_id" in cond:
        return row["id"] in cond["has_id"]
    if "is_empty" in cond:
        return len(_values(row, cond["is_empty"]["key"])) == 0
    key = cond.get("key")
    vals = _values(row, key)
    if "match" in cond:
        m = cond["match"]
        if "value" in m:
            return m["value"] in vals
        if "any" in m:
            return any(v in m["any"] for v in vals)
        if "except" in m:
            if not m["except"]:
                return any(v is not None for v in vals)
            return any(v not in m["except"] and v is not None for v in vals)
    if "range" in cond:
        r = cond["range"]

        def ok(v):
            if v is None:
                return False
            for op, f in (("gt", lambda a, b: a > b), ("gte", lambda a, b: a >= b),
                          ("lt", lambda a, b: a < b), ("lte", lambda a, b: a <= b)):
                if op in r and not f(v, r[op]):
                    return False
            return True

        return any(ok(v) for v in vals)
    if "values_count" in cond:
        n = len(_values(row, key))
        r = cond["values_count"]
        return all(
            f(n, r[op])
            for op, f in (("gt", lambda a, b: a > b), ("gte", lambda a, b: a >= b),
                          ("lt", lambda a, b: a < b), ("lte", lambda a, b: a <= b))
            if op in r
        )
    raise ValueError(cond)


def eval_filter(row, flt):
    for c in flt.get("must", []):
        if not (eval_filter(row, c) if _is_filter(c) else eval_cond(row, c)):
            return False
    if should := flt.get("should"):
        if not any(
            eval_filter(row, c) if _is_filter(c) else eval_cond(row, c)
            for c in should
        ):
            return False
    if mn := flt.get("min_should"):
        hits = sum(
            1 for c in mn["conditions"]
            if (eval_filter(row, c) if _is_filter(c) else eval_cond(row, c))
        )
        if hits < mn["min_count"]:
            return False
    for c in flt.get("must_not", []):
        if eval_filter(row, c) if _is_filter(c) else eval_cond(row, c):
            return False
    return True


def _is_filter(c):
    return not c or any(k in c for k in ("must", "should", "must_not", "min_should"))


# --- strategies ------------------------------------------------------------


def conditions():
    num_bound = st.integers(-5, 15).map(float)
    return st.one_of(
        st.sampled_from(VOCAB).map(lambda v: {"key": "kw", "match": {"value": v}}),
        st.lists(st.sampled_from(VOCAB), max_size=3).map(
            lambda vs: {"key": "kw", "match": {"any": vs}}),
        st.lists(st.sampled_from(VOCAB), max_size=2).map(
            lambda vs: {"key": "kw", "match": {"except": vs}}),
        st.tuples(num_bound, num_bound).map(
            lambda t: {"key": "num", "range": {"gte": min(t), "lt": max(t)}}),
        num_bound.map(lambda b: {"key": "num", "range": {"gt": b}}),
        st.integers(0, 3).map(lambda n: {"key": "kw", "values_count": {"gte": n}}),
        st.just({"is_empty": {"key": "kw"}}),
        st.lists(st.integers(0, 49), min_size=1, max_size=5).map(
            lambda ids: {"has_id": ids}),
    )


def filters(depth=2):
    cond = conditions() if depth == 0 else st.one_of(conditions(), filters(depth - 1))
    return st.fixed_dictionaries(
        {},
        optional={
            "must": st.lists(cond, max_size=2),
            "should": st.lists(cond, min_size=1, max_size=2),
            "must_not": st.lists(cond, max_size=2),
            "min_should": st.fixed_dictionaries(
                {"conditions": st.lists(cond, min_size=1, max_size=3),
                 "min_count": st.integers(1, 2)}),
        },
    )


@pytest.fixture(scope="module")
def random_rows(spark):
    import random

    rng = random.Random(42)
    rows = []
    for i in range(50):
        kw = rng.choice(
            [None, [], [rng.choice(VOCAB)],
             rng.sample(VOCAB, rng.randint(1, 3))]
        )
        num = rng.choice(
            [None, [], [round(rng.uniform(-5, 15), 2)],
             [round(rng.uniform(-5, 15), 2), round(rng.uniform(-5, 15), 2)]]
        )
        rows.append({"id": i, "kw": kw, "num": num})
    df = spark.createDataFrame(
        [(r["id"], r["kw"], r["num"]) for r in rows],
        "id: long, kw: array<string>, num: array<double>",
    ).cache()
    df.count()
    return rows, df


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(flt=filters())
def test_compiled_filter_matches_reference(random_rows, flt):
    rows, df = random_rows
    expected = {r["id"] for r in rows if eval_filter(r, flt)}
    got = {r["id"] for r in apply_filter(df, flt).select("id").collect()}
    assert got == expected, flt


# --- JsonPath array-path property test -------------------------------------
# independent evaluator of value_get semantics (json_path/mod.rs:319-340)


def _jp_values(row, path):
    import re as _re

    vals = [row]
    for seg in path.split("."):
        m = _re.match(r"^([^\[\]]+)((?:\[\d*\])*)$", seg)
        name, brackets = m.group(1), m.group(2)
        nxt = []
        for v in vals:
            if isinstance(v, dict) and name in v:
                nxt.append(v[name])
        vals = nxt
        for b in _re.findall(r"\[(\d*)\]", brackets):
            nxt = []
            for v in vals:
                if isinstance(v, list):
                    if b == "":
                        nxt.extend(v)
                    elif int(b) < len(v):
                        nxt.append(v[int(b)])
            vals = nxt
    return vals


nested_rows = st.lists(
    st.fixed_dictionaries(
        {
            "b": st.integers(min_value=0, max_value=5),
            "c": st.lists(st.integers(min_value=0, max_value=9), max_size=3),
        }
    ),
    max_size=3,
)
jp_paths = st.sampled_from(["a[].b", "a[0].b", "a[1].b", "a[].c[]", "a[0].c[]", "a[].c[1]"])
jp_conds = st.one_of(
    st.builds(lambda p, v: {"key": p, "match": {"value": v}}, jp_paths,
              st.integers(min_value=0, max_value=9)),
    st.builds(lambda p, lo: {"key": p, "range": {"gte": lo}}, jp_paths,
              st.integers(min_value=0, max_value=9)),
)


@pytest.fixture(scope="module")
def jp_frame(spark):
    def make(payloads):
        return spark.createDataFrame(
            [(i, p) for i, p in enumerate(payloads)],
            "id: long, a: array<struct<b: long, c: array<long>>>",
        )

    return make


@given(payloads=st.lists(nested_rows, min_size=1, max_size=8), cond=jp_conds)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jsonpath_array_paths_match_reference(jp_frame, payloads, cond):
    df = jp_frame(payloads)
    got = sorted(r["id"] for r in apply_filter(df, {"must": [cond]}).collect())

    def ok(row):
        vals = _jp_values({"a": row}, cond["key"])
        if "match" in cond:
            return any(v == cond["match"]["value"] for v in vals)
        return any(v is not None and v >= cond["range"]["gte"] for v in vals)

    exp = [i for i, p in enumerate(payloads) if ok(p)]
    assert got == exp
