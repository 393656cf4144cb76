"""Property tests for the client facade's payload type inference: any
payload a user upserts comes back value-identical through retrieve, and
scalar fields stay filterable.

Documented divergence from the reference's schemaless JSON payloads: a
field must keep ONE value kind per collection (int/float mix to double;
null-only / empty-list columns re-type once a batch supplies real
values); a genuine kind conflict (e.g. string vs bool on the same key)
raises a clear error instead of storing mixed types — typed columns are
what make the filters pushable at scale (see client._merge_type)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qdrant_spark.client import QdrantSparkClient

# per-key value kinds stay consistent (key name encodes the kind); "num"
# deliberately mixes int/float to exercise the long->double widening
_inner = st.fixed_dictionaries({}, optional={
    "x": st.integers(min_value=-100, max_value=100),
    "y": st.text(alphabet="abc", max_size=4),
})
_payloads = st.fixed_dictionaries({}, optional={
    "s": st.text(alphabet="abcxyz ", min_size=0, max_size=8),
    "b": st.booleans(),
    "num": st.one_of(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.floats(allow_nan=False, allow_infinity=False, width=32)),
    "li": st.lists(st.integers(min_value=-100, max_value=100), max_size=4),
    "ls": st.lists(st.text(alphabet="abc", max_size=4), max_size=4),
    "d": _inner,
})


def _same(a, b) -> bool:
    """Value equality modulo the documented widenings."""
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b or a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_same(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        ka = {k for k, v in a.items() if v is not None}
        kb = {k for k, v in b.items() if v is not None}
        return ka == kb and all(_same(a[k], b[k]) for k in ka)
    return a == b


@pytest.fixture(scope="module")
def client(spark):
    return QdrantSparkClient(spark)


_counter = [0]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(p1=_payloads, p2=_payloads)
def test_payload_roundtrip(client, p1, p2):
    _counter[0] += 1
    name = f"prop_{_counter[0]}"
    client.create_collection(name, vectors_config={"size": 2,
                                                   "distance": "Dot"})
    try:
        client.upsert(name, [
            {"id": 1, "vector": [1.0, 0.0], "payload": p1},
            {"id": 2, "vector": [0.0, 1.0], "payload": p2},
        ])
        recs = {r.id: r for r in client.retrieve(name, [1, 2])}
        for pid, p in ((1, p1), (2, p2)):
            got = recs[pid].payload or {}
            want = {k: v for k, v in p.items() if v is not None}
            assert set(got) == set(want), (got, want)
            for k in want:
                assert _same(got[k], want[k]), (k, got[k], want[k])
        # scalar string fields stay filterable by exact match
        for k, v in p1.items():
            if isinstance(v, str):
                n = client.count(name, count_filter={"must": [
                    {"key": k, "match": {"value": v}}]}).count
                assert n >= 1
    finally:
        client.delete_collection(name)


def test_cross_batch_widening_of_untyped_columns(client):
    """A column first stored from null-only / empty-list values re-types
    when a later batch supplies real values (no conflict error)."""
    client.create_collection("widen", vectors_config={"size": 2,
                                                      "distance": "Dot"})
    try:
        client.upsert("widen", [
            {"id": 1, "vector": [1.0, 0.0], "payload": {"li": [], "d": {}}}])
        client.upsert("widen", [
            {"id": 2, "vector": [0.0, 1.0],
             "payload": {"li": [4, 5], "d": {"x": 7}}}])
        recs = {r.id: r for r in client.retrieve("widen", [1, 2])}
        assert recs[2].payload["li"] == [4, 5]
        assert recs[2].payload["d"] == {"x": 7}
        assert recs[1].payload["li"] == []      # empty array preserved
        # a third batch on the now-typed column stays typed
        client.upsert("widen", [
            {"id": 3, "vector": [1.0, 1.0], "payload": {"li": [9]}}])
        (r3,) = client.retrieve("widen", [3])
        assert r3.payload["li"] == [9]
    finally:
        client.delete_collection("widen")


def test_kind_conflict_raises_clearly(client):
    client.create_collection("conflict", vectors_config={"size": 2,
                                                         "distance": "Dot"})
    try:
        with pytest.raises(ValueError, match="payload type conflict"):
            client.upsert("conflict", [
                {"id": 1, "vector": [1.0, 0.0], "payload": {"k": "text"}},
                {"id": 2, "vector": [0.0, 1.0], "payload": {"k": True}},
            ])
        # int/float mixing on one key widens instead of conflicting
        client.upsert("conflict", [
            {"id": 1, "vector": [1.0, 0.0], "payload": {"n": 1}},
            {"id": 2, "vector": [0.0, 1.0], "payload": {"n": 2.5}},
        ])
        recs = {r.id: r for r in client.retrieve("conflict", [1, 2])}
        assert recs[1].payload["n"] == pytest.approx(1.0)
        assert recs[2].payload["n"] == pytest.approx(2.5)
    finally:
        client.delete_collection("conflict")


def test_offset_with_order_by_rejected(client):
    client.create_collection("ob_reject", vectors_config={"size": 2,
                                                          "distance": "Dot"})
    try:
        client.upsert("ob_reject", [{"id": 1, "vector": [1.0, 0.0],
                                     "payload": {"n": 1}}])
        with pytest.raises(ValueError, match="order_by does not support"):
            client.scroll("ob_reject", order_by="n", offset=1)
    finally:
        client.delete_collection("ob_reject")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(p1=_payloads, p2=_payloads)
def test_set_payload_nested_roundtrip(client, p1, p2):
    """set_payload with arbitrary nested values: upsert p1, then set p2 —
    every key listed in p2 reads back as p2's value (modulo the
    documented widenings and null-subfield representation), unlisted p1
    keys survive untouched."""
    _counter[0] += 1
    name = f"prop_sp_{_counter[0]}"
    client.create_collection(name, vectors_config={"size": 2,
                                                   "distance": "Dot"})
    try:
        client.upsert(name, [{"id": 1, "vector": [1.0, 0.0],
                              "payload": p1}])
        client.set_payload(name, p2, points=[1])
        got = client.retrieve(name, [1])[0].payload or {}
        for k, v in p2.items():
            if v is None or v == [] or v == {}:
                continue
            assert _same(got.get(k), v), (k, got.get(k), v)
        for k, v in p1.items():
            if k in p2 or v is None or v == [] or v == {}:
                continue
            assert _same(got.get(k), v), (k, got.get(k), v)
    finally:
        client.delete_collection(name)
