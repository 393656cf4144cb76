"""Collection catalog: alias create/repoint/rename/delete semantics
(collection_meta_ops.rs:45-81) and planner integration via lookup_from."""

from __future__ import annotations

import pytest

from qdrant_spark.catalog import CollectionCatalog


@pytest.fixture()
def cat(spark, embeddings):
    c = CollectionCatalog()
    c.register("docs_v1", embeddings)
    c.register("docs_v2", embeddings.withColumnRenamed("label", "label2")
               .withColumnRenamed("label2", "label"))
    return c


def test_alias_create_resolve_repoint(cat, embeddings):
    cat.create_alias("prod", "docs_v1")
    assert cat.resolve("prod") is cat.resolve("docs_v1")
    cat.create_alias("prod", "docs_v2")  # atomic switchover
    assert cat.list_aliases() == {"prod": "docs_v2"}
    assert "prod" in cat and "docs_v1" in cat and "nope" not in cat


def test_alias_rules(cat):
    cat.create_alias("prod", "docs_v1")
    with pytest.raises(ValueError):
        cat.create_alias("docs_v2", "docs_v1")  # alias over collection name
    with pytest.raises(ValueError):
        cat.create_alias("p2", "prod")          # alias-to-alias chain
    with pytest.raises(KeyError):
        cat.create_alias("x", "missing")
    cat.rename_alias("prod", "live")
    assert cat.list_aliases("docs_v1") == {"live": "docs_v1"}
    cat.delete_alias("live")
    with pytest.raises(KeyError):
        cat.delete_alias("live")


def test_drop_collection_drops_aliases(cat):
    cat.create_alias("prod", "docs_v1")
    cat.drop("docs_v1")
    assert "prod" not in cat and "docs_v1" not in cat
    with pytest.raises(KeyError):
        cat.resolve("prod")


def test_lazy_registration(spark, embeddings):
    calls = []

    def loader():
        calls.append(1)
        return embeddings

    c = CollectionCatalog()
    c.register("lazy", loader)
    assert not calls
    assert c.resolve("lazy").count() == embeddings.count()
    assert calls == [1]


def test_planner_lookup_from_alias(embeddings):
    """lookup_from can name an ALIAS: the planner resolves through the
    catalog's Mapping interface."""
    from qdrant_spark.query import universal_query

    cat = CollectionCatalog()
    cat.register("vectors_v3", embeddings)
    cat.create_alias("vectors", "vectors_v3")
    req = {
        "query": {"nearest": {"id": 0}},
        "lookup_from": {"collection": "vectors", "vector": "embedding"},
        "limit": 5,
    }
    out = universal_query(embeddings, req, id_col="vec_id",
                          vec_col="embedding", collections=cat).collect()
    assert len(out) == 5 and out[0]["vec_id"] == 0


# -- field index ops (FieldIndexOperations mod.rs:207; param validation
# mirrors lib/segment/src/data_types/index.rs) ---------------------------


def test_field_index_crud_and_alias_resolution(embeddings):
    import pytest

    cat = CollectionCatalog()
    cat.register("docs_v1", embeddings)
    cat.create_alias("docs", "docs_v1")
    # create through the alias, read back through the collection
    cat.create_field_index("docs", "label", "keyword", is_tenant=True)
    cat.create_field_index("docs_v1", "vec_id", "integer", is_principal=True)
    idx = cat.list_field_indexes("docs")
    assert set(idx) == {"label", "vec_id"}
    assert idx["label"].is_tenant and idx["vec_id"].is_principal
    # replace is idempotent rebuild
    cat.create_field_index("docs", "label", "uuid")
    assert cat.list_field_indexes("docs_v1")["label"].schema_type == "uuid"
    cat.delete_field_index("docs", "vec_id")
    assert set(cat.list_field_indexes("docs")) == {"label"}
    with pytest.raises(KeyError):
        cat.delete_field_index("docs", "vec_id")
    with pytest.raises(KeyError):
        cat.create_field_index("nope", "x")
    # dropping the collection drops its indexes
    cat.drop("docs_v1")
    cat.register("docs_v1", embeddings)
    assert cat.list_field_indexes("docs_v1") == {}


def test_field_index_param_validation():
    import pytest

    from qdrant_spark.catalog import FieldIndex

    with pytest.raises(ValueError):
        FieldIndex("f", "nope")
    with pytest.raises(ValueError):
        FieldIndex("f", "integer", is_tenant=True)  # tenant: keyword/uuid only
    with pytest.raises(ValueError):
        FieldIndex("f", "keyword", is_principal=True)  # principal: int/float/dt
    assert FieldIndex("f", "uuid", is_tenant=True).is_tenant
    assert FieldIndex("f", "datetime", is_principal=True).is_principal


def test_layout_hints_and_stats_single_scan(embeddings):
    cat = CollectionCatalog()
    cat.register("emb", embeddings)
    cat.create_field_index("emb", "label", "keyword", is_tenant=True)
    cat.create_field_index("emb", "vec_id", "integer", is_principal=True)
    assert cat.layout_hints("emb") == {"partition_by": ["label"],
                                       "sort_by": ["vec_id"]}
    stats = cat.index_stats("emb")
    rows = {r["field"]: r for r in stats.collect()}
    n = embeddings.count()
    assert rows["label"]["n"] == n and rows["label"]["nulls"] == 0
    assert rows["label"]["schema_type"] == "keyword"
    assert rows["label"]["min_str"] is not None
    assert rows["vec_id"]["min_num"] == 0.0
    assert rows["vec_id"]["max_num"] == float(n - 1)
    assert rows["vec_id"]["n_distinct"] == n
    # one scan: a single agg node, no union of per-field scans
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


def test_tenant_layout_partition_prunes(embeddings, tmp_path):
    """Writing with layout_hints.partition_by turns a tenant filter into
    directory-level partition pruning — the point of is_tenant."""
    from pyspark.sql import functions as F

    cat = CollectionCatalog()
    cat.register("emb", embeddings)
    cat.create_field_index("emb", "label", "keyword", is_tenant=True)
    hints = cat.layout_hints("emb")
    path = str(tmp_path / "tenant_tbl")
    embeddings.write.partitionBy(*hints["partition_by"]).parquet(path)
    spark = embeddings.sparkSession
    got = spark.read.parquet(path).filter(F.col("label") == 1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "label" in plan.split("PartitionFilters", 1)[1][:200]
    assert got.count() == embeddings.filter(F.col("label") == 1).count()


class TestStrictMode:
    def _cfg(self, **kw):
        from qdrant_spark.catalog import StrictModeConfig
        return StrictModeConfig(**kw)

    def test_disabled_is_noop(self):
        from qdrant_spark.catalog import check_strict_mode
        check_strict_mode({"limit": 10**9}, self._cfg(enabled=False,
                                                     max_query_limit=1))

    def test_limit_cap_applies_to_prefetch_tree(self):
        import pytest as _pt

        from qdrant_spark.catalog import StrictModeError, check_strict_mode
        cfg = self._cfg(max_query_limit=100)
        check_strict_mode({"limit": 100}, cfg)
        with _pt.raises(StrictModeError):
            check_strict_mode({"limit": 101}, cfg)
        with _pt.raises(StrictModeError):
            check_strict_mode(
                {"limit": 10, "prefetch": [{"limit": 500}]}, cfg)

    def test_filter_condition_counts_and_sizes(self):
        import pytest as _pt

        from qdrant_spark.catalog import StrictModeError, check_strict_mode
        flt = {"must": [{"key": "a", "match": {"value": 1}},
                        {"must_not": [{"key": "b", "match": {"any": [1, 2, 3]}}]}]}
        check_strict_mode({"filter": flt}, self._cfg(filter_max_conditions=2))
        with _pt.raises(StrictModeError):
            check_strict_mode({"filter": flt},
                              self._cfg(filter_max_conditions=1))
        with _pt.raises(StrictModeError):
            check_strict_mode({"filter": flt},
                              self._cfg(condition_max_size=2))

    def test_unindexed_filtering(self):
        import pytest as _pt

        from qdrant_spark.catalog import StrictModeError, check_strict_mode
        flt = {"must": [{"key": "city", "match": {"value": "x"}},
                        {"nested": {"key": "items",
                                    "filter": {"must": [{"key": "qty",
                                                         "range": {"gt": 1}}]}}}]}
        cfg = self._cfg(unindexed_filtering_retrieve=False)
        check_strict_mode({"filter": flt}, cfg,
                          indexed_fields={"city", "items", "qty"})
        with _pt.raises(StrictModeError) as e:
            check_strict_mode({"filter": flt}, cfg, indexed_fields={"city"})
        assert "unindexed" in str(e.value)

    def test_batch_and_points_caps(self):
        import pytest as _pt

        from qdrant_spark.catalog import StrictModeError, check_strict_mode
        with _pt.raises(StrictModeError):
            check_strict_mode({}, self._cfg(search_max_batchsize=2),
                              batch=[{}, {}, {}])
        with _pt.raises(StrictModeError):
            check_strict_mode({}, self._cfg(upsert_max_batchsize=1),
                              batch=[{}, {}], is_update=True)
        with _pt.raises(StrictModeError):
            check_strict_mode({}, self._cfg(max_points_count=10), n_points=11)
        check_strict_mode({}, self._cfg(max_points_count=10), n_points=10)

    def test_exact_and_oversampling(self):
        import pytest as _pt

        from qdrant_spark.catalog import StrictModeError, check_strict_mode
        with _pt.raises(StrictModeError):
            check_strict_mode({"exact": True},
                              self._cfg(search_allow_exact=False))
        req = {"params": {"quantization": {"oversampling": 8.0}}}
        with _pt.raises(StrictModeError):
            check_strict_mode(req, self._cfg(search_max_oversampling=4.0))
        check_strict_mode(req, self._cfg(search_max_oversampling=8.0))

    def test_null_quantization_params_ignored(self):
        from qdrant_spark.catalog import check_strict_mode

        # explicit params: {"quantization": null} must be ignored, not
        # AttributeError
        check_strict_mode({"params": {"quantization": None}},
                          self._cfg(search_max_oversampling=4.0))

    def test_max_payload_index_count_enforced(self, spark):
        import pytest as _pt

        from qdrant_spark.catalog import (
            CollectionCatalog, StrictModeError,
        )

        cat = CollectionCatalog()
        df = spark.range(1)
        cat.register("c", df)
        cat.set_strict_mode("c", self._cfg(max_payload_index_count=2))
        cat.create_field_index("c", "a")
        cat.create_field_index("c", "b")
        with _pt.raises(StrictModeError):
            cat.create_field_index("c", "d")
        # rebuilding an EXISTING index is idempotent, never capped
        cat.create_field_index("c", "a", "integer")
        # dropping one frees a slot
        cat.delete_field_index("c", "b")
        cat.create_field_index("c", "d")
        # unknown collection still rejected before the strict check
        with _pt.raises(KeyError):
            cat.set_strict_mode("nope", self._cfg())

    def test_every_config_field_enforced_or_documented(self):
        """Every StrictModeConfig field is either exercised by a test in
        this class or explicitly listed as node-operational (accepted for
        config parity, enforced by the cluster manager, not the engine)."""
        import dataclasses

        from qdrant_spark.catalog import StrictModeConfig

        enforced = {
            "enabled", "max_query_limit", "unindexed_filtering_retrieve",
            "unindexed_filtering_update", "search_allow_exact",
            "search_max_oversampling", "search_max_batchsize",
            "upsert_max_batchsize", "max_points_count",
            "filter_max_conditions", "condition_max_size",
            "max_payload_index_count",
            # exercised in TestStrictModeExtended
            "sparse_config", "multivector_config", "search_max_hnsw_ef",
            "max_collection_vector_size_bytes",
            "max_collection_payload_size_bytes",
        }
        node_operational = {"max_timeout", "read_rate_limit",
                            "write_rate_limit"}
        fields = {f.name for f in dataclasses.fields(StrictModeConfig)}
        assert fields == enforced | node_operational


class TestStrictModeExtended:
    def _cfg(self, **kw):
        from qdrant_spark.catalog import StrictModeConfig
        return StrictModeConfig(**kw)

    def _check(self, req, cfg, **kw):
        from qdrant_spark.catalog import check_strict_mode
        check_strict_mode(req, cfg, **kw)

    def _fails(self, req, cfg, **kw):
        import pytest
        from qdrant_spark.catalog import StrictModeError
        with pytest.raises(StrictModeError):
            self._check(req, cfg, **kw)

    def test_search_breadth_cap_both_knobs(self):
        cfg = self._cfg(search_max_hnsw_ef=64)
        self._check({"params": {"nprobe": 64}}, cfg)
        self._fails({"params": {"nprobe": 65}}, cfg)
        self._fails({"params": {"hnsw_ef": 100}}, cfg)
        self._check({"params": {}}, cfg)

    def test_sparse_length_cap(self):
        cfg = self._cfg(sparse_config={"txt": 3})
        ok = {"using": "txt",
              "query": {"nearest": {"indices": [1, 2], "values": [1.0, 2.0]}}}
        self._check(ok, cfg)
        bad = {"using": "txt",
               "query": {"nearest": {"indices": [1, 2, 3, 4],
                                     "values": [1.0] * 4}}}
        self._fails(bad, cfg)
        # other vector names uncapped
        self._check(dict(bad, using="other"), cfg)

    def test_multivector_count_cap(self):
        cfg = self._cfg(multivector_config={"colbert": 2})
        self._check({"using": "colbert",
                     "query": {"nearest": [[1.0, 0.0], [0.0, 1.0]]}}, cfg)
        self._fails({"using": "colbert",
                     "query": {"nearest": [[1.0], [2.0], [3.0]]}}, cfg)

    def test_upsert_batch_vector_caps(self):
        cfg = self._cfg(sparse_config={"sp": 2},
                        multivector_config={"mv": 2})
        pts_ok = [{"id": 1, "vectors": {
            "sp": {"indices": [5], "values": [0.5]},
            "mv": [[1.0], [2.0]]}}]
        self._check({}, cfg, is_update=True, batch=pts_ok)
        pts_bad = [{"id": 2, "vectors": {
            "sp": {"indices": [1, 2, 3], "values": [1.0] * 3}}}]
        self._fails({}, cfg, is_update=True, batch=pts_bad)
        pts_bad2 = [{"id": 3, "vectors": {"mv": [[1.0], [2.0], [3.0]]}}]
        self._fails({}, cfg, is_update=True, batch=pts_bad2)

    def test_collection_size_caps(self):
        cfg = self._cfg(max_collection_vector_size_bytes=1000,
                        max_collection_payload_size_bytes=500)
        self._check({}, cfg, vector_size_bytes=1000, payload_size_bytes=500)
        self._fails({}, cfg, vector_size_bytes=1001)
        self._fails({}, cfg, payload_size_bytes=501)
        # sizes unknown -> no enforcement (caller opted out)
        self._check({}, cfg)
