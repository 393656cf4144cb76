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
