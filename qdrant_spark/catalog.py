"""Collection catalog: name -> DataFrame registry with alias operations.

Reference: collection metadata ops (CreateCollection/DeleteCollection and
the alias family CreateAlias/DeleteAlias/RenameAlias —
lib/storage/src/content_manager/collection_meta_ops.rs:45-81, served by
``POST /collections/aliases``, src/actix/api/collections_api.rs). Aliases
give zero-downtime switchover: clients query ``prod``, the operator builds
``docs_v2``, then one alias swap repoints ``prod`` — the same pattern as a
view repoint in a Spark catalog.

Spark-first shape: this is deliberately a THIN, driver-side name map — the
data plane stays DataFrames/parquet. ``register`` accepts a DataFrame or a
callable returning one (lazy mount of a PointsTable.read). The catalog is
Mapping-like, so it plugs directly into ``QueryPlanner(collections=...)``
and ``lookup_from`` resolution.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

from pyspark.sql import DataFrame


class CollectionCatalog(Mapping):
    """Collections and aliases share one namespace (as in the reference:
    alias resolution falls back to collection name, and an alias may not
    shadow an existing collection)."""

    def __init__(self) -> None:
        self._collections: dict[str, DataFrame | Callable[[], DataFrame]] = {}
        self._aliases: dict[str, str] = {}  # alias -> collection name

    # -- collection ops ----------------------------------------------------

    def register(self, name: str,
                 df: DataFrame | Callable[[], DataFrame]) -> None:
        if name in self._aliases:
            raise ValueError(f"name {name!r} is already an alias")
        self._collections[name] = df

    def drop(self, name: str) -> None:
        """Drop a collection and any aliases pointing at it (the reference
        deletes dangling aliases with their collection)."""
        self._collections.pop(name, None)
        for a in [a for a, c in self._aliases.items() if c == name]:
            del self._aliases[a]

    def list_collections(self) -> list[str]:
        return sorted(self._collections)

    # -- alias ops (collection_meta_ops.rs:45-81) --------------------------

    def create_alias(self, alias: str, collection: str) -> None:
        """Create or REPOINT an alias — the repoint is the atomic-switchover
        primitive. The target must exist; an alias may not take a
        collection's name; alias-to-alias chains are rejected."""
        if collection not in self._collections:
            if collection in self._aliases:
                raise ValueError("alias must point at a collection, not an alias")
            raise KeyError(f"unknown collection {collection!r}")
        if alias in self._collections:
            raise ValueError(f"{alias!r} is an existing collection name")
        self._aliases[alias] = collection

    def delete_alias(self, alias: str) -> None:
        if alias not in self._aliases:
            raise KeyError(f"unknown alias {alias!r}")
        del self._aliases[alias]

    def rename_alias(self, old: str, new: str) -> None:
        if old not in self._aliases:
            raise KeyError(f"unknown alias {old!r}")
        if new in self._collections:
            raise ValueError(f"{new!r} is an existing collection name")
        self._aliases[new] = self._aliases.pop(old)

    def list_aliases(self, collection: str | None = None) -> dict[str, str]:
        if collection is None:
            return dict(self._aliases)
        return {a: c for a, c in self._aliases.items() if c == collection}

    # -- resolution / Mapping ----------------------------------------------

    def resolve(self, name: str) -> DataFrame:
        target = self._aliases.get(name, name)
        try:
            df = self._collections[target]
        except KeyError:
            raise KeyError(f"unknown collection or alias {name!r}") from None
        return df() if callable(df) else df

    def __getitem__(self, name: str) -> DataFrame:
        return self.resolve(name)

    def __contains__(self, name: object) -> bool:
        return name in self._collections or name in self._aliases

    def __iter__(self) -> Iterator[str]:
        yield from self._collections
        yield from self._aliases

    def __len__(self) -> int:
        return len(self._collections) + len(self._aliases)
