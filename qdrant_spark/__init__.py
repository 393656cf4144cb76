"""qdrant_spark — a PySpark-native batch analytics engine with the query
capabilities of qdrant/qdrant (vector similarity search, payload filter
algebra, hybrid fusion, recommendation scoring, facets, group-by, formula
rescoring, MMR, dedup suites, IVF ANN, mutations, streaming ingestion).

Reference semantics: qdrant v1.19.0 (Apache-2.0). This is NOT a port of the
Rust engine — every operator is re-expressed as Spark DataFrame / SQL plans
so Catalyst + Tungsten pick the physical strategy. See SURVEY.md and
COVERAGE.md.
"""

from qdrant_spark.query import QueryPlanner, universal_query
from qdrant_spark.schema import CollectionConfig, PayloadField, VectorConfig
from qdrant_spark.session import get_spark

__all__ = [
    "CollectionConfig",
    "PayloadField",
    "QueryPlanner",
    "VectorConfig",
    "get_spark",
    "universal_query",
]
__version__ = "0.2.0"
