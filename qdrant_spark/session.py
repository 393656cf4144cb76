"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the configs
below are chosen so the same logical plans survive a 1000-executor cluster:
AQE for runtime re-planning (skew joins, partition coalescing), Arrow for
every Python<->JVM boundary, and shuffle partitions sized to the local core
count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def local_df(spark: SparkSession, data, schema):
    """Driver-local rows → DataFrame through the Arrow LOCAL RELATION
    path instead of a pickled python RDD.

    ``spark.createDataFrame(list, schema)`` parallelizes the rows into
    ``defaultParallelism`` python partitions, so every later
    ``collect()`` of the (tiny) frame runs a full job of python-worker
    tasks — measured 0.8 s for a 64-row query frame on local[32], paid
    INSIDE every timed batch operator that collects its query set. The
    pandas/Arrow path (optimization guide §6 "Arrow for driver
    transfers") plans the same rows as a LocalRelation: collect() is
    driver-only (~7 ms), joins against it broadcast without a job, and
    the values are identical (the Arrow cast to the explicit schema is
    the same double→float rounding the JVM path applies). Falls back to
    plain ``createDataFrame`` for shapes the Arrow conversion rejects
    (nested maps with mixed key types, exotic objects)."""
    try:
        import math

        import pandas as pd
        from pyspark.sql import types as T

        st = (T._parse_datatype_string(schema)
              if isinstance(schema, str) else schema)
        rows = ([tuple(r) for r in data]
                if not isinstance(data, pd.DataFrame) else None)
        if rows is not None:
            # Arrow's from_pandas turns float NaN into NULL; the JVM
            # path keeps it as NaN. Preserve the caller's semantics by
            # falling back when any scalar/array element is NaN.
            def _has_nan(v) -> bool:
                if isinstance(v, float):
                    return math.isnan(v)
                if isinstance(v, (list, tuple)):
                    return any(_has_nan(x) for x in v)
                if isinstance(v, dict):
                    # MapType cells (e.g. replayed one-shot schemas):
                    # a NaN value inside the map must also fall back
                    return any(_has_nan(x)
                               for kv in v.items() for x in kv)
                return False

            if any(_has_nan(v) for r in rows for v in r):
                return spark.createDataFrame(data, schema)
        pdf = pd.DataFrame(rows if rows is not None else data,
                           columns=st.fieldNames(), dtype=object)
        df = spark.createDataFrame(pdf, schema=st)
        if not df.isLocal():  # threshold exceeded / arrow off: no win
            return spark.createDataFrame(data, schema)
        return df
    except Exception:
        return spark.createDataFrame(data, schema)


def get_spark(
    app_name: str = "qdrant_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = str(shuffle_partitions or cpus)
    # one BLAS thread per python worker: tasks already use every core, so
    # nested BLAS threading (32 workers x N threads) just thrashes — ~6x
    # slowdown measured on the block-matmul KNN path
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # testdata events.parquet uses TIMESTAMP(NANOS); read as epoch-nanos long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
