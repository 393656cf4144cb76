"""Streaming analytics over event streams: watermarked windowed
aggregation, streaming deduplication, and stateful last-write-wins.

The reference has no streaming QUERY semantics (SURVEY §2.8) — its update
pipeline is a WAL drained by update workers (update_handler.rs:88-191),
where the stream-shaped problems are (a) aggregating an unbounded event
feed, (b) dropping redundant deliveries, (c) resolving each point to its
latest version. These are exactly Structured Streaming's three canonical
stateful shapes, so each helper here is the idiomatic Spark mapping:

- :func:`windowed_event_stats` — ``withWatermark`` + ``window()`` groupBy.
  State is bounded by the watermark horizon; partial aggregation happens
  map-side before the keyed shuffle, so at 100 TB/day the shuffle carries
  one row per (window, group), not per event.
- :func:`dedup_stream` — ``dropDuplicatesWithinWatermark``; the state
  store keeps one key per id inside the horizon, evicted by watermark.
- :func:`latest_version_stream` — ``applyInPandasWithState`` keeping the
  winning (version, payload) per point id: the WAL-replay analogue
  (last-write-wins by version, as mutate.upsert_points does in batch).

Every helper also accepts a BATCH DataFrame and then compiles to the
equivalent batch plan (watermarks are no-ops in batch), which is what the
tests use to pin stream-vs-batch equivalence.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; testdata timestamps arrive either as
    nanosecond longs (``spark.sql.legacy.parquet.nanosAsLong``) or as
    TIMESTAMP_NTZ (parquet micros). Normalize both to TIMESTAMP in place,
    truncating nanos to micros (Spark timestamp precision)."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time window aggregation:
    count + sum/avg of ``value_col`` per (window, *group_cols*).

    Streaming input: the watermark bounds state and admits late events up
    to the horizon. Batch input: same plan minus the watermark — used by
    the tests to assert the streaming result equals the batch result.
    """
    df = _with_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs += [
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        ]
    out = df.groupBy(win.alias("__w"), *[F.col(c) for c in group_cols]).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[F.col(c) for c in group_cols],
        *[F.col(a) for a in ["n_events"] +
          (["sum_value", "avg_value"] if value_col is not None else [])],
    )


def dedup_stream(
    events: DataFrame,
    *,
    id_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-delivered events by id within the watermark horizon.

    Streaming: ``dropDuplicatesWithinWatermark`` — state holds one entry
    per id seen inside the horizon and the watermark evicts it, so state
    is bounded no matter how long the stream runs (exact dedup over an
    unbounded stream is impossible; horizon-bounded is the scalable
    contract, and matches at-least-once delivery windows). Batch: plain
    ``dropDuplicates`` over the id columns."""
    df = _with_event_time(events, ts_col)
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(list(id_cols))
    return df.dropDuplicates(list(id_cols))


_LATEST_STATE_SCHEMA = "version long"


def latest_version_stream(
    updates: DataFrame,
    *,
    id_col: str = "id",
    version_col: str = "version",
    payload_cols: Sequence[str] = (),
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Stateful last-write-wins per point id over an update stream — the
    streaming twin of ``mutate.upsert_points``'s versioned stale-skip
    (reference WAL replay: updates with version <= stored are dropped,
    update_handler.rs).

    Emits, per micro-batch and per id that received updates, the winning
    row ``(id, version, *payload_cols)`` — only when the batch actually
    advanced the stored version (stale redeliveries emit nothing). State
    per key is ONE long (the high-water version), so state size is
    O(distinct ids), independent of stream length.

    Batch input: equivalent argmax-by-version per id, computed with one
    aggregation."""
    out_fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField(version_col, T.LongType()),
    ]
    payload_cols = list(payload_cols)
    if not updates.isStreaming:
        w_cols = [F.struct(F.col(version_col), *[F.col(c) for c in payload_cols])
                  .alias("__s")]
        agg = updates.groupBy(id_col).agg(F.max(w_cols[0]).alias("__m"))
        return agg.select(
            F.col(id_col),
            F.col(f"__m.{version_col}").alias(version_col),
            *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
        )

    import pandas as pd  # noqa: F401  (executor-side)

    for c in payload_cols:
        out_fields.append(T.StructField(c, updates.schema[c].dataType))
    out_schema = T.StructType(out_fields)

    def _resolve(key, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        best = state.get[0] if state.exists else None
        winner = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            i = pdf[version_col].idxmax()
            if best is None or pdf[version_col][i] > best:
                best = int(pdf[version_col][i])
                winner = pdf.loc[[i], [version_col] + payload_cols]
        if winner is not None:
            state.update((best,))
            winner = winner.copy()
            winner.insert(0, id_col, key[0])
            yield winner

    return updates.groupBy(id_col).applyInPandasWithState(
        _resolve,
        outputStructType=out_schema,
        stateStructType=_LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
