"""Structured Streaming over the events table shape.

The reference is pure batch (SURVEY §2.9 — its buffered page cursor is
demand paging, not streaming), so these operators are the engine's forward
extension: the same aggregations the batch registry exposes
(``tumbling_hourly``, ``sessionize``) expressed as streaming plans with
watermarked event time, plus a custom stateful operator via
``applyInPandasWithState``.

At production scale the source is Kafka/files-on-object-store; the local
smoke path reads the parquet fixture as a file stream and drives it to
completion with ``processAllAvailable`` against a memory sink — identical
logical plan, bounded input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_dir)
    )


def windowed_type_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data ≤ 10 min)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (the streaming form of the batch lag+cumsum
    sessionize operator in the query registry)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


_STATE_SCHEMA = "total double, n long"
_OUT_SCHEMA = "user_id long, running_total double, n long"


def _running_totals(
    key, pdfs, state: GroupState
):
    """Custom stateful op: running per-user value totals across batches."""
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "running_total": [round(total, 2)], "n": [n]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """applyInPandasWithState: arbitrary stateful aggregation (the custom
    stateful-operator path SURVEY §2.9 notes Spark provides for free)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a bounded stream to completion against a memory sink and
    return the materialized result (local smoke-test harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")

def dedup_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` evicts seen-key state once the key's
    event time falls behind the watermark — the only dedup shape that
    survives an unbounded 100 TB/day ingest (plain ``dropDuplicates`` on a
    stream keeps every key forever). Batch analog: the ``dedup_exact``
    registry query; at-least-once sources (Kafka, file redelivery) make
    this the standard first stage of a training-data ingest."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
