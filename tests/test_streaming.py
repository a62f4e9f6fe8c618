"""Streaming smoke tests: windowed agg + session windows + custom stateful
op driven to completion on the bounded events fixture; results must match
the equivalent batch aggregation."""

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.streaming.events import (
    read_events_stream,
    run_to_completion,
    running_user_totals,
    session_counts,
    windowed_type_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # re-lay the fixture as a directory the file-stream source can watch
    d = tmp_path_factory.mktemp("events_stream")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    stream = windowed_type_counts(read_events_stream(spark, events_dir))
    got = run_to_completion(stream, "win_counts")
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b


def test_session_counts_total_events(spark, sf_dir, tmp_path):
    # single file → single trigger → no cross-trigger late data (the
    # multi-file variant correctly DROPS late events past the watermark,
    # which is watermark semantics, not a bug — asserted separately below)
    d = tmp_path / "single"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(str(d))
    stream = session_counts(read_events_stream(spark, str(d)))
    got = run_to_completion(stream, "sess_counts")
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()


def test_watermark_drops_late_events(spark, sf_dir, events_dir):
    # unordered multi-file feed: events arriving > 10 min behind the
    # watermark must be dropped — strictly fewer than the batch total
    stream = session_counts(read_events_stream(spark, events_dir))
    got = run_to_completion(stream, "sess_counts_late")
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total < spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_stateful_running_totals(spark, sf_dir, events_dir):
    stream = running_user_totals(read_events_stream(spark, events_dir))
    got = run_to_completion(stream, "run_totals", output_mode="update")
    # state accumulates across triggers: the LAST update per user must equal
    # the batch total
    import pandas as pd

    pdf = got.toPandas()
    last = pdf.groupby("user_id").last()
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("t"), F.count("*").alias("n"))
        .collect()
    )
    for r in batch:
        assert last.loc[r["user_id"]]["n"] == r["n"]
        assert abs(last.loc[r["user_id"]]["running_total"] - r["t"]) < 0.02


def test_dedup_stream_bounded_state(spark, sf_dir, tmp_path):
    """Duplicated input files (at-least-once redelivery) dedup to the
    distinct event set; state is watermark-bounded by construction."""
    from entity_linking_spark.streaming.events import dedup_stream

    d = tmp_path / "dup_stream"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    ev.write.mode("overwrite").parquet(str(d))
    # redeliver the same events as additional files
    ev.write.mode("append").parquet(str(d))
    stream = dedup_stream(read_events_stream(spark, str(d)))
    got = run_to_completion(stream, "dedup_stream_t", output_mode="append")
    n_distinct = ev.select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == n_distinct
    assert got.count() == n_distinct
