"""Stateful streaming operator tests: keep-latest-per-key state across
micro-batches and native session windows vs the batch oracle."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pim_etl_spark.streaming.queries import run_stream_to_memory, stream_events
from pim_etl_spark.streaming.stateful import latest_per_key_stream, sessionized_events_stream

STOCK_SCHEMA = StructType(
    [
        StructField("sku", StringType(), True),
        StructField("qty", LongType(), True),
        StructField("modified_at", TimestampType(), True),
    ]
)


def _t(day, hour=0):
    return dt.datetime(2025, 3, day, hour)


def test_latest_per_key_state_across_batches(spark, tmp_path):
    feed = tmp_path / "stock"
    feed.mkdir()
    b1 = spark.createDataFrame(
        [("A", 100, _t(1)), ("A", 120, _t(2)), ("B", 50, _t(1))], STOCK_SCHEMA
    )
    b1.coalesce(1).write.mode("append").parquet(str(feed))
    b2 = spark.createDataFrame(
        [("A", 90, _t(1, 12)), ("B", 70, _t(3)), ("C", 5, _t(1))], STOCK_SCHEMA
    )
    b2.coalesce(1).write.mode("append").parquet(str(feed))

    stream = spark.readStream.schema(STOCK_SCHEMA).parquet(str(feed))
    out = run_stream_to_memory(spark, latest_per_key_stream(stream), mode="update")
    # update-mode memory sink keeps every emission; last row per key wins
    rows = sorted(out.collect(), key=lambda r: (r.sku, r.modified_at))
    latest = {}
    for r in rows:
        latest[r.sku] = (r.qty, r.modified_at)
    # A: the 090@day1-12h row is OLDER than 120@day2 → must NOT override
    assert latest["A"] == (120, _t(2))
    assert latest["B"] == (70, _t(3))
    assert latest["C"] == (5, _t(1))


def test_session_window_stream_matches_batch_sessions(spark, sf_dir):
    """Every (complete) streamed session must agree with the batch
    gaps-and-islands computation."""
    from pim_etl_spark.catalog import get_queries

    streamed = run_stream_to_memory(
        spark,
        sessionized_events_stream(stream_events(spark, sf_dir), watermark="0 seconds"),
        mode="append",
    ).collect()
    assert streamed, "no sessions emitted"
    batch = get_queries()["sessionize_events"](spark, sf_dir).collect()
    batch_by_user = {}
    for r in batch:
        batch_by_user.setdefault(r.user_id, []).append((r.n_events, r.session_value))
    # streamed sessions (except any cut by the final watermark) appear
    # in the batch result with identical counts and value sums
    matched = 0
    for r in streamed:
        if (r.n_events, r.session_value) in batch_by_user.get(r.user_id, []):
            matched += 1
    assert matched >= len(streamed) * 0.95
