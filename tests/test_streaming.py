"""Structured Streaming surface tests (SURVEY §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pim_etl_spark.streaming.queries import (
    hourly_windowed_counts,
    incremental_upsert_stream,
    run_stream_to_memory,
    stream_events,
)

ROW_SCHEMA = StructType(
    [
        StructField("product_id", StringType(), True),
        StructField("status", StringType(), True),
        StructField("version", LongType(), True),
    ]
)


def test_stream_matches_batch(spark, sf_dir):
    """Stream/batch consistency: the windowed streaming agg equals the
    equivalent batch aggregation."""
    from pim_etl_spark.sources import load_table

    streamed = run_stream_to_memory(spark, hourly_windowed_counts(stream_events(spark, sf_dir)))
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    s = {(str(r.window_start), r.event_type): (r.n_events, r.total_value) for r in streamed.collect()}
    b = {(str(r.window_start), r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    assert s == b


def test_incremental_upsert_stream(spark, tmp_path):
    """Micro-batch incremental sync: second feed drop overrides rows on
    the key (ReplaceOne semantics through foreachBatch)."""
    feed = tmp_path / "feed"
    gold = str(tmp_path / "gold.parquet")
    feed.mkdir()

    batch1 = spark.createDataFrame(
        [("p1", "active", 1), ("p2", "active", 1)], ROW_SCHEMA
    )
    batch1.coalesce(1).write.mode("append").parquet(str(feed))
    incremental_upsert_stream(spark, str(feed), gold, keys=["product_id"], order_col="version", schema=ROW_SCHEMA)
    got = {r.product_id: r.status for r in spark.read.parquet(gold).collect()}
    assert got == {"p1": "active", "p2": "active"}

    batch2 = spark.createDataFrame(
        [("p2", "discontinued", 2), ("p3", "active", 1)], ROW_SCHEMA
    )
    batch2.coalesce(1).write.mode("append").parquet(str(feed))
    incremental_upsert_stream(spark, str(feed), gold, keys=["product_id"], order_col="version", schema=ROW_SCHEMA)
    got = {r.product_id: (r.status, r.version) for r in spark.read.parquet(gold).collect()}
    assert got == {
        "p1": ("active", 1),
        "p2": ("discontinued", 2),
        "p3": ("active", 1),
    }
