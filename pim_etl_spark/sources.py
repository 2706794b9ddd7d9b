"""Table loaders for the synthetic test warehouse.

Reference parity: the reference's extract layer reads supplier feeds
into dict streams (``etl/base.py:59-80``); here every source is a
DataFrame scan so Catalyst can push filters/projections into the
parquet reader (check ``PushedFilters`` / ``ReadSchema`` in .explain).

The ``events`` table is written with nanosecond parquet timestamps,
which Spark's vectorized reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong`` is set; we set it defensively
at load time (works on a fresh session too) and normalize ``ts`` to
``timestamp_ntz`` at microsecond precision — the same truncation DuckDB
applies when casting TIMESTAMP_NS → TIMESTAMP, keeping oracle parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Defensive runtime confs: the driver harness builds its own
    SparkSession, so the session factory may not have run."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf in this build → session factory already set it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one warehouse table; normalizes the events timestamp."""
    if name == "events":
        _ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → microsecond timestamp_ntz (truncating, like DuckDB's
        # TIMESTAMP_NS::TIMESTAMP cast), with session tz pinned to UTC
        # the TimestampType→NTZ cast is deterministic.
        # integer division — double division loses µs precision at
        # 1e18-scale nanos (the mantissa can't hold 19 digits)
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so spark.sql can be used."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
