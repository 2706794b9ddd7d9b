"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 (+ §2.10 LLM-pipeline ops)
to a ``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives
the DuckDB twin for each SQL-expressible query. The catalog itself
lives in ``pim_etl_spark.catalog`` and is populated by the operator
modules at import time.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Scan → filter → broadcast join → hash agg → window dedup in one
    plan (SURVEY §7.2 minimum end-to-end slice).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pim_etl_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")

    revenue = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name", "o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    w = Window.partitionBy("s_name").orderBy(F.col("revenue").desc(), F.col("o_orderstatus").asc())
    return (
        revenue.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_name", "o_orderstatus", "revenue", "n_items")
        .orderBy("s_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    from pim_etl_spark.catalog import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query; non-SQL ops
    (engine-specific hashing, Python-stub decode) are intentionally
    absent and get the driver's rows-only check."""
    from pim_etl_spark.catalog import get_oracles

    return get_oracles()
