"""String-manipulation, interval-arithmetic, and array-flattening
coverage (SURVEY §2.6 long tail): the remaining scalar surface a
catalog engine needs for feed normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table


@query(
    "string_pad_trim_ops",
    oracle="""
    SELECT lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           rtrim(ltrim('  ' || p_name || '  '))     AS trimmed_name,
           substr(p_brand, 7)                        AS brand_num,
           reverse(p_type)                           AS type_rev,
           CAST(length(p_name) AS INT)               AS name_len
    FROM part ORDER BY padded_key
    """,
)
def string_pad_trim_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-padded key formatting (the catalog-code normalization
    idiom), whitespace trimming, substring extraction, reversal."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.rtrim(F.ltrim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  ")))).alias("trimmed_name"),
        F.substring(F.col("p_brand"), 7, 100).alias("brand_num"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.length("p_name").alias("name_len"),
    ).orderBy("padded_key")


@query(
    "interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 90 DAY                   AS due_date,
           CAST(o_orderdate - INTERVAL 1 MONTH AS TIMESTAMP) AS prior_month,
           -- month-granularity date_trunc yields DATE in DuckDB
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2000-03-01'
    ORDER BY o_orderkey
    """,
)
def interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: payment-due / validity-window date math
    (the valid_until / retention-cutoff idioms, SURVEY J6/S14)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("2000-03-01").cast("timestamp_ntz"))
    )
    return orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 MONTH")).alias("prior_month"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("string").alias("month_end"),
    ).orderBy("o_orderkey")


@query(
    "array_flatten_sorted",
    oracle="""
    SELECT l_orderkey,
           -- serialized with fixed %.2f rendering: the driver can't
           -- hash raw list cells, and float→string repr must agree
           array_to_string(
             list_transform(list_sort(flatten(list([l_quantity, l_discount]))),
                            x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS all_values,
           CAST(len(flatten(list([l_quantity, l_discount]))) AS BIGINT) AS n_values
    FROM lineitem
    GROUP BY l_orderkey ORDER BY l_orderkey
    """,
)
def array_flatten_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array flatten (array-of-arrays → array) with a
    deterministic sort + fixed-format string serialization for
    hashability (SURVEY §7.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = F.collect_list(F.array(F.col("l_quantity"), F.col("l_discount")))
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.flatten(nested)),
                    # decimal-cast rendering: same "24.00" text as
                    # printf('%.2f') but ~2x cheaper than format_string
                    lambda x: x.cast("decimal(18,2)").cast("string"),
                ),
                ",",
            ).alias("all_values"),
            F.size(F.flatten(nested)).cast("bigint").alias("n_values"),
        )
        .orderBy("l_orderkey")
    )
