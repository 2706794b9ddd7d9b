"""Scalar-function surface (SURVEY §2.6 F-series) as oracle-checked
queries: feed-parsing helpers applied to deterministically synthesized
dirty strings so both engines parse the identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_etl_spark import functions as pf
from pim_etl_spark.catalog import query
from pim_etl_spark.tuning import sorted_output
from pim_etl_spark.sources import load_table


@query(
    "eu_decimal_parse",
    oracle="""
    -- synthesize the EU feed encoding ("1234,56") then parse it back
    SELECT l_returnflag,
           round(sum(CAST(replace(replace(printf('%.2f', l_extendedprice), '.', ','), ',', '.') AS DOUBLE)), 2) AS parsed_sum,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def eu_decimal_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EU decimal-comma parse round-trip (SURVEY F1,
    etl/transformers/midocean_transformer.py:491-502): format price as
    the feed's "1234,56" string, parse with the engine helper, re-agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    eu_string = F.replace(F.format_string("%.2f", F.col("l_extendedprice")), F.lit("."), F.lit(","))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(pf.parse_eu_decimal(eu_string)), 2).alias("parsed_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        .transform(sorted_output, "l_returnflag")
    )


@query(
    "thousands_int_parse",
    oracle="""
    -- synthesize "1.234" style thousands-dotted ints from o_orderkey
    SELECT o_orderstatus,
           -- outer CAST: DuckDB sum(BIGINT) is HUGEINT, Spark's is BIGINT
           CAST(sum(CAST(replace(replace(format('{:,}', o_orderkey), ',', '.'), '.', '') AS BIGINT)) AS BIGINT) AS parsed_sum,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def thousands_int_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thousands-separator int parse (SURVEY F2,
    etl/transformers/midocean_transformer.py:504-515): "1.000" → 1000."""
    orders = load_table(spark, sf_dir, "orders")
    dotted = F.replace(F.format_number(F.col("o_orderkey"), 0), F.lit(","), F.lit("."))
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.sum(pf.parse_thousands_int(dotted)).alias("parsed_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "money_symbol_parse",
    oracle="""
    SELECT c_mktsegment AS segment,
           round(sum(CAST(regexp_replace('£' || printf('%.2f', c_acctbal), '[^0-9.-]', '', 'g') AS DOUBLE)), 2) AS parsed_total
    FROM customer
    WHERE c_acctbal >= 0
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def money_symbol_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency-symbol strip (SURVEY F18, Laltex "£23.50" prices,
    flat-structure/laltex.json:12-13)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    gbp = F.concat(F.lit("£"), F.format_string("%.2f", F.col("c_acctbal")))
    return (
        cust.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.round(F.sum(pf.parse_money(gbp)), 2).alias("parsed_total"))
        .orderBy("segment")
    )


@query(
    "string_case_ops",
    oracle="""
    SELECT upper(p_brand) AS brand_upper,
           count(*) AS n,
           CAST(sum(CASE WHEN contains(upper(p_type), 'ECO') THEN 1 ELSE 0 END) AS BIGINT) AS n_eco,
           min(lower(p_name)) AS first_name_lower
    FROM part
    GROUP BY upper(p_brand) ORDER BY brand_upper
    """,
)
def string_case_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/contains compare chain (SURVEY F3/F4: the status and
    printable-flag derivations)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(F.upper(F.col("p_brand")).alias("brand_upper"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.upper(F.col("p_type")).contains("ECO"), 1).otherwise(0)).alias("n_eco"),
            F.min(F.lower(F.col("p_name"))).alias("first_name_lower"),
        )
        .orderBy("brand_upper")
    )


@query(
    "status_derivation_case",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
                WHEN o_orderstatus = 'O' THEN 'active'
                ELSE 'partial' END AS status,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1 ORDER BY status
    """,
)
def status_derivation_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise status derivation (SURVEY P4,
    etl/transformers/midocean_transformer.py:477-489)."""
    status = (
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "active")
        .otherwise("partial")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(status.alias("status"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("status")
    )


@query(
    "date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           count(*) AS n,
           min(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')) AS first_iso,
           CAST(max(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01')) AS INT) AS max_age_days
    FROM orders
    GROUP BY 1, 2 ORDER BY order_year, order_month
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction / ISO formatting / day arithmetic (SURVEY
    F7/F9/F10) with a fixed as-of literal — no current-date dependence."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss")).alias("first_iso"),
            F.max(
                F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
            ).alias("max_age_days"),
        )
        .orderBy("order_year", "order_month")
    )


@query(
    "coalesce_null_handling",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(coalesce(CASE WHEN o_totalprice > 100000 THEN o_totalprice END, 0.0)), 2) AS big_total,
           CAST(sum(CASE WHEN CASE WHEN o_totalprice > 100000 THEN o_totalprice END IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def coalesce_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe get-with-default (SURVEY F13: the pervasive
    ``raw.get(k, default)``) via coalesce over a nullable expression."""
    orders = load_table(spark, sf_dir, "orders")
    nullable = F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce(nullable, F.lit(0.0))), 2).alias("big_total"),
            F.sum(F.when(nullable.isNull(), 1).otherwise(0)).alias("n_defaulted"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sql_udf_inlined_tiers",
    oracle="""
    -- the SQL-UDF bodies expanded inline — if Spark's CREATE FUNCTION
    -- resolution, argument binding, or nested invocation (taxed calls
    -- inside an aggregate over tier groups) drifts, values mismatch
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_tier,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 1.19 * 100) AS BIGINT)) AS BIGINT)
               AS taxed_cents
    FROM orders
    GROUP BY 1
    ORDER BY price_tier
    """,
)
def sql_udf_inlined_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 ``CREATE FUNCTION ... RETURN``) — the
    declarative member of the UDF surface (pandas UDF / UDTF / UDAF /
    applyInPandas are the Python members; reference analogue: the
    per-supplier transform helpers of
    /root/reference/etl/transformers/midocean_transformer.py:504-515).
    Unlike any Python UDF, a SQL UDF's body INLINES into the Catalyst
    plan — the tier CASE and the tax arithmetic land inside
    WholeStageCodegen with zero serialization boundary, so at 100 TB
    the "UDF" costs exactly what the hand-written expression costs
    (tests/test_plan_shapes.py pins the no-Python-boundary plan)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pim_price_tier(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p < 50000 THEN 'low' "
        "WHEN p < 150000 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pim_taxed_cents(p DOUBLE, rate DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(p * (1 + rate) * 100) AS BIGINT)"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql_udf_orders")
    return spark.sql("""
        SELECT pim_price_tier(o_totalprice) AS price_tier,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(pim_taxed_cents(o_totalprice, 0.19)) AS BIGINT) AS taxed_cents
        FROM sql_udf_orders
        GROUP BY 1
        ORDER BY price_tier
    """)
