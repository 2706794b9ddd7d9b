"""Headline analytical queries (TPC-H shapes) + remaining window/scalar
coverage: multi-join plans that exercise Catalyst's join reordering and
broadcast selection, value-range window frames, ntile/lead, and the
combined dimension-string parse (F17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pim_etl_spark import functions as pf
from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table


@query(
    "q4_late_ship_priority",
    oracle="""
    -- TPC-H Q4 shape on the synthetic schema: priority counts of
    -- orders with at least one item shipped >90 days after ordering
    -- (correlated EXISTS with an inequality spanning both tables)
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1994-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS becomes a LEFT SEMI join with
    a compound condition (equi key + cross-table inequality) — the
    equi part drives the hash join, the inequality filters post-probe;
    each order contributes once no matter how many late items."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1994-07-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], 90)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    -- TPC-H Q16 shape: distinct-supplier counts per (brand, type)
    -- excluding negative-balance suppliers via NOT IN (anti join)
    SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    LIMIT 20
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN over a non-null key is a broadcast
    LEFT ANTI join; count(DISTINCT) expands two-phase; the top-20 has a
    total order (cnt desc, brand, type) so the limit is deterministic."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & ~F.col("p_type").startswith("MEDIUM")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_suppliers = (
        load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    joined = (
        li.join(F.broadcast(bad_suppliers), li["l_suppkey"] == bad_suppliers["s_suppkey"], "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
    )
    return (
        joined.groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
        .limit(20)
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue top-k (TPC-H Q3 shape): selective
    filters push into all three scans, the dimension side broadcasts,
    and the top-k is TakeOrderedAndProject on the rounded revenue with
    a key tiebreak (deterministic across engines)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_revenue",
    oracle="""
    SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY nation
    """,
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue by nation (TPC-H Q5 shape): a 6-table
    join where Catalyst reorders and broadcasts the dimension chain;
    the supplier join carries the extra locality equi-condition."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (sup.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("nation")
    )


@query(
    "range_frame_rolling_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def range_frame_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per-customer 30-day rolling revenue —
    the time-window frame the reference's stock/price validity model
    implies (SURVEY J6/W2), as a single window pass."""
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(days).rangeBetween(-30, 0)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "ntile_lead_quartiles",
    oracle="""
    SELECT c_nationkey, c_custkey,
           ntile(4) OVER w AS bal_quartile,
           round(coalesce(lead(c_acctbal, 1) OVER w, 0.0), 2) AS next_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    ORDER BY c_nationkey, c_custkey
    """,
)
def ntile_lead_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing + lead lookahead in one window (SURVEY §2.5)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            F.ntile(4).over(w).alias("bal_quartile"),
            F.round(F.coalesce(F.lead("c_acctbal", 1).over(w), F.lit(0.0)), 2).alias("next_bal"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )


@query(
    "dimension_string_parse",
    oracle="""
    -- synthesize "LxWxH CM" strings then parse back (F17)
    WITH dims AS (
      SELECT p_partkey,
             CAST(p_size AS VARCHAR) || ',5X' || CAST(p_size + 1 AS VARCHAR)
               || 'X' || CAST(p_size + 2 AS VARCHAR) || ' CM' AS dim_str
      FROM part
    )
    SELECT CAST(regexp_extract(replace(upper(dim_str), ' ', ''), '^([0-9.,]+)', 1)
                  .replace(',', '.') AS DOUBLE) AS length,
           count(*) AS n,
           round(sum(CAST(string_split(regexp_extract(replace(upper(dim_str), ' ', ''),
                 '^([0-9.,]+(?:X[0-9.,]+)*)', 1), 'X')[2].replace(',', '.') AS DOUBLE)), 2) AS width_sum
    FROM dims
    GROUP BY 1 ORDER BY length
    """,
)
def dimension_string_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined dimension-string parse (SURVEY F17: "10,5X8X2 CM"):
    synthesize the feed format from part sizes, parse with the engine
    helper, aggregate the parsed components."""
    part = load_table(spark, sf_dir, "part")
    dim_str = F.concat(
        F.col("p_size").cast("string"), F.lit(",5X"),
        (F.col("p_size") + 1).cast("string"), F.lit("X"),
        (F.col("p_size") + 2).cast("string"), F.lit(" CM"),
    )
    parsed = pf.dims_from_string(dim_str)
    return (
        part.select(parsed.alias("d"))
        .groupBy(F.col("d.length").alias("length"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("d.width"), 2).alias("width_sum"),
        )
        .orderBy("length")
    )
