"""Second batch of TPC-H analytical shapes adapted to the synthetic
schema (no partsupp/comment/phone/shipmode columns — predicates are
re-expressed over the columns that exist; the join/aggregate/subquery
STRUCTURE of each query is preserved, which is what exercises the
optimizer).

Scale notes (100 TB): every query here is a star join where the fact
side (lineitem/orders) streams through hash joins against broadcast or
shuffled dimensions, followed by a partial+final aggregate; none
materializes an unbounded intermediate. Q13's left join preserves the
customer partitioning; Q18's HAVING pre-aggregates lineitem BEFORE the
customer join so only qualifying orderkeys shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table


@query(
    "q7_nation_volume",
    oracle="""
    -- TPC-H Q7 shape: shipped volume between two nations, by flow
    -- direction and year (two aliases of the same dimension table)
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (ref intent: cross-supplier trade volume): the
    nation dimension joins TWICE under different roles; the disjunctive
    pair filter applies after both decodes. Both nation joins broadcast;
    the only shuffles are the fact-side equi joins and the final agg."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp_ntz"),
            F.lit("1996-12-31").cast("timestamp_ntz"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q12_ship_delay_priority",
    oracle="""
    -- TPC-H Q12 shape (no shipmode column): order-to-ship delay
    -- buckets vs priority class, CASE-sum pivot counts
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30
                THEN 'FAST'
                WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90
                THEN 'MEDIUM' ELSE 'SLOW' END AS delay_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: a derived bucket as the group key and two
    conditional counts (CASE-sum pivot). Both timestamps are midnight
    so date-cast datediff is engine-identical (NOTES.md parity trap:
    DuckDB counts boundary crossings, Spark truncates — equal on dates).
    Integer CASE-sums are cast BIGINT oracle-side (HUGEINT trap)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "MEDIUM").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    -- TPC-H Q13 shape: distribution of customers by order count,
    -- LEFT JOIN so zero-order customers land in the c_count=0 bin
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregate over an outer join whose
    extra non-equi condition lives in the JOIN (not WHERE — moving it
    would drop the zero-order customers). count(o_orderkey) skips the
    nulls the outer join manufactures. The second aggregate is tiny
    (distinct order counts), so the heavy shuffle is only the first."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle="""
    -- TPC-H Q14 shape: promo revenue share for one month; the percent
    -- is derived from the ROUNDED sums on both engines, and floored
    -- (not rounded) to dodge HALF_UP/HALF_EVEN divergence on ratios
    WITH t AS (
      SELECT round(sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_rev,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    )
    SELECT promo_rev, total_rev,
           floor(promo_rev * 10000.0 / total_rev) / 100.0 AS promo_pct
    FROM t
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share in one scan — the
    CASE folds the promo filter into the aggregate instead of a second
    join pass. The part side broadcasts."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2).alias("promo_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        (F.floor(F.col("promo_rev") * 10000.0 / F.col("total_rev")) / 100.0).alias("promo_pct"),
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    -- TPC-H Q18 shape: customers behind bulk orders (HAVING subquery
    -- feeding a semi-filtered 3-way join)
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-subquery pre-aggregates lineitem to
    qualifying orderkeys FIRST (a tiny set), which then semi-joins the
    fact tables — at 100 TB this is the difference between shuffling
    every lineitem row and shuffling only the bulk-order keys."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bulk_keys = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 250).select("l_orderkey")
    )
    qualified = orders.join(
        F.broadcast(bulk_keys.withColumnRenamed("l_orderkey", "bulk_key")),
        orders.o_orderkey == F.col("bulk_key"),
        "left_semi",
    )
    return (
        qualified.join(cust, qualified.o_custkey == cust.c_custkey)
        .join(li, qualified.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", F.round("o_totalprice", 2).alias("o_totalprice"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    -- TPC-H Q19 shape: three OR'd multi-column predicate branches over
    -- the join; the equi key still drives the hash join
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive cross-table predicates. Catalyst
    keeps p_partkey = l_partkey as the hash-join key and evaluates the
    OR branches post-probe; per-branch single-table conjuncts
    (p_brand/p_size, l_quantity hulls) are derived and pushed to the
    scans by the optimizer's constraint propagation."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 20) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(20, 50))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q22_idle_customer_balance",
    oracle="""
    -- TPC-H Q22 shape (no phone column → nationkey bucket as the
    -- "country code"): above-average-balance customers with no recent
    -- orders; scalar subquery + NOT EXISTS
    SELECT CAST(c_nationkey % 7 AS BIGINT) AS code,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: a scalar aggregate subquery (1-row broadcast
    attach, no shuffle) gates the filter, then NOT EXISTS becomes a
    LEFT ANTI join against the recent-orders keys. The anti side is
    pre-projected to distinct custkeys so only keys shuffle."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 7).cast("bigint").alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("code")
    )
