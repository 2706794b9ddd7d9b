"""Third batch of TPC-H analytical shapes — completes all 22 classic
queries adapted to the synthetic schema. The schema lacks partsupp,
l_commitdate/l_receiptdate, p_mfgr/p_container and phone columns, so
those predicates are re-expressed over columns that exist (lineitem
unit prices stand in for partsupp supply cost; ship-vs-order delay for
the commit/receipt race; p_retailprice as the cost basis) while the
join/subquery STRUCTURE of each query — which is what exercises the
optimizer — is preserved.

Parity notes (NOTES.md traps): all money columns in the synthetic
data are 2-dp-exact, so per-row revenue/profit expressions are true
<=4-dp decimals; summing them as DOUBLE drifts with partition order
and can land a group exactly on a .xx5 rounding boundary where
Spark's shortest-string HALF_UP and DuckDB's binary rounding disagree
(observed on q10 at sf0.01). The fix used throughout this module:
cast the per-row value to DECIMAL(18,4) — both engines recover the
exact decimal because the binary error is far below 0.5e-4 — then sum
in exact decimal arithmetic (order-independent, engine-identical),
round, and cast the final result to DOUBLE for the output schema.
Integer counts are CAST to BIGINT in the DuckDB oracles (HUGEINT
trap); quantity sums/averages are integral doubles, so thresholds
like ``0.2*avg`` and ``1.5*avg`` compare engine-exactly; all date
literals and stored timestamps are midnight, so interval comparisons
are exact.

Scale notes (100 TB): every query keeps the fact table (lineitem /
orders) streaming through hash joins against broadcast dimensions;
subquery thresholds reduce to 1-row broadcast attaches; EXISTS / NOT
EXISTS become semi / anti joins on pre-projected key sets so only keys
shuffle, never payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table


@query(
    "q6_forecast_revenue",
    oracle="""
    -- TPC-H Q6 shape: single-scan conditional revenue delta; every
    -- predicate is scan-pushable (no join at all)
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue_delta,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical pushdown probe — a single
    lineitem scan where ALL predicates (date range, discount band,
    quantity cap) reach the parquet reader as PushedFilters and the
    aggregate is a 2-value partial+final. At 100 TB this reads only
    the row groups whose min/max stats overlap the ship-date year."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    delta = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
    return li.agg(
        F.round(F.sum(delta), 2).cast("double").alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    -- TPC-H Q2 shape (no partsupp -> observed lineitem unit price is
    -- the supply-cost proxy): per-part MIN over a region-restricted
    -- supplier set, joined back on equality (correlated-min subquery)
    WITH eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), offers AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem JOIN eu ON l_suppkey = eu.s_suppkey
      GROUP BY 1, 2
    ), best AS (
      SELECT l_partkey, min(unit_price) AS best_price FROM offers GROUP BY 1
    )
    SELECT p_partkey, p_name, s_name, n_name, round(s_acctbal, 2) AS s_acctbal,
           floor(o.unit_price * 100) / 100 AS unit_price
    FROM part
    JOIN best b ON p_partkey = b.l_partkey
    JOIN offers o ON o.l_partkey = b.l_partkey AND o.unit_price = b.best_price
    JOIN eu ON o.l_suppkey = eu.s_suppkey
    WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
    ORDER BY s_acctbal DESC, p_partkey, s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (ref intent: cheapest qualified supplier per
    part): the correlated MIN subquery becomes a per-part aggregate
    joined back on value equality. Unit price is an exact IEEE
    division of stored doubles, so MIN and the equality join are
    engine-identical; only the DISPLAY column is floored to 2 dp.

    Scale: the region-filtered supplier set broadcasts (dims are
    small); lineitem aggregates by (partkey, suppkey) — one shuffle —
    and the per-part best is a second keys-only aggregate. The part
    filter prunes before the final joins."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    offers = (
        li.join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("best_price")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
    )
    winners = offers.join(
        best,
        (offers.l_partkey == best.b_partkey) & (offers.unit_price == best.best_price),
    )
    return (
        winners.join(F.broadcast(part), winners.l_partkey == part.p_partkey)
        .join(F.broadcast(eu), winners.l_suppkey == eu.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            (F.floor(F.col("unit_price") * 100) / 100).alias("unit_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
    )


@query(
    "q8_national_market_share",
    oracle="""
    -- TPC-H Q8 shape: one nation's share of a region's market for a
    -- part class, per year; 7-table star join, share from ROUNDED sums
    WITH flows AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_1'
                               THEN CAST(volume AS DECIMAL(18,4)) ELSE 0 END), 2) AS DOUBLE)
             AS nation_rev,
           CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_rev,
           floor(CAST(round(sum(CASE WHEN supp_nation = 'NATION_1'
                                     THEN CAST(volume AS DECIMAL(18,4)) ELSE 0 END), 2) AS DOUBLE)
                 * 10000.0 / CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE))
             / 10000.0 AS mkt_share
    FROM flows GROUP BY 1 ORDER BY 1
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the widest star join in the suite (lineitem +
    6 dimension hops, nation twice under different roles). The share
    is computed from the two ROUNDED sums with the q14 floor-ratio
    pattern so the division can't land on a rounding boundary.

    Scale: all six dimension sides broadcast; lineitem shuffles only
    for the orders equi join; the CASE folds the numerator into the
    same aggregate pass as the denominator (one scan, one shuffle)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    n2 = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        F.col("n_nationkey").alias("n2_key")
    )
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flows = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"), "left_semi")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "supp_nation")
    )
    vol_dec = F.col("volume").cast("decimal(18,4)")
    nation_rev = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", vol_dec).otherwise(F.lit(0).cast("decimal(18,4)"))),
        2,
    ).cast("double")
    total_rev = F.round(F.sum(vol_dec), 2).cast("double")
    return (
        flows.groupBy(F.col("o_year").cast("bigint").alias("o_year"))
        .agg(nation_rev.alias("nation_rev"), total_rev.alias("total_rev"))
        .withColumn(
            "mkt_share",
            F.floor(F.col("nation_rev") * 10000.0 / F.col("total_rev")) / 10000.0,
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    -- TPC-H Q9 shape (no partsupp -> 0.6*p_retailprice is the cost
    -- basis): profit by supplier nation and order year over a
    -- name-substring part class
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rollup where the measure mixes columns
    from three tables (lineitem price, part cost basis, order year) —
    the expression can only be computed post-join, so join order
    matters: the part name filter prunes lineitem FIRST (broadcast
    semi effect), then orders attach.

    Scale: part/supplier/nation broadcast; the only big shuffle is
    lineitem⋈orders on orderkey, then a tiny (nation, year) agg."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q10_returned_item_reporting",
    oracle="""
    -- TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    -- one quarter; deterministic cut via (revenue DESC, custkey)
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: group-then-top-k. The returnflag + quarter
    filters land on the scans; the LIMIT breaks revenue ties with
    c_custkey so the cut is a total order (NOTES.md ties trap), and
    revenue is an exact decimal sum so the top-20 cut itself can't
    diverge between engines (a double sum here DID flip a .595
    boundary at sf0.01).

    Scale: the post-agg result is one row per active customer — Spark
    plans the ORDER+LIMIT as TakeOrderedAndProject, never a global
    sort of the full customer set."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q11_part_value_concentration",
    oracle="""
    -- TPC-H Q11 shape (no partsupp -> shipped qty * retail price is
    -- the inventory-value proxy): parts whose value from one nation's
    -- suppliers exceeds a fraction-of-total scalar subquery
    WITH vals AS (
      SELECT l_partkey, sum(CAST(l_quantity * p_retailprice AS DECIMAL(18,2))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
    FROM vals
    WHERE val * 1000 > (SELECT sum(val) FROM vals)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: an aggregate filtered by a scalar aggregate of
    ITSELF (the fraction-of-total idiom). The per-part values CTE is
    computed once and reused for both the threshold and the filter —
    Spark sees it as one shuffle plus a 1-row broadcast attach.

    Scale: the nation filter prunes suppliers before the fact join.
    Values are exact DECIMAL sums and the 0.1% gate is expressed as
    ``val * 1000 > total`` so the comparison is integer-exact — no
    float threshold a summation-order ulp could flip."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    sup_n = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey, "left_semi")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    vals = (
        li.join(F.broadcast(sup_n), li.l_suppkey == sup_n.s_suppkey, "left_semi")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,2)")).alias("val")
        )
    )
    threshold = vals.agg(F.sum("val").alias("total"))
    return (
        vals.crossJoin(F.broadcast(threshold))
        .filter(F.col("val") * 1000 > F.col("total"))
        .select(F.col("l_partkey").alias("p_partkey"), F.col("val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@query(
    "q15_top_supplier",
    oracle="""
    -- TPC-H Q15 shape: the revenue "view" computed once, its MAX as a
    -- scalar subquery, equality on the ROUNDED revenue
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(round(total_rev, 2) AS DOUBLE) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CREATE VIEW revenue + max-scalar-subquery,
    expressed as one aggregate reused twice. Equality is tested on the
    EXACT decimal revenue (order-independent sums), so the winner set
    is identical on both engines; ties (co-leaders) surface on both
    sides identically.

    Scale: one lineitem shuffle to (suppkey) — supplier-count rows out
    — then a 1-row max broadcast back against it."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")).alias(
            "total_rev"
        )
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    -- TPC-H Q17 shape: correlated per-part average-quantity subquery;
    -- quantities are integral doubles so 0.2*avg compares exactly
    WITH pf AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#5' AND p_size < 15
    ), li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN pf ON l_partkey = p_partkey
    ), avgs AS (
      SELECT l_partkey, avg(l_quantity) AS avg_qty FROM li GROUP BY 1
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
           CAST(count(*) AS BIGINT) AS n_lines,
           floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100 / 7) / 100
             AS avg_yearly
    FROM li JOIN avgs ON li.l_partkey = avgs.l_partkey
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated AVG subquery becomes a per-part
    aggregate joined back to the same filtered lineitem slice — the
    classic "aggregate, rejoin, compare to own group's stat" pattern.
    avg(l_quantity) is an exact division of integral-double sums, so
    the 20% threshold is engine-exact (no epsilon needed).

    Scale: the brand/size filter makes the part side tiny → both the
    slice and the per-part averages stay broadcast-sized; lineitem is
    scanned once (the slice is reused for both the avg and the probe)."""
    pf = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#5") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    avgs = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    probe = li.join(F.broadcast(avgs), li.l_partkey == F.col("a_partkey")).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    agg = probe.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total_rev"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agg.withColumn(
        "avg_yearly", F.floor(F.col("total_rev") * 100 / 7) / 100
    )


@query(
    "q20_excess_shipment_suppliers",
    oracle="""
    -- TPC-H Q20 shape (no partsupp availqty -> shipped-volume vs the
    -- fleet average): nested IN subqueries reduce to an aggregate
    -- gate; 1.5*avg over integral quantity sums compares exactly
    WITH shipped AS (
      SELECT l_suppkey, sum(l_quantity) AS red_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal,
           round(red_qty, 2) AS red_qty
    FROM supplier JOIN shipped ON s_suppkey = l_suppkey
    WHERE red_qty > (SELECT avg(red_qty) * 1.5 FROM shipped)
    ORDER BY s_suppkey
    """,
)
def q20_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: supplier IN (aggregate over lineitem WHERE
    part IN (name-filtered parts)) — the doubly-nested IN becomes a
    semi join into an aggregate gated by a scalar threshold. The
    1.5×-average gate is scale-invariant (survives any SF) and exact
    (integral quantity sums).

    Scale: the red-part key set broadcasts into the lineitem scan as a
    semi join (no payload moves); the per-supplier rollup is
    supplier-count rows; the threshold is a 1-row broadcast."""
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    shipped = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("red_qty"))
    thr = shipped.agg((F.avg("red_qty") * 1.5).alias("thr"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        shipped.crossJoin(F.broadcast(thr))
        .filter(F.col("red_qty") > F.col("thr"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.round("red_qty", 2).alias("red_qty"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    -- TPC-H Q21 shape (no commit/receipt dates -> ship >60d after
    -- order is "late"): the sole late supplier in a multi-supplier
    -- finished order; EXISTS + NOT EXISTS self-correlations
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    ), all_su AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM all_su a
                  WHERE a.l_orderkey = l1.l_orderkey AND a.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_suppkey
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the hardest correlation pattern in the suite:
    an EXISTS (another supplier participated) AND NOT EXISTS (another
    supplier was ALSO late) against the same fact table. Re-expressed
    as set algebra over ONE fact pass: per (orderkey, suppkey) a
    max(late_flag) membership bit, then per-order gates as WINDOW
    aggregates over the same rows — EXISTS-other-supplier ⇔
    count(*) over (order) ≥ 2, NOT-EXISTS-other-late ⇔ sum(is_late)
    over (order) = 1. The earlier formulation built `late` and `all
    pairs` as separate distinct projections: 3 lineitem scans, no
    exchange reuse. The window form consumes the per-pair aggregate
    exactly once, so the fact table is scanned ONCE (verified: one
    lineitem scan in the formatted plan; 2.9 s → 1.5 s warm at sf0.1).

    Scale: the window partitions by orderkey over keys+flags rows
    (already shuffled on a compatible key by the pair aggregate);
    supplier names broadcast at the end."""
    orders_cols = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    pairs = li.join(orders_cols, li.l_orderkey == orders_cols.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            1,
        )
        .otherwise(0)
        .alias("late_flag"),
    )
    per_pair = pairs.groupBy("l_orderkey", "l_suppkey").agg(F.max("late_flag").alias("is_late"))
    per_order = Window.partitionBy("l_orderkey")
    gated = per_pair.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(per_order).alias("n_sup"),
        F.sum("is_late").over(per_order).alias("n_late"),
    ).filter((F.col("is_late") == 1) & (F.col("n_sup") >= 2) & (F.col("n_late") == 1))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        gated.join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
    )
