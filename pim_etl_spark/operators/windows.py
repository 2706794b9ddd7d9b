"""Window functions: dedup, tier-pick, running aggs, sessionization
(SURVEY §2.5 W1/W2 + streaming-adjacent batch semantics §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.tuning import sorted_output
from pim_etl_spark.sources import load_table


@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key window dedup — the upsert semantics of the
    reference's MongoDB ReplaceOne loader (etl/loaders/mongodb_loader.py:130-134,
    SURVEY W1). At scale: one hash shuffle on the key; bucket the gold
    table on the key to amortize across repeat syncs (SURVEY §4).
    """
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
        .orderBy("o_custkey")
    )


@query(
    "max_qty_item_per_order",
    oracle="""
    SELECT l_orderkey, l_linenumber AS top_linenumber, l_quantity AS top_quantity
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    ORDER BY l_orderkey
    """,
)
def max_qty_item_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applicable-tier pick: greatest qualifying row per key (SURVEY W2,
    the print-price tier resolution shape, flat-structure/midocean.json:29-80)."""
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc(), F.col("l_linenumber").asc())
    return (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").alias("top_linenumber"),
            F.col("l_quantity").alias("top_quantity"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "running_revenue_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame aggregation (SURVEY §2.5)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "customer_rank_lag_in_nation",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank()       OVER w AS bal_rank,
           dense_rank() OVER w AS bal_dense_rank,
           round(c_acctbal - lag(c_acctbal, 1, c_acctbal)
                 OVER w, 2) AS bal_gap_to_prev
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    ORDER BY c_nationkey, bal_rank, c_custkey
    """,
)
def customer_rank_lag_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lag in one window pass (SURVEY §2.5)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).alias("bal_rank"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
            F.round(
                F.col("c_acctbal") - F.lag("c_acctbal", 1, None).over(w).cast("double"),
                2,
            ).alias("bal_gap_to_prev"),
        )
        .withColumn("bal_gap_to_prev", F.coalesce(F.col("bal_gap_to_prev"), F.lit(0.0)))
        .orderBy("c_nationkey", "bal_rank", "c_custkey")
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             -- microsecond arithmetic: exact on both engines (second
             -- granularity counts boundaries in DuckDB but truncates in
             -- Spark, so sub-second gaps at the threshold would differ)
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           -- windowed sum(INT) is HUGEINT in DuckDB; Spark emits BIGINT
           CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) — the
    batch twin of ``session_window`` in Structured Streaming (SURVEY §2.8).
    """
    by_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ties on ts must have a deterministic order (duplicate timestamps
    # exist at larger SFs) → event_id tiebreak in the running sum too
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = load_table(spark, sf_dir, "events")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(by_time)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") > 1800 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        flagged.withColumn("session_seq", F.sum("new_session").over(run))
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .orderBy("user_id", "session_seq")
    )


@query(
    "hourly_event_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form (SURVEY §2.8): identical
    grouping to ``window(ts, '1 hour')`` in the streaming module."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("window_start", "event_type")
    )


@query(
    "clamped_running_balance",
    oracle="""
    -- GROUND-TRUTH twin via the actual recurrence: a recursive CTE
    -- replays S_n = greatest(0, S_{n-1} + delta_n) row by row per
    -- customer. The Spark side computes the SAME balances from the
    -- closed-form max-plus identity (prefix sum minus clamped running
    -- minimum) in two ordinary windows — so the oracle PROVES the
    -- non-obvious rewrite, not just a second copy of it.
    WITH RECURSIVE base AS (
      SELECT o_custkey AS c, o_orderkey AS k,
             CASE WHEN o_orderkey % 3 = 0
                  THEN -CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS delta,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    rec AS (
      SELECT c, rn, greatest(0, delta) AS bal FROM base WHERE rn = 1
      UNION ALL
      SELECT s.c, s.rn, greatest(0, r.bal + s.delta)
      FROM rec r JOIN base s ON s.c = r.c AND s.rn = r.rn + 1
    )
    SELECT c AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(CASE WHEN rn = n THEN bal END) AS BIGINT)
             AS final_balance_cents,
           CAST(max(bal) AS BIGINT) AS peak_balance_cents,
           CAST(sum(bal) AS BIGINT) AS balance_trajectory_sum
    FROM (SELECT rec.*, max(rn) OVER (PARTITION BY c) AS n FROM rec)
    GROUP BY c
    ORDER BY c
    """,
)
def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped (floor-at-zero) running balance — the inventory/credit
    recurrence S_n = max(0, S_{n-1} + Δ_n) that LOOKS like it needs
    row-at-a-time iteration, computed instead via the max-plus
    closed form S_n = P_n − min(0, min_{k≤n} P_k) (prefix sum and
    running minimum: two ordinary windows on ONE customer exchange).
    This is the difference between a 100 TB-scalable window plan and a
    per-key sequential loop; the oracle replays the true recurrence
    recursively, so the identity itself is what the hash gate proves.
    The trajectory sum pins every intermediate balance, not just the
    endpoints."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.when(F.col("o_orderkey") % 3 == 0, -cents).otherwise(cents).alias("delta"),
    )
    w = Window.partitionBy("custkey").orderBy("d", "k")
    scored = (
        base.withColumn("p", F.sum("delta").over(w))
        .withColumn("m", F.min(F.sum("delta").over(w)).over(w))
        .withColumn("bal", F.col("p") - F.least(F.lit(0).cast("long"), F.col("m")))
    )
    return (
        scored.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max_by("bal", F.struct("d", "k")).alias("final_balance_cents"),
            F.max("bal").alias("peak_balance_cents"),
            F.sum("bal").cast("long").alias("balance_trajectory_sum"),
        )
        .orderBy("custkey")
    )


@query(
    "weighted_median_price",
    oracle="""
    -- exact weighted (lower) median: per return flag, the smallest
    -- price cents whose cumulative quantity weight reaches half the
    -- total — integer cross-multiplication (2·cumw >= W), no
    -- interpolation, no float. Quantity-weighted percentiles are the
    -- verb plain percentile entries can't express (a 40-unit line
    -- counts 40×).
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(l_quantity) AS BIGINT) AS w
      FROM lineitem
      GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, cents, w,
             sum(w) OVER (PARTITION BY flag ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cumw,
             sum(w) OVER (PARTITION BY flag) AS total_w
      FROM g
    )
    SELECT flag,
           CAST(any_value(total_w) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cumw >= total_w THEN cents END) AS BIGINT)
             AS weighted_median_cents
    FROM c
    GROUP BY flag
    ORDER BY flag
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (the quantity-weighted percentile verb):
    distinct prices aggregate their weights first (ties accumulate
    together by construction), one ordered window per group computes
    cumulative weight, and the lower weighted median is the smallest
    price where 2·cumw ≥ W — all integer arithmetic, bit-identical
    cross-engine. One exchange on the group key; the window runs over
    distinct-price rows, not raw lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).agg(F.sum("l_quantity").cast("long").alias("w"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("flag")
    c = g.withColumn("cumw", F.sum("w").over(w_cum)).withColumn(
        "total_w", F.sum("w").over(w_all)
    )
    return (
        c.groupBy("flag")
        .agg(
            F.max("total_w").cast("long").alias("total_weight"),
            F.min(F.when(2 * F.col("cumw") >= F.col("total_w"), F.col("cents")))
            .cast("long")
            .alias("weighted_median_cents"),
        )
        .transform(sorted_output, "flag")
    )


@query(
    "order_streak_islands",
    oracle="""
    -- gaps-and-islands: consecutive-day ordering streaks per customer
    -- via the day_number - row_number grouping constant; top 20
    -- longest streaks (ties: earlier start, then smaller custkey)
    WITH days AS (
      SELECT DISTINCT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d
      FROM orders
    ),
    grp AS (
      SELECT ck, d,
             date_diff('day', DATE '1970-01-01', d)
               - row_number() OVER (PARTITION BY ck ORDER BY d) AS island
      FROM days
    ),
    streaks AS (
      SELECT ck, CAST(count(*) AS BIGINT) AS streak_days,
             CAST(min(d) AS TIMESTAMP) AS streak_start,
             CAST(max(d) AS TIMESTAMP) AS streak_end
      FROM grp GROUP BY ck, island
    )
    SELECT ck AS custkey, streak_days, streak_start, streak_end
    FROM streaks
    ORDER BY streak_days DESC, streak_start ASC, custkey ASC
    LIMIT 20
    """,
)
def order_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (consecutive-day activity streaks): the
    day-ordinal minus row_number trick turns each maximal consecutive
    run into a constant grouping key — no self-join, no loop, one
    window + one aggregate per customer partition. The engagement-
    streak / uptime-run / sensor-outage verb. Top-20 with a total
    order (length desc, start asc, custkey asc); date outputs cast to
    timestamp on both sides (NOTES dtype rule)."""
    days = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("ck"), F.to_date("o_orderdate").alias("d"))
        .distinct()
    )
    island = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) - F.row_number().over(
        Window.partitionBy("ck").orderBy("d")
    )
    streaks = (
        days.withColumn("island", island)
        .groupBy("ck", "island")
        .agg(
            F.count(F.lit(1)).cast("long").alias("streak_days"),
            F.min("d").cast("timestamp_ntz").alias("streak_start"),
            F.max("d").cast("timestamp_ntz").alias("streak_end"),
        )
    )
    return (
        streaks.select(
            F.col("ck").alias("custkey"), "streak_days", "streak_start", "streak_end"
        )
        .orderBy(F.desc("streak_days"), F.asc("streak_start"), F.asc("custkey"))
        .limit(20)
    )
