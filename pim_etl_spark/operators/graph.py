"""Graph operators: iterative algorithms expressed as DataFrame loops.

The reference has no graph surface; these extend the engine the way a
training-data pipeline needs it (the transitive-duplicate clustering in
``llm_ops/dedup.py: duplicate_clusters`` is the unweighted sibling).
PageRank here runs on the nation-level trade graph derived from the
warehouse — the heavy, 100-TB-relevant piece is the EDGE BUILD (a
5-way star join aggregated down to nations²=625 weighted edges); the
rank loop then iterates over a graph that is small by construction.
For graphs that stay large after aggregation, the label-propagation
pattern with per-round ``localCheckpoint`` (dedup.py:295-331) is the
template.

Determinism: edge weights are integral counts, transition
probabilities are exact IEEE divisions, and each iteration's sums run
over ≤25 incoming terms — cross-engine summation-order drift stays at
~1e-15 while ranks sit at ~0.04, so the 6-dp rounding in the output
can never land on an engine-divergent boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table

# The nation dimension is fixed-cardinality (25) at every scale factor;
# both engines hardcode it so neither needs a driver-side count action.
N_NATIONS = 25
DAMPING = 0.85
N_ITER = 5


def _pr_oracle() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (aggregates
    are not allowed in a standard recursive CTE term, so the 5 rounds
    are written out; DuckDB folds the repetition at plan time)."""
    iters = []
    for i in range(1, N_ITER + 1):
        iters.append(
            f"""pr{i} AS (
      SELECT n.node,
             0.15 / {N_NATIONS} + {DAMPING} * coalesce(sum(p.rank * e.p), 0) AS rank
      FROM nodes n
      LEFT JOIN norm e ON e.dst = n.node
      LEFT JOIN pr{i - 1} p ON p.node = e.src
      GROUP BY 1
    )"""
        )
    chain = ",\n    ".join(iters)
    return f"""
    -- weighted PageRank over the supplier-nation -> customer-nation
    -- trade graph; 5 unrolled power-iteration rounds
    WITH edges AS (
      SELECT n1.n_nationkey AS src, n2.n_nationkey AS dst,
             CAST(count(*) AS DOUBLE) AS w
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      GROUP BY 1, 2
    ), norm AS (
      SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM edges
    ), nodes AS (
      SELECT n_nationkey AS node FROM nation
    ), pr0 AS (
      SELECT node, 1.0 / {N_NATIONS} AS rank FROM nodes
    ), {chain}
    SELECT n_name AS nation, round(pr{N_ITER}.rank, 6) AS rank
    FROM pr{N_ITER} JOIN nation ON node = n_nationkey
    ORDER BY rank DESC, nation
    """


@query("pagerank_trade_graph", oracle=_pr_oracle())
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank as a DataFrame power-iteration loop: rank
    flows along trade edges (supplier nation -> customer nation,
    weight = lineitem count) with damping 0.85, 5 fixed rounds,
    teleport to uniform. Dangling mass is NOT redistributed (both
    engines apply the same update rule, so the simplification is
    parity-exact and documented).

    Scale design: the star join that builds edges is the only piece
    that touches fact data — dimensions broadcast, lineitem shuffles
    once for the orders join, and the output collapses to nations² =
    625 rows. The normalized edge set is cached so the unrolled loop's
    five logical references resolve to one computation, and each
    round's joins are broadcast-hash (both sides are KB-sized). For
    graphs that remain large after aggregation, per-round
    localCheckpoint (dedup.py duplicate_clusters) replaces the cache.
    """
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("s_nationkey").cast("int").alias("src"),
            F.col("c_nationkey").cast("int").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    norm = edges.withColumn(
        "p", F.col("w") / F.sum("w").over(Window.partitionBy("src"))
    ).select("src", "dst", "p").cache()
    nodes = nat.select(F.col("n_nationkey").alias("node"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / N_NATIONS))
    for _ in range(N_ITER):
        contribs = (
            F.broadcast(norm)
            .join(F.broadcast(ranks), F.col("src") == F.col("node"))
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
        )
        summed = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(F.broadcast(summed), nodes.node == summed.dst, "left")
            .select(
                "node",
                (F.lit(0.15 / N_NATIONS) + DAMPING * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return (
        ranks.join(F.broadcast(nat), F.col("node") == nat.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "nation")
    )
