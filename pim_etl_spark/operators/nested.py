"""Nested-data operators: explode, unpivot, JSON, array building
(SURVEY §2.7 N1–N7, F11, F15/F16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.tuning import sorted_output
from pim_etl_spark.sources import load_table


@query(
    "explode_name_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
    GROUP BY token ORDER BY token
    """,
)
def explode_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split→explode→count — the variants-explode shape (SURVEY N1/F16).

    Generator-style row expansion stays inside whole-stage codegen; at
    scale the explode multiplies rows before the shuffle, so the
    aggregation is partial-agg'd map-side first.
    """
    return (
        load_table(spark, sf_dir, "part")
        .select(F.explode(F.split(F.col("p_name"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("token")
    )


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, measure, value FROM (
      SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
    ) ORDER BY p_partkey, measure
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via stack() (SURVEY N6 — the XD Qty1..Qty6
    price-column unpivot shape)."""
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.expr(
                "stack(2, 'size', cast(p_size as double), 'retailprice', p_retailprice) AS (measure, value)"
            ),
        )
        .orderBy("p_partkey", "measure")
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           -- outer CAST: DuckDB sum(BIGINT) is HUGEINT, Spark's is BIGINT
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + agg (SURVEY F11: json.loads equivalent)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_sum"),
            F.max(k).alias("k_max"),
        )
        .orderBy("event_type")
    )


@query(
    "collect_sorted_event_types",
    oracle="""
    SELECT user_id,
           -- serialized to a string: the driver canonicalizer can't
           -- hash raw list cells (catalog.py convention)
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
           count(*) AS n_events
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def collect_sorted_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array re-nesting with deterministic sort (SURVEY N1 re-nest /
    F15): collect_set→array_sort, serialized with array_join so the
    output stays hashable by the driver."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "category_levels_unpivot",
    oracle="""
    SELECT o_orderkey, level, name FROM (
      SELECT o_orderkey, 1 AS level, o_orderpriority AS name FROM orders
      UNION ALL
      SELECT o_orderkey, 2 AS level, o_orderstatus FROM orders
    ) WHERE name IS NOT NULL
    ORDER BY o_orderkey, level
    """,
)
def category_levels_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level category unpivot (SURVEY N2): columns→(level, name)
    rows with null filtering, expressed as an inline array of structs
    exploded — the same plan shape as the reference's
    product_class/category_level1..3 assembly
    (etl/transformers/midocean_transformer.py:233-267)."""
    orders = load_table(spark, sf_dir, "orders")
    cats = F.array(
        F.struct(F.lit(1).alias("level"), F.col("o_orderpriority").alias("name")),
        F.struct(F.lit(2).alias("level"), F.col("o_orderstatus").alias("name")),
    )
    return (
        orders.select("o_orderkey", F.explode(F.filter(cats, lambda c: c["name"].isNotNull())).alias("c"))
        .select("o_orderkey", F.col("c.level").alias("level"), F.col("c.name").alias("name"))
        .orderBy("o_orderkey", "level")
    )


@query(
    "first_element_projection",
    oracle="""
    -- l_linenumber is not unique per order in this synthetic data, so
    -- the "first element" is pinned with a full deterministic sort key
    SELECT l_orderkey,
           first_item_price,
           first_item_partkey,
           n_items
    FROM (
      SELECT l_orderkey,
             l_extendedprice AS first_item_price,
             l_partkey AS first_item_partkey,
             count(*) OVER (PARTITION BY l_orderkey) AS n_items,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey) AS rn
      FROM lineitem
    ) WHERE rn = 1
    ORDER BY l_orderkey
    """,
)
def first_element_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """variants[0]-style first-element summary (SURVEY P7, §7.5
    fidelity: base price = first variant's price). Single window pass
    computes both the pick and the sibling count."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey"
    )
    wc = Window.partitionBy("l_orderkey")
    return (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_items", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_extendedprice").alias("first_item_price"),
            F.col("l_partkey").alias("first_item_partkey"),
            "n_items",
        )
        .orderBy("l_orderkey")
    )


# --- skew-aware re-nest (round 5, VERDICT r4 #5) ---------------------------
#
# The N1 re-nest (collect_list per master, pipeline/silver.py:140-144)
# is a hash shuffle on master_code; a pathological master with 10⁵
# variants concentrates its whole array build in one reducer's
# aggregation buffer, and every map task that sees the hot key grows an
# unbounded partial buffer too (reference analogue: variants arrays,
# /root/reference/etl/transformers/midocean_transformer.py:269-302).
# The two-level form below bounds the per-group aggregation state to
# ~hot_count/n_salts: level 1 collects per (key, salt) — buckets spread
# across reducers — and level 2 concatenates the ≤n_salts pre-built
# blocks (array concat, not 10⁵ row appends in one buffer).


def salted_partial_collect(
    df: DataFrame, key_cols, value_col: str, n_salts: int = 32
) -> DataFrame:
    """Level 1 of the skewed re-nest: partial arrays per (key, salt).

    The salt is a deterministic function of the VALUE (hash pmod
    n_salts), so re-runs produce identical buckets — no nondeterminism
    under task retry (a random salt re-deals rows on retry and breaks
    exactly-once spot checks)."""
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts))
    return (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.collect_list(value_col).alias("__part"))
    )


def renest_skew_aware(
    df: DataFrame,
    key_cols,
    value_col: str,
    out_col: str = "items",
    hot_threshold: int = 50_000,
    n_salts: int = 32,
) -> DataFrame:
    """Skew-aware collect_list re-nest: keys above ``hot_threshold``
    rows take the salted two-level path; everything else takes the
    plain single-level collect. Output is identical either way
    (``array_sort`` canonicalizes block order), so the split is purely
    a physical-plan decision — the AQE-skew-join idea applied to
    aggregation, which AQE itself does not rebalance.

    Cost: one extra count-only pass over (keys) to find hot keys —
    ids-sized, map-side combined — and the hot-key set broadcasts (by
    definition few keys are hot). At 100 TB this is the difference
    between a 10⁵-variant master OOMing one reducer and spreading its
    build over ``n_salts`` buckets."""
    key_cols = list(key_cols)
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    hot = counts.filter(F.col("__n") > hot_threshold).select(*key_cols)
    flagged = df.join(
        F.broadcast(hot.withColumn("__hot", F.lit(1))), key_cols, "left"
    )
    cold = (
        flagged.filter(F.col("__hot").isNull())
        .groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(value_col)).alias(out_col))
    )
    hot_rows = flagged.filter(F.col("__hot") == 1).drop("__hot")
    merged = (
        salted_partial_collect(hot_rows, key_cols, value_col, n_salts=n_salts)
        .groupBy(*key_cols)
        .agg(F.array_sort(F.flatten(F.collect_list("__part"))).alias(out_col))
    )
    return cold.unionByName(merged)


@query(
    "variant_semistructured_access",
    oracle="""
    -- twin of the VARIANT path extractions computed straight from the
    -- primitives the JSON was constructed from: if parse_json or any
    -- variant_get path ('$.meta.u', '$.k', '$.tags[1]') misreads the
    -- binary-encoded document, the per-type aggregates diverge.
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(user_id % 100) AS BIGINT) AS sum_u,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           min(reverse(event_type)) AS tag1_min
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_semistructured_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured data (SURVEY F11's
    modern form): nested JSON documents are parsed ONCE into the
    binary-encoded VARIANT type, then every downstream access is a
    typed path extraction (``variant_get``) over the encoded value —
    no re-parse per field, which is the 100 TB reason to land
    semi-structured feeds as variant instead of JSON strings (one
    parse at ingest vs one parse per ``get_json_object`` call; path
    access over the encoding is O(fields on the path)).

    The documents are fabricated JVM-side from event fields (nested
    object + array + numeric leaf), so the oracle can recompute every
    extracted value from the primitives — wrong array indexing, a
    dropped nesting level, or lossy numeric round-trip all
    hash-mismatch."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    doc = F.to_json(
        F.struct(
            F.col("k"),
            F.array(F.col("event_type"), F.reverse(F.col("event_type"))).alias("tags"),
            F.struct((F.col("user_id") % 100).alias("u")).alias("meta"),
        )
    )
    parsed = ev.select(
        "event_type", F.parse_json(doc).alias("v")
    )
    extracted = parsed.select(
        "event_type",
        F.expr("variant_get(v, '$.meta.u', 'bigint')").alias("u"),
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.tags[1]', 'string')").alias("tag1"),
    )
    return (
        extracted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("u").cast("bigint").alias("sum_u"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("tag1").alias("tag1_min"),
        )
        .transform(sorted_output, "event_type")
    )
