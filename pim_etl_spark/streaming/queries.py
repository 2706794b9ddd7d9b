"""Structured Streaming operators (SURVEY §2.8).

The reference's incremental path is a stub that falls back to full sync
(etl/base.py:267-273); here it is a real micro-batch pipeline:
file-source ``readStream`` → event-time window aggregation with a
watermark → sink. The catalog entry executes the stream with an
``availableNow`` trigger into a memory sink, so the driver's oracle can
hash a genuinely stream-computed result.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pim_etl_spark.catalog import query
from pim_etl_spark.operators.entity_resolution import _ER_CTE
from pim_etl_spark.tuning import sorted_output
from pim_etl_spark.sources import (
    _ensure_nanos_conf,
    normalize_event_ts,
    read_parquet_memoized,
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over the events table, normalized
    identically to the batch loader.

    ``readStream`` needs an explicit schema, so the PHYSICAL schema is
    probed from the batch reader rather than hardcoded — the round-2
    bug was a hardcoded LongType-nanos schema that silently divided
    microsecond timestamps by 1000 when the testdata generation
    switched encodings. ``normalize_event_ts`` then applies the same
    conditional unit handling as ``load_table``; the only difference is
    the target type: watermarks require TimestampType (not NTZ), and
    with the session tz pinned to UTC the final NTZ cast in the sink
    query is lossless.
    """
    _ensure_nanos_conf(spark)
    physical = read_parquet_memoized(spark, f"{sf_dir.rstrip('/')}/events.parquet").schema
    raw = (
        spark.readStream.schema(physical)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    return normalize_event_ts(raw, target="timestamp")


def hourly_windowed_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-hour event-time window with a watermark bound on
    state (late rows beyond the watermark are dropped, exactly the
    incremental-sync ``--since`` semantics, etl/orchestrator.py:354-359).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, df: DataFrame, mode: str = "complete", state_partitions: int = 16
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    a memory sink; returns the materialized result table.

    The stateful shuffle width is pinned for the run: a default-config
    session would spin up 200 state-store partitions, which dominates
    wall-clock for bounded replays. (Streaming state partitioning is
    fixed per query at checkpoint creation — on a real cluster size it
    to the live key cardinality.)
    """
    name = f"stream_result_{uuid.uuid4().hex[:8]}"
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.table(name)


def dedup_events_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming deduplication: drop repeat event_ids within the
    watermark horizon (``dropDuplicatesWithinWatermark``) — the
    exactly-once guard an at-least-once feed needs ahead of the
    incremental upsert. State holds one entry per key only until the
    watermark passes it, so memory is bounded by the horizon's key
    cardinality, not the stream's."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


@query(
    "stream_dedup_event_counts",
    oracle="""
    -- batch oracle of the streamed dedup: events are unique by
    -- event_id in the source, so dedup-then-rollup equals the plain
    -- rollup; the STREAM side must prove it drops the duplicates the
    -- test plants ahead of this checked run (tests/test_streaming.py)
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed dropDuplicatesWithinWatermark → per-type rollup,
    executed through the micro-batch engine and hash-checked against
    the batch oracle. (Distinct aggregates aren't allowed in streaming;
    the dedup operator IS the distinct.)"""
    events = stream_events(spark, sf_dir)
    deduped = dedup_events_stream(events)
    counts = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    # TWO chained stateful operators (dedup state on event_id + agg
    # state on event_type) double the per-partition store overhead;
    # the agg side has only a handful of live keys, so 8 partitions
    # measured 5× faster than 16 at test SF with identical results
    result = run_stream_to_memory(spark, counts, mode="complete", state_partitions=8)
    return result.orderBy("event_type")


@query(
    "stream_hourly_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming aggregation, executed for real through the
    micro-batch engine and hash-checked against the batch oracle —
    stream/batch consistency is the Structured Streaming contract."""
    events = stream_events(spark, sf_dir)
    result = run_stream_to_memory(spark, hourly_windowed_counts(events))
    return result.orderBy("window_start", "event_type")


@query(
    "stream_attribution_interval_join",
    oracle="""
    -- batch oracle of the stream-stream interval join: purchases
    -- attributed to the same user's signup within the preceding hour
    SELECT p.event_id AS purchase_id, s.event_id AS signup_id,
           p.user_id AS user_id
    FROM events p JOIN events s
      ON p.user_id = s.user_id
     AND p.event_type = 'purchase' AND s.event_type = 'signup'
     AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR
    ORDER BY purchase_id, signup_id
    """,
)
def stream_attribution_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner interval join (event attribution): each
    purchase joins the same user's signup events from the preceding
    hour. Both sides carry watermarks and the join predicate bounds
    event-time distance, so the state store evicts rows as the
    watermark passes — the canonical watermark-bounded
    stream-stream-join pattern; state is O(events within the horizon),
    not O(stream).

    Executed through the micro-batch engine (availableNow) and
    hash-checked against the batch interval self-join — stream/batch
    consistency for joins.
    """
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    signups = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    joined = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("purchase_id", "signup_id", "user_id")
    # join state is keyed by user_id (tens of keys at test SF): 4
    # state partitions, since each partition carries FOUR state stores
    # per micro-batch (left/right × keyToNumValues/keyWithIndex) and
    # empty stores are pure checkpoint overhead — 16 partitions costs
    # 3.5× the wall-clock of 4 here. A real cluster sizes this to the
    # live user-key cardinality.
    result = run_stream_to_memory(spark, joined, mode="append", state_partitions=4)
    return result.orderBy("purchase_id", "signup_id")


def incremental_upsert_stream(
    spark: SparkSession,
    source_dir: str,
    gold_path: str,
    keys: list[str],
    order_col: str,
    schema: StructType,
) -> None:
    """Incremental sync: readStream over a feed directory, per-batch
    MERGE into the gold table via foreachBatch (SURVEY §2.8 —
    generator/micro-batch pipeline, etl/base.py:233-245).

    Each micro-batch applies ReplaceOne-upsert semantics with the gold
    layer's window dedup; exercised in tests/test_streaming.py.
    """
    import os

    from pim_etl_spark.pipeline.gold import apply_upsert, atomic_overwrite, read_table_recovering

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        # snapshot-dir swap (gold.atomic_overwrite): the merge plan may
        # lazily scan the live gold dir because the whole write lands in
        # a side snapshot first — a crash mid-write leaves the current
        # gold intact, and the only fallback is gold-not-yet-created
        # (other read failures must propagate, not truncate gold).
        if os.path.exists(gold_path) or os.path.exists(gold_path + ".__old__"):
            existing = read_table_recovering(spark, gold_path)
        else:
            existing = spark.createDataFrame([], batch_df.schema)
        merged = apply_upsert(existing, batch_df, keys=keys, order_col=order_col)
        atomic_overwrite(merged, gold_path)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = stream.writeStream.foreachBatch(_merge).trigger(availableNow=True).start()
    q.awaitTermination()


def neardup_gated_ingest(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    schema: StructType,
    jaccard_threshold: float = 0.5,
) -> None:
    """Streaming near-dup admission gate (SURVEY §2.8 × §2.10, round-4
    VERDICT #6): every arriving micro-batch of documents is checked
    against the ALREADY-ADMITTED corpus before it may join it — the
    ingest-time gate a training-data pipeline runs so near-duplicates
    never enter the lake.

    Per batch (foreachBatch, checkpointed so re-runs resume exactly
    where the last trigger stopped):
    1. the batch's banded MinHash signatures bucket-join the PERSISTED
       signature index (``store_dir/band_index.parquet`` — the same
       banded structure ``llm_ops.dedup.banded_signatures`` builds, kept
       as a stored artifact and appended on admit, so batch cost is
       O(batch + collisions), never O(batch × corpus));
    2. collided pairs only are verified with exact shingle Jaccard
       (dedup.gate_against_index);
    3. rejected docs append to ``rejected.parquet`` with their best
       corpus match; admitted docs append to ``corpus.parquet`` AND
       their signatures to the index.

    Durability note: corpus and index are appended in that order; a
    crash between the two can leave admitted docs unindexed (re-admit
    risk for THEIR dups) but never rejects a legitimate document —
    at-least-once admission, the safe failure direction for a dedup
    gate. A transactional table format would close even that window.
    """
    import os

    from pim_etl_spark.llm_ops import dedup

    corpus_path = f"{store_dir}/corpus.parquet"
    index_path = f"{store_dir}/band_index.parquet"
    rejects_path = f"{store_dir}/rejected.parquet"

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(index_path):
            index_sigs = spark.read.parquet(index_path)
            corpus = spark.read.parquet(corpus_path)
            verdicts = dedup.gate_against_index(
                index_sigs, batch_df, corpus, jaccard_threshold
            )
            rejected = verdicts.filter(F.col("is_neardup"))
            rejected.withColumn("rejected_in_batch", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(rejects_path)
            admitted = batch_df.join(
                rejected.select("doc_id").distinct(), "doc_id", "left_anti"
            )
        else:
            admitted = batch_df
        admitted.write.mode("append").parquet(corpus_path)
        dedup.banded_signatures(admitted).select(
            F.col("doc_id").alias("corpus_id"), "band", "band_hash"
        ).write.mode("append").parquet(index_path)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", f"{store_dir}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@query(
    "stream_session_windows",
    oracle="""
    -- batch gaps-and-islands twin of the native streaming
    -- session_window: session_end = last event + the 30-min gap
    -- (session_window's close semantics); microsecond arithmetic for
    -- exact gap comparison on both engines
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
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
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_start
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (``F.session_window``, 30-min
    inactivity gap) executed for real through the micro-batch engine
    and hash-checked against the batch gaps-and-islands twin — the
    strongest stream/batch-consistency proof in the catalog alongside
    ``stream_hourly_event_counts``. State is per (user, open session)
    and evicted as the watermark closes sessions; at scale the state
    store shuffle is keyed by user_id, so skewed power-users are the
    knob to watch (AQE does not re-plan stateful exchanges)."""
    from pim_etl_spark.streaming.stateful import sessionized_events_stream

    events = stream_events(spark, sf_dir)
    sess = sessionized_events_stream(events, gap="30 minutes", watermark="1 day")
    result = run_stream_to_memory(spark, sess, mode="complete", state_partitions=8)
    return result.orderBy("user_id", "session_start")


@query(
    "stream_latest_event_per_user",
    oracle="""
    -- batch twin of the arbitrary-stateful keep-latest operator:
    -- last event per user under the total (ts, event_id) order
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           event_type AS last_event_type, value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def stream_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming (applyInPandasWithState) under the
    driver's hash gate: continuous keep-latest-event-per-user, executed
    through the micro-batch engine and checked against the batch
    ROW_NUMBER dedup. The memory sink is append-only, so the update-
    mode emissions are folded with the same (ts, event_id) order an
    upsert sink would apply per key — with availableNow over one file
    that fold is a no-op, but it keeps the entry correct if the replay
    ever splits into multiple micro-batches."""
    from pyspark.sql import Window

    from pim_etl_spark.streaming.stateful import latest_event_per_user_stream

    events = stream_events(spark, sf_dir)
    latest = latest_event_per_user_stream(events)
    result = run_stream_to_memory(spark, latest, mode="update", state_partitions=8)
    w = Window.partitionBy("user_id").orderBy(F.desc("last_ts"), F.desc("last_event_id"))
    return (
        result.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("last_ts").cast("timestamp_ntz").alias("last_ts"),
            "last_event_id",
            "last_event_type",
            "last_value",
        )
        .orderBy("user_id")
    )


@query(
    "stream_static_enrich_join",
    oracle="""
    -- batch twin of the stream-static enrichment join
    SELECT n.n_name AS nation, c.c_mktsegment AS mktsegment,
           e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def stream_static_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: a streamed fact (events) enriched against a
    static dimension (customer⋈nation) inside the micro-batch engine,
    then aggregated — the canonical Structured Streaming enrichment
    pattern (reference analogue: the cached side-data getters applied
    during incremental sync, /root/reference/etl/base.py:198-243, here
    executed per micro-batch instead of per row).

    Scale notes: the static side is broadcast, so the join is
    stateless — no join state store, no watermark requirement; the only
    stateful operator is the final aggregation, whose state is bounded
    by the (nation, segment, event_type) key domain, not the event
    volume. Spark re-resolves the static side per micro-batch, so on a
    long-running cluster the dimension can be refreshed by swapping the
    underlying files without restarting the query.
    """
    from pim_etl_spark.sources import load_table

    events = stream_events(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("c_custkey"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )
    enriched = events.join(F.broadcast(dim), events.user_id == dim.c_custkey)
    agg = enriched.groupBy("nation", "mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    result = run_stream_to_memory(spark, agg, mode="complete", state_partitions=8)
    return result.orderBy("nation", "mktsegment", "event_type")


def versioned_upsert_stream(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    keys: list[str],
    order_col: str,
    schema: StructType,
    checkpoint_dir: str,
    app_id: str = "versioned-upsert-stream",
    expectations=None,
    on_violation: str = "drop",
) -> None:
    """Exactly-once streaming MERGE into the manifest-versioned store:
    foreachBatch → ``merge_files_txn`` with the micro-batch id as the
    transaction version.

    foreachBatch alone is at-least-once — after a sink failure or a
    restart from checkpoint the engine RE-DELIVERS the last batch. The
    (app_id, batch_id) watermark rides in the SAME atomic manifest
    commit as the data, so a replayed batch is detected and skipped —
    data and replay state can never disagree (Delta's
    txnAppId/txnVersion pattern on our commit log). One snapshot per
    micro-batch also gives streaming-time time travel for free.
    """
    from pim_etl_spark.pipeline.versioned import last_txn_version, merge_files_txn

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if expectations is not None:
            # streaming Write-Audit-Publish: quarantine (or fail) the
            # batch BEFORE the transactional commit; the replay guard
            # still applies because the audited merge commits through
            # the same manifest (txn recorded below via merge_files_txn
            # path only when clean)
            from pim_etl_spark.pipeline.expectations import audit, split_row_violations

            if batch_id <= last_txn_version(table_path, app_id):
                return  # replay — nothing to audit or commit
            verdict = audit(batch_df, expectations)
            if not verdict["passed"]:
                if on_violation == "fail":
                    raise ValueError(f"stream audit failed: {verdict['violations']}")
                batch_df, _dirty = split_row_violations(batch_df, expectations)
        merge_files_txn(
            spark,
            table_path,
            batch_df,
            keys=keys,
            order_col=order_col,
            app_id=app_id,
            txn_version=batch_id,
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@query(
    "stream_change_feed_counts",
    oracle="""
    -- closed-form twin of the change-feed STREAM: v1 = bootstrap
    -- (pre-1998 scoped orders), v2 = MERGE of post-1998 INSERTS —
    -- no key collisions, so copy-on-write rewrites nothing and v2's
    -- added files are exactly the inserts. Re-emitted carried files,
    -- wrong offsets, or missed commits all break the counts.
    WITH scoped AS (
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      WHERE o_orderkey % 4 = 1
    )
    SELECT CAST(1 AS BIGINT) AS commit_version,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(o_totalprice), 2) AS total_price
    FROM scoped WHERE o_orderdate < DATE '1998-01-01'
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
           round(sum(o_totalprice), 2)
    FROM scoped WHERE o_orderdate >= DATE '1998-01-01'
    ORDER BY commit_version
    """,
)
def stream_change_feed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `pim_changefeed` streaming source under the hash gate: a
    two-commit store is consumed AS A STREAM (snapshot-number offsets,
    per-added-file partitions, executor-side Arrow batches) and rolled
    up per commit. The single-file layout makes each commit's added
    rows closed-form, so the oracle pins the source's exact delta
    semantics (insert-only merges add ONLY the insert rows — the
    copy-on-write no-rewrite fast path made observable)."""
    import tempfile

    from pim_etl_spark import sources_custom
    from pim_etl_spark.pipeline import versioned as V
    from pim_etl_spark.sources import load_table

    sources_custom.register(spark)
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .filter(F.col("o_orderkey") % 4 == 1)
    )
    tbl = tempfile.mkdtemp(prefix="pim-cfstream-")
    try:
        pre = orders.filter(F.col("o_orderdate") < "1998-01-01").drop("o_orderdate")
        V.commit_snapshot(pre.coalesce(1), tbl, op="bootstrap")
        V.merge_files(
            spark,
            tbl,
            orders.filter(F.col("o_orderdate") >= "1998-01-01").drop("o_orderdate"),
            keys=["o_orderkey"],
            order_col="o_totalprice",
        )
        stream = spark.readStream.format("pim_changefeed").option("path", tbl).load()
        agg = stream.groupBy(F.col("_commit_version").alias("commit_version")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        result = run_stream_to_memory(spark, agg, mode="complete", state_partitions=4)
        rows = [
            (r["commit_version"], r["n_rows"], float(r["total_price"]))
            for r in result.collect()
        ]
    finally:
        import shutil

        shutil.rmtree(tbl, ignore_errors=True)
    return spark.createDataFrame(
        rows, "commit_version bigint, n_rows bigint, total_price double"
    ).orderBy("commit_version")


@query(
    "stream_left_outer_attribution",
    oracle="""
    -- batch twin of the watermarked stream-stream LEFT OUTER join:
    -- every purchase row appears exactly once per matching signup in
    -- the preceding hour, or once with signup_id NULL if none matched
    SELECT p.event_id AS purchase_id, s.event_id AS signup_id,
           p.user_id AS user_id,
           s.event_id IS NOT NULL AS attributed
    FROM events p LEFT JOIN events s
      ON p.user_id = s.user_id
     AND s.event_type = 'signup'
     AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    ORDER BY purchase_id, signup_id
    """,
)
def stream_left_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantics corner
    inner joins dodge: an unmatched left row may only emit its
    null-extended result once the watermark proves no future right row
    can match, i.e. at state eviction, not at arrival.

    Outer-join completeness gotcha: rows within the watermark delay of
    the stream's end NEVER emit their null results (the engine cannot
    prove absence). To make the bounded replay total — and therefore
    equal to the batch LEFT JOIN twin — each side is unioned with a
    far-future sentinel row, pushing the final watermark past all real
    data so every pending left row flushes.

    The sentinels must be real 'purchase'/'signup' rows (negative ids,
    dropped from the BATCH result after the stream materializes):
    Catalyst pushes the event_type filter below the EventTimeWatermark
    node into the file scans, so a distinct 'flush' event type would be
    filtered at the scan and never advance the watermark — silently
    reintroducing the withheld-tail bug this entry exists to pin.
    State is watermark-bounded exactly as in the inner variant.
    """
    import datetime
    import tempfile

    ev = stream_events(spark, sf_dir)
    sent_dir = tempfile.mkdtemp(prefix="flush_sentinel_")
    far_future = datetime.datetime(2035, 1, 1)
    sentinel = spark.createDataFrame(
        [
            (int(-1), far_future, int(-1), "purchase", 0.0, "{}"),
            (int(-2), far_future, int(-1), "signup", 0.0, "{}"),
        ],
        ev.schema,
    )
    sentinel.write.mode("overwrite").parquet(sent_dir)

    def _side() -> DataFrame:
        flush = spark.readStream.schema(ev.schema).parquet(sent_dir)
        return stream_events(spark, sf_dir).unionByName(flush)

    purchases = (
        _side()
        .withWatermark("ts", "1 hour")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    signups = (
        _side()
        .withWatermark("ts", "1 hour")
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("s_ts"),
        )
    )
    joined = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "purchase_id",
        "signup_id",
        "user_id",
        F.col("signup_id").isNotNull().alias("attributed"),
    )
    result = run_stream_to_memory(spark, joined, mode="append", state_partitions=4)
    # the sentinel purchase joins only the sentinel signup; dropping it
    # HERE (batch side) is safe — the memory table is fully
    # materialized, so no pushdown can starve the watermark anymore
    return result.filter(F.col("purchase_id") >= 0).orderBy("purchase_id", "signup_id")


def scd2_upsert_stream(
    spark: SparkSession,
    source_dir: str,
    history_path: str,
    key: str,
    attr: str,
    ts_col: str,
    seq_col: str,
    schema: StructType,
) -> None:
    """Streaming SCD Type 2 maintenance: readStream over a fact feed,
    each micro-batch folded into the versioned history table via
    ``scd2_apply_batch`` (foreachBatch — the generator/micro-batch
    sync loop of the reference, producing HISTORY instead of
    keep-latest state).

    Content-idempotent under replay: re-applying a batch re-collapses
    the same runs onto already-updated open intervals and merges
    byte-identical rows, so checkpoint-loss re-delivery cannot corrupt
    the dimension (the equal-attribute extension path is a fixpoint).
    In-order delivery per key is assumed, as in every SCD2 loader —
    the file source's ordered batches provide it for a feed directory.
    """
    from pim_etl_spark.operators.warehouse import scd2_apply_batch

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scd2_apply_batch(
            spark, history_path, batch_df,
            key=key, attr=attr, ts_col=ts_col, seq_col=seq_col,
            batch_no=batch_id + 1,
        )

    # checkpoint lives OUTSIDE the source dir (a file source lists
    # everything under its path; checkpoint files are not feed data)
    checkpoint = f"{history_path.rstrip('/')}_checkpoint"
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@query(
    "stream_cep_pattern_totals",
    oracle="""
    -- batch twin of the streaming CEP state machine: identical
    -- layered-window semantics to cep_pattern_error_reset, so the
    -- micro-batch execution must reproduce the batch answer exactly
    -- (the stream/batch consistency contract, on an ARBITRARY-STATE
    -- operator rather than a built-in aggregation)
    WITH numbered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type, rn,
             coalesce(max(CASE WHEN event_type = 'error' THEN rn END)
                 OVER w2, 0) AS last_err,
             coalesce(max(CASE WHEN event_type = 'view' THEN rn END)
                 OVER w2, 0) AS last_view
      FROM numbered
      WINDOW w2 AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    clicks AS (
      SELECT *,
             coalesce(max(CASE WHEN event_type = 'click'
                               AND last_view > last_err THEN rn END)
                 OVER (PARTITION BY user_id ORDER BY rn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 0) AS last_valid_click
      FROM seq
    )
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS n_purchases,
           CAST(count(*) FILTER (WHERE event_type = 'purchase'
                                 AND last_valid_click > last_err) AS BIGINT)
               AS n_converted
    FROM clicks
    GROUP BY user_id
    HAVING count(*) FILTER (WHERE event_type = 'purchase') > 0
    ORDER BY user_id
    """,
)
def stream_cep_pattern_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CEP under the hash gate: the view → click → purchase
    (error-resets) pattern matcher as an arbitrary-stateful operator
    (applyInPandasWithState), executed through the micro-batch engine
    and checked against the batch layered-window oracle. Update-mode
    emissions are folded keep-latest per user (totals are monotone, so
    max = latest) to stay correct if the replay splits into multiple
    micro-batches."""
    from pim_etl_spark.streaming.stateful import cep_pattern_stream

    events = stream_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    totals = cep_pattern_stream(events)
    result = run_stream_to_memory(spark, totals, mode="update", state_partitions=8)
    return (
        result.groupBy("user_id")
        .agg(
            F.max("n_purchases").alias("n_purchases"),
            F.max("n_converted").alias("n_converted"),
        )
        .orderBy("user_id")
    )


@query(
    "stream_sink_exactly_once",
    oracle="""
    -- closed-form twin of streaming INTO the custom two-phase-commit
    -- sink: the change feed of a two-commit store (bootstrap +
    -- insert-only merge on the %4=3 slice) drains through the
    -- pim_export stream sink, is read back through the per-batch
    -- manifests, and re-aggregated per commit. A sink that loses a
    -- task's part, double-publishes a replayed batch, or mixes staged
    -- files into the read path shifts a count or a sum here.
    WITH scoped AS (
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      WHERE o_orderkey % 4 = 3
    )
    SELECT CAST(1 AS BIGINT) AS commit_version,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS total_price
    FROM scoped WHERE o_orderdate < DATE '1998-01-01'
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
           round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
    FROM scoped WHERE o_orderdate >= DATE '1998-01-01'
    ORDER BY commit_version
    """,
)
def stream_sink_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom STREAMING sink under the hash gate — closing the
    fourth quadrant of the Python DataSource surface (batch read:
    pim_feed; stream read: pim_changefeed; batch write + stream write:
    pim_export). The change feed streams through
    ``writeStream.format("pim_export")`` with a checkpoint; each
    micro-batch two-phase-commits an atomic ``_MANIFEST-<batch>.json``
    (replay replaces, never appends). The entry reads the export back
    THROUGH the manifests and the per-commit aggregate must hash-equal
    the closed-form twin."""
    import shutil
    import tempfile

    from pim_etl_spark import sources_custom
    from pim_etl_spark.pipeline import versioned as V
    from pim_etl_spark.sources import load_table

    sources_custom.register(spark)
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .filter(F.col("o_orderkey") % 4 == 3)
    )
    tbl = tempfile.mkdtemp(prefix="pim-sinksrc-")
    out = tempfile.mkdtemp(prefix="pim-sinkout-")
    cp = tempfile.mkdtemp(prefix="pim-sinkcp-")
    try:
        pre = orders.filter(F.col("o_orderdate") < "1998-01-01").drop("o_orderdate")
        V.commit_snapshot(pre.coalesce(1), tbl, op="bootstrap")
        V.merge_files(
            spark,
            tbl,
            orders.filter(F.col("o_orderdate") >= "1998-01-01").drop("o_orderdate"),
            keys=["o_orderkey"],
            order_col="o_totalprice",
        )
        stream = spark.readStream.format("pim_changefeed").option("path", tbl).load()
        q = (
            stream.writeStream.format("pim_export")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        files, _ = sources_custom.read_stream_export(spark, out)
        back = spark.read.schema(
            "o_orderkey bigint, o_totalprice double, "
            "_commit_version bigint, _commit_op string"
        ).json(files)
        rows = [
            (r["commit_version"], r["n_rows"], float(r["total_price"]))
            for r in back.groupBy(
                F.col("_commit_version").alias("commit_version")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
                ).alias("total_price"),
            )
            .collect()
        ]
    finally:
        shutil.rmtree(tbl, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(cp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "commit_version bigint, n_rows bigint, total_price double"
    ).orderBy("commit_version")


@query(
    "stream_windowed_topk",
    oracle="""
    -- batch twin of the streamed per-window top-k: 6-hour tumbling
    -- windows, top-3 event types by (count DESC, type ASC)
    WITH wc AS (
      SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
             event_type, count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY window_start
                    ORDER BY n_events DESC, event_type ASC) AS rk
          FROM wc)
    WHERE rk <= 3
    ORDER BY window_start, rk
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per event-time window over a stream — the trending-items
    verb. Structured Streaming cannot rank inside a streaming agg
    (window functions aren't incremental), so this runs the STANDARD
    two-phase production shape: phase 1 is the genuinely streaming
    part — watermarked tumbling-window counts through the micro-batch
    engine (state: one row per live window×type); phase 2 ranks the
    window-sized aggregate at the sink (the step a foreachBatch writer
    would do per trigger, here on the completed availableNow replay).
    The ranking input is already aggregate-sized — windows × types,
    never event-sized — which is what makes sink-side ranking the
    scalable shape rather than a concession."""
    from pyspark.sql import Window

    events = stream_events(spark, sf_dir)
    counts = (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    agg = run_stream_to_memory(spark, counts, mode="complete", state_partitions=8)
    rk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
    )
    return (
        agg.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .orderBy("window_start", "rk")
    )


@query(
    "stream_er_admission",
    oracle="""
    -- batch twin of the streamed MDM admission gate: source-B records
    -- link against the A+C golden index (same blocking + scoring +
    -- per-record argmax as er_incremental_link), rolled up per ingest
    -- chunk (pk % 3 — the file an incoming record streams in with)
    WITH """ + _ER_CTE + """,
    bm AS (
      SELECT rec_a, rec_b FROM scored
      WHERE score >= 70
        AND substr(rec_a, 1, 1) <> 'B' AND substr(rec_b, 1, 1) <> 'B'
    ),
    bnodes AS (SELECT rec_id FROM norm WHERE substr(rec_id, 1, 1) <> 'B'),
    badj AS (
      SELECT rec_a AS u, rec_b AS v FROM bm
      UNION ALL SELECT rec_b, rec_a FROM bm
      UNION ALL SELECT rec_id, rec_id FROM bnodes
    ),
    bl0 AS (SELECT rec_id, rec_id AS lbl FROM bnodes),
    bl1 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM badj a JOIN bl0 p ON a.v = p.rec_id GROUP BY 1),
    bl2 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM badj a JOIN bl1 p ON a.v = p.rec_id GROUP BY 1),
    bl3 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM badj a JOIN bl2 p ON a.v = p.rec_id GROUP BY 1),
    il AS (
      SELECT CASE WHEN substr(rec_a, 1, 1) = 'B' THEN rec_a ELSE rec_b END AS rec_id,
             CASE WHEN substr(rec_a, 1, 1) = 'B' THEN rec_b ELSE rec_a END AS base_rec,
             score
      FROM scored
      WHERE (substr(rec_a, 1, 1) = 'B') <> (substr(rec_b, 1, 1) = 'B')
    ),
    linked AS (
      SELECT i.rec_id,
             max(i.score) AS best_score,
             min_by(l.lbl, lpad(CAST(100 - i.score AS VARCHAR), 3, '0') || l.lbl) AS best_cluster
      FROM il i JOIN bl3 l ON i.base_rec = l.rec_id
      GROUP BY 1
    ),
    b AS (
      SELECT n.rec_id, n.pk % 3 AS chunk, l.lbl AS true_cluster
      FROM norm n JOIN bl3 l ON l.rec_id = 'A' || CAST(n.pk AS VARCHAR)
      WHERE substr(n.rec_id, 1, 1) = 'B'
    )
    SELECT b.chunk,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(CASE WHEN k.best_score >= 70 THEN 1 ELSE 0 END) AS BIGINT) AS n_linked,
           CAST(sum(CASE WHEN k.best_score >= 70 THEN 0 ELSE 1 END) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN k.best_score >= 70 AND k.best_cluster = b.true_cluster
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM b LEFT JOIN linked k ON b.rec_id = k.rec_id
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_er_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MDM admission: incoming source-B records arrive as a
    file stream (three chunk files, replayed through the micro-batch
    engine) and link against the STATIC golden index — records arrive
    pre-stamped with their capped blocking keys (the ingest edge owns
    key stamping, using the block-split metadata published with the
    index; entity_resolution.BLOCK_CAP), features and the match score
    evaluate inside the stream-static join, and one streaming
    aggregation takes the per-record argmax
    (max score; ties to the smaller cluster via a struct min — no
    window needed, so it IS streamable). The per-chunk rollup happens
    at the sink on aggregate-sized rows (stream_windowed_topk's
    two-phase shape). This is er_incremental_link running as a
    continuous admission gate: state is one row per in-flight record,
    and the golden index is the broadcast side, exactly how a
    1000-executor deployment would pin it."""
    import shutil
    import tempfile

    from pim_etl_spark.operators.entity_resolution import (
        MATCH_THRESHOLD,
        base_cluster_labels,
        blocking_keys,
        dirty_records,
        match_features,
        scored_pairs,
    )

    norm = dirty_records(spark, sf_dir).cache()
    is_b = F.substring("rec_id", 1, 1) == "B"
    # the admission gate consumes base–base pairs only (index build);
    # the incoming side scores in-stream — skip both B–B and one-B
    # pair scoring here (output-identical prune, see scored_pairs)
    not_b_pair = (F.substring("rec_a", 1, 1) != "B") & (
        F.substring("rec_b", 1, 1) != "B"
    )
    scored = scored_pairs(spark, sf_dir, norm=norm, cand_filter=not_b_pair)
    lbl = base_cluster_labels(norm, scored)
    base = norm.filter(~is_b)
    # capped blocking keys over the FULL record set (the block-size
    # cap's sub-bucket count derives from whole-block sizes — the
    # deployment publishes that block-split metadata with the index,
    # and the ingest edge stamps each incoming record's sub-bucketed
    # keys before it enters the stream; see entity_resolution.BLOCK_CAP)
    keys = blocking_keys(norm).cache()
    # static join side: base blocking keys + features + cluster label,
    # feature columns prefixed b_
    # NOTE (r12): localCheckpoint(eager=True) for static_side and a
    # .cache() on incoming were both tried to cut per-micro-batch
    # replanning — measured a 30-40% REGRESSION at sf0.1: materializing
    # array<string>-bearing rows (tset) through either store costs more
    # than the replanning saves. Left as the original cached plan.
    static_side = (
        keys.join(base, "rec_id")
        .join(lbl, "rec_id")
        .select(
            "bkey",
            F.col("lbl"),
            F.col("nname").alias("b_nname"),
            F.col("tset").alias("b_tset"),
            F.col("cents").alias("b_cents"),
            F.col("psize").alias("b_psize"),
            F.col("bdig").alias("b_bdig"),
            F.col("ptype").alias("b_ptype"),
        )
        .cache()
    )
    # incoming rows arrive pre-keyed (one row per record x blocking
    # key) — the in-stream work is the bkey equi-join + argmax only
    incoming = keys.join(norm.filter(is_b), "rec_id").select(
        "rec_id",
        (F.col("pk") % 3).cast("int").alias("chunk"),
        "bkey",
        "nname",
        "tset",
        "cents",
        "psize",
        "bdig",
        "ptype",
    )
    tmp = tempfile.mkdtemp(prefix="pim-eradmit-")
    try:
        for i in range(3):
            incoming.filter(F.col("chunk") == i).coalesce(1).write.mode("append").parquet(tmp)
        stream = (
            spark.readStream.schema(incoming.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        fx = match_features("", "b_")
        pick = F.struct(
            (F.lit(100) - fx["score"]).alias("inv"), F.col("lbl").alias("lbl")
        )
        per_rec = (
            stream.join(static_side, "bkey")
            .select("rec_id", "chunk", fx["score"].alias("score"), pick.alias("pick"))
            .groupBy("rec_id", "chunk")
            .agg(F.max("score").alias("best_score"), F.min("pick").alias("pick"))
        )
        sunk = run_stream_to_memory(spark, per_rec, mode="complete", state_partitions=8)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    matched = F.col("best_score") >= MATCH_THRESHOLD
    truth = (
        norm.filter(is_b)
        .select(
            "rec_id",
            (F.col("pk") % 3).cast("int").alias("chunk"),
            F.concat(F.lit("A"), F.col("pk").cast("string")).alias("a_twin"),
        )
        .join(
            lbl.select(F.col("rec_id").alias("a_twin"), F.col("lbl").alias("true_cluster")),
            "a_twin",
        )
    )
    return (
        truth.join(sunk.select("rec_id", "best_score", F.col("pick.lbl").alias("best_cluster")), "rec_id", "left")
        .groupBy("chunk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(F.when(matched, 1).otherwise(0)).cast("long").alias("n_linked"),
            F.sum(F.when(matched, 0).otherwise(1)).cast("long").alias("n_new"),
            F.sum(
                F.when(matched & (F.col("best_cluster") == F.col("true_cluster")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .transform(sorted_output, "chunk")
    )


@query(
    "stream_volume_anomaly",
    oracle="""
    -- batch twin of the streamed ingest monitor: per-day event counts
    -- (the genuinely streamed part), then the trailing-7-day spike
    -- rule on the day-sized aggregate: a full-history day fires when
    -- 7 * n > 2 * trailing7_sum (division-free, cold-start safe)
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    trail AS (
      SELECT day, n,
             CAST(sum(n) OVER (ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS t7,
             CAST(count(*) OVER (ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS t7_days
      FROM daily
    )
    SELECT day, n, t7,
           CASE WHEN 7 * n > 2 * t7 THEN 1 ELSE 0 END AS is_spike
    FROM trail
    WHERE t7_days = 7
    ORDER BY day
    """,
)
def stream_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed ingest-volume monitoring: daily event counts flow
    through the micro-batch engine (watermarked 1-day tumbling
    windows — the genuinely streaming stage, state = one row per live
    day), and the trailing-7-day spike rule evaluates at the sink over
    the day-sized aggregate (the stream_windowed_topk two-phase shape
    — trailing windows aren't incremental, day-sized rows are). Rule
    is volume_spike_detection's division-free 7·n > 2·Σ, cold-start
    safe (full trailing weeks only). This is the alerting loop an
    ingest pipeline runs continuously; batch/stream consistency is
    the gate."""
    events = stream_events(spark, sf_dir)
    daily = (
        events.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("day"), "n")
    )
    sunk = run_stream_to_memory(spark, daily, mode="complete", state_partitions=8)
    from pyspark.sql import Window

    w7 = Window.orderBy("day").rowsBetween(-7, -1)
    trail = sunk.select(
        "day",
        "n",
        F.sum("n").over(w7).cast("long").alias("t7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("t7_days"),
    )
    return (
        trail.filter(F.col("t7_days") == 7)
        .select(
            "day",
            "n",
            "t7",
            (7 * F.col("n") > 2 * F.col("t7")).cast("int").alias("is_spike"),
        )
        .orderBy("day")
    )
