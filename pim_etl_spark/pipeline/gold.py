"""Gold-layer table maintenance: upsert, delete, retention, backup,
stats (SURVEY §2.1 S11–S16, §2.4 A1–A3).

The reference loads into MongoDB with bulk ``ReplaceOne`` upserts
(etl/loaders/mongodb_loader.py:93-197); on Spark-without-Delta the same
semantics are a union + keep-latest-per-key window dedup, written back
partition-aware. All functions are pure DataFrame→DataFrame so they
compose and stay testable without a metastore.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_latest(
    unioned: DataFrame, keys: Sequence[str], order_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Keep the highest-``order_col`` row per key — ReplaceOne-upsert
    semantics (SURVEY W1/S11).

    One hash shuffle on ``keys``; at 100 TB bucket the gold table by the
    same keys so repeat syncs reuse the partitioning (SURVEY §4).
    """
    order = [F.col(order_col).desc()] + [F.col(t).desc() for t in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return unioned.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def apply_upsert(existing: DataFrame, incoming: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """MERGE INTO equivalent: incoming rows replace matching existing
    rows, unmatched incoming rows are inserted (S11/S12)."""
    tagged = existing.withColumn("__src", F.lit(0)).unionByName(incoming.withColumn("__src", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(F.col("__src").desc(), F.col(order_col).desc())
    return tagged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn", "__src")


def delete_by_ids(df: DataFrame, key: str, ids: Sequence) -> DataFrame:
    """delete_many({key: {$in: ids}}) → anti-filter (SURVEY S13,
    etl/loaders/mongodb_loader.py:226-245)."""
    return df.filter(~F.col(key).isin(list(ids)))


def cleanup_old(df: DataFrame, supplier_col: str, supplier_id: str, ts_col: str, cutoff) -> DataFrame:
    """Retention delete: drop rows of one supplier older than cutoff
    (SURVEY S14, etl/loaders/mongodb_loader.py:320-337)."""
    doomed = (F.col(supplier_col) == supplier_id) & (F.col(ts_col) < F.lit(cutoff))
    return df.filter(~doomed)


def backup(df: DataFrame, path: str) -> None:
    """$out-style snapshot copy (SURVEY S15): CTAS to a parquet path."""
    df.write.mode("overwrite").parquet(path)


def collection_stats(df: DataFrame, group_cols: Sequence[str] = ("supplier_id",)) -> DataFrame:
    """get_collection_stats (SURVEY A1–A3): per-group doc counts."""
    return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("count")).orderBy(*group_cols)


def write_gold(df: DataFrame, path: str, partition_by: Sequence[str] = ("supplier_id",)) -> None:
    """Write the gold table partitioned by supplier (low-cardinality
    partition column — SURVEY §4 100 TB note: combine with a date
    column for real feeds)."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


_OLD_SUFFIX = ".__old__"
_SNAP_SUFFIX = ".__snapshot__"


def atomic_overwrite(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """Overwrite ``path`` via snapshot-dir swap so a mid-write failure
    can never destroy the current table.

    The whole (expensive) write lands in a side snapshot dir first —
    the live table stays untouched and readable throughout, and the
    plan may lazily scan ``path`` itself (no localCheckpoint needed,
    the scan completes before any rename). The swap is two directory
    renames; ``read_table_recovering`` heals the microsecond-wide
    window between them. On an object store this maps to the same
    pattern with a manifest/pointer commit (or Delta/Iceberg).
    """
    snap = path + _SNAP_SUFFIX
    old = path + _OLD_SUFFIX
    shutil.rmtree(snap, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snap)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(snap, path)
    shutil.rmtree(old, ignore_errors=True)


def read_table_recovering(spark: SparkSession, path: str) -> DataFrame:
    """Read a swap-managed table, healing an interrupted swap: if the
    live dir is missing but the prior snapshot survives, restore it."""
    old = path + _OLD_SUFFIX
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    return spark.read.parquet(path)


def merge_partitioned(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str,
    partition_col: str = "supplier_id",
) -> dict:
    """Partition-scoped MERGE (round 4): incremental upsert that
    rewrites ONLY the partitions the incoming batch touches — the
    Delta-less answer to the full-table-rewrite cost of
    ``atomic_overwrite`` at 100 TB (reference MERGE semantics:
    etl/loaders/mongodb_loader.py:93-197).

    The table is laid out as standard Spark partition dirs
    (``path/<partition_col>=<v>/``). Per sync:
    1. the affected partition values are the batch's distinct
       ``partition_col`` values (a supplier-count-sized collect);
    2. each affected partition is merged (``apply_upsert`` window
       dedup over existing ∪ batch-slice) and swapped atomically via
       the same snapshot-dir protocol as ``atomic_overwrite``;
    3. untouched partitions are not read, not rewritten, not renamed.

    Sync cost is O(touched partitions + batch), not O(table): with the
    gold layout partitioned by (supplier, ingest date), a daily
    supplier sync rewrites one date-slice, not 100 TB. Atomicity is
    per partition — a crash mid-loop leaves every partition either
    fully old or fully new, and the merge is idempotent so a re-run
    converges. Delta/Iceberg refine the same idea to file granularity
    with a manifest commit; this is the partition-granular form that
    needs nothing beyond a filesystem rename.

    Keys must not move across partitions (a key's partition value is
    immutable — true for supplier-owned product ids). Returns
    {partitions_touched, partitions_total} for observability.
    """
    affected = [r[0] for r in incoming.select(partition_col).distinct().collect()]
    for v in sorted(affected):
        part_dir = f"{path}/{partition_col}={v}"
        old = part_dir + _OLD_SUFFIX
        # heal a swap interrupted exactly between the two renames
        if not os.path.exists(part_dir) and os.path.exists(old):
            os.rename(old, part_dir)
        batch_v = incoming.filter(F.col(partition_col) == v).drop(partition_col)
        if os.path.exists(part_dir):
            existing_v = spark.read.parquet(part_dir)
            merged_v = apply_upsert(existing_v, batch_v, keys=keys, order_col=order_col)
        else:
            # bootstrap partition: dedup within the batch itself
            os.makedirs(path, exist_ok=True)
            merged_v = upsert_latest(batch_v, keys=keys, order_col=order_col)
        atomic_overwrite(merged_v, part_dir)
    total = sum(
        1
        for d in (os.listdir(path) if os.path.exists(path) else [])
        if d.startswith(f"{partition_col}=") and not d.endswith((_OLD_SUFFIX, _SNAP_SUFFIX))
    )
    return {"partitions_touched": len(affected), "partitions_total": total}


def write_bucketed_gold(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    path: str,
    n_buckets: int = 16,
    pre_partition: bool = True,
) -> None:
    """Write the gold table BUCKETED by its merge keys (SURVEY §4's
    100 TB note; reference intent: the unique product_id index,
    /root/reference/schemas/unified_product_schema.py:229-248).

    Bucketing persists the hash partitioning INTO the table layout:
    every subsequent merge/join/window on ``keys`` reads the table
    already clustered, so the repeat sync — the operation a PIM gold
    store runs forever — stops paying a full-table Exchange per sync
    (``upsert_latest``'s one-shuffle cost note). External table: data
    lives at ``path``, the catalog entry carries the bucket spec.

    ``pre_partition`` repartitions by the bucket expression first so
    each task holds exactly one bucket → one file per bucket (without
    it, every task writes a file per bucket it sees — n_tasks ×
    n_buckets small files). Callers whose input is ALREADY hash-
    partitioned on ``keys`` (the bucketed-merge output) pass False and
    skip that exchange too."""
    out = df.repartition(n_buckets, *[F.col(k) for k in keys]) if pre_partition else df
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        out.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def merge_bucketed(existing: DataFrame, incoming: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """MERGE formulated as a full-outer JOIN instead of union+window,
    so a bucketed ``existing`` side contributes its layout: both sides
    clustered on ``keys`` → sort-merge join with ZERO Exchange (the
    union+window ``apply_upsert`` destroys partitioning in the union
    and re-shuffles everything, table included, every sync).

    Incoming rows win wholesale (ReplaceOne semantics — same outcome
    as ``apply_upsert``'s __src ordering); the batch is first deduped
    to latest-per-key with ``upsert_latest``, which over a bucketed
    staged batch is itself exchange-free."""
    inc = upsert_latest(incoming, keys=keys, order_col=order_col)
    val_cols = [c for c in existing.columns if c not in keys]
    inc_pref = inc.select(
        *keys,
        *[F.col(c).alias(f"__new_{c}") for c in val_cols],
        F.lit(1).alias("__has_new"),
    )
    return existing.join(inc_pref, list(keys), "full_outer").select(
        *keys,
        *[
            F.when(F.col("__has_new") == 1, F.col(f"__new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in val_cols
        ],
    )


def sync_bucketed_gold(
    spark: SparkSession,
    table: str,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str,
    base_dir: str,
    n_buckets: int = 16,
) -> dict:
    """One repeat-sync cycle against a bucketed gold table — the
    shuffle-free steady state (VERDICT r4 #3):

    1. stage the batch as a bucketed table (cost O(batch): the ONLY
       hash exchange in the cycle is the batch's own bucketing write);
    2. ``merge_bucketed`` both tables — co-bucketed SMJ, zero
       Exchange on 100 TB of table data;
    3. write the merge output as the next generation WITHOUT
       repartitioning (SMJ output is already hash-partitioned on
       ``keys`` → one file per bucket falls out for free) and swap the
       catalog pointer (DROP + RENAME — metadata-only on external
       tables, same role as the manifest swap in versioned.py).

    First call bootstraps the table. Generations live under
    ``base_dir/gen-N``; the previous generation's files stay for
    readers mid-swap (vacuum-equivalent cleanup is the caller's
    retention policy). Returns {generation, merged_plan} where
    merged_plan is the executed merge plan string — callers and tests
    assert the no-Exchange property on it."""
    import uuid as _uuid

    exists = spark.catalog.tableExists(table)
    if not exists:
        boot = upsert_latest(incoming, keys=keys, order_col=order_col)
        write_bucketed_gold(
            spark, boot, table, keys, path=os.path.join(base_dir, "gen-1"), n_buckets=n_buckets
        )
        return {"generation": 1, "merged_plan": ""}

    stage = f"{table}__stage_{_uuid.uuid4().hex[:8]}"
    stage_dir = os.path.join(base_dir, f"stage-{_uuid.uuid4().hex[:8]}")
    write_bucketed_gold(spark, incoming, stage, keys, path=stage_dir, n_buckets=n_buckets)
    try:
        merged = merge_bucketed(
            spark.table(table), spark.table(stage), keys=keys, order_col=order_col
        )
        gen = 1 + max(
            (int(d.split("-")[1]) for d in os.listdir(base_dir) if d.startswith("gen-")),
            default=0,
        )
        nxt = f"{table}__next"
        write_bucketed_gold(
            spark, merged, nxt, keys,
            path=os.path.join(base_dir, f"gen-{gen}"), n_buckets=n_buckets,
            pre_partition=False,
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"ALTER TABLE {nxt} RENAME TO {table}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {stage}")
        shutil.rmtree(stage_dir, ignore_errors=True)
    return {"generation": gen, "merged_plan": plan}


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    partition_by: Sequence[str] = (),
    cluster_by: Sequence[str] = (),
    zorder_by: Sequence[str] = (),
) -> dict:
    """Small-file compaction (the OPTIMIZE maintenance job): rewrite a
    table into ~``target_file_mb`` files, optionally sorted within
    files by ``cluster_by`` so parquet row-group min/max statistics
    prune point/range reads on those columns (poor man's clustering;
    Z-ORDER generalizes it to multi-column locality).

    Incremental upsert churn produces one small file per task per
    sync; at 100 TB unmanaged small files dominate scan planning and
    open() overhead. File count derives from actual on-disk bytes, the
    rewrite goes through ``atomic_overwrite`` (readable throughout,
    crash-safe), and the job is pure maintenance — results are
    byte-identical to readers.

    Returns {files_before, files_after, bytes} for observability.
    """

    def _parquet_files(p: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(p):
            out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
        return out

    before = _parquet_files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = read_table_recovering(spark, path)
    if zorder_by:
        # Z-ORDER clustering: range-partition + sort on the Morton
        # value so file AND row-group min/max stats prune on every
        # zorder_by column, not just a leading one
        df = (
            with_zorder(df, zorder_by)
            .repartitionByRange(n_files, "__zval")
            .sortWithinPartitions("__zval")
            .drop("__zval")
        )
    elif cluster_by:
        # range-partition on the cluster keys, then sort within files:
        # GLOBAL clustering, so file-level (not just row-group) min/max
        # stats are tight on the leading column. Round-robin
        # repartition + local sort would leave every file spanning the
        # whole key range — zero file-level pruning.
        df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        df = df.repartition(n_files)
    atomic_overwrite(df, path, partition_by=partition_by)
    return {
        "files_before": len(before),
        "files_after": len(_parquet_files(path)),
        "bytes": total_bytes,
    }



Z_BITS = 16


def with_zorder(df: DataFrame, cols: Sequence[str], bits: int = Z_BITS) -> DataFrame:
    """Adds ``__zval``: the Z-order (Morton) curve value over ``cols``.

    Each dimension is width-bucketed into 2^bits cells between its
    observed min/max (one model-sized agg collect), then the cells'
    bits are interleaved. Sorting by ``__zval`` gives MULTI-column
    locality — every file's min/max range is tight on EVERY clustered
    column at once, where a lexicographic sort is tight only on the
    leading column. The interleave is one native expression
    (bits×k shifted terms, whole-stage codegen) — no UDF, and no
    shuffle beyond the clustering sort itself.
    """
    bits = min(bits, 62 // len(cols))  # keep the interleave clear of the sign bit
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).first()
    out = df
    for i, c in enumerate(cols):
        lo, hi = ranges[f"lo_{c}"], ranges[f"hi_{c}"]
        if lo is None or hi is None or lo == hi:
            cell = F.lit(0).cast("long")
        else:
            cell = (
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit((1 << bits) - 1)
                )
                - 1
            ).cast("long")
        out = out.withColumn(f"__z_cell_{i}", cell)
    k = len(cols)
    terms = [
        f"shiftleft(shiftright(__z_cell_{i}, {j}) & CAST(1 AS BIGINT), {j * k + i})"
        for j in range(bits)
        for i in range(k)
    ]
    out = out.withColumn("__zval", F.expr(" + ".join(terms)))
    return out.drop(*[f"__z_cell_{i}" for i in range(k)])
