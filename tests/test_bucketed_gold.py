"""Bucketed gold table (VERDICT r4 #3): the repeat sync — the
operation a PIM gold store runs forever — must not pay a full-table
hash Exchange per sync. Bucketing persists the merge-key partitioning
into the table layout; the join-based MERGE then plans with ZERO
Exchange nodes on either side."""

from __future__ import annotations

import uuid

from pim_etl_spark.pipeline import gold as G


def test_bucketed_repeat_sync_zero_exchange(spark, tmp_path):
    tbl = f"gold_bkt_{uuid.uuid4().hex[:8]}"
    base = str(tmp_path / "gold")
    try:
        b1 = spark.range(100).selectExpr(
            "id AS product_id", "CAST(id AS DOUBLE) AS base_price", "CAST(1 AS LONG) AS version"
        )
        r1 = G.sync_bucketed_gold(
            spark, tbl, b1, keys=["product_id"], order_col="version",
            base_dir=base, n_buckets=4,
        )
        assert r1["generation"] == 1

        # second sync: one update (key 5) + one insert (key 200)
        b2 = spark.createDataFrame(
            [(5, 555.0, 2), (200, 200.0, 2)],
            "product_id long, base_price double, version long",
        )
        r2 = G.sync_bucketed_gold(
            spark, tbl, b2, keys=["product_id"], order_col="version",
            base_dir=base, n_buckets=4,
        )
        plan = r2["merged_plan"]
        # the whole point: co-bucketed SMJ, no Exchange anywhere in the
        # merge plan (the union+window formulation shuffles the entire
        # table here)
        assert "Exchange" not in plan, plan[:3000]
        assert "SortMergeJoin" in plan, plan[:3000]

        got = {r.product_id: r.base_price for r in spark.table(tbl).collect()}
        assert got[5] == 555.0 and got[200] == 200.0
        assert got[6] == 6.0 and len(got) == 101

        # third sync (in-batch dup: latest version wins) keeps the property
        b3 = spark.createDataFrame(
            [(7, 1.0, 3), (7, 777.0, 4)],
            "product_id long, base_price double, version long",
        )
        r3 = G.sync_bucketed_gold(
            spark, tbl, b3, keys=["product_id"], order_col="version",
            base_dir=base, n_buckets=4,
        )
        assert "Exchange" not in r3["merged_plan"]
        got = {r.product_id: r.base_price for r in spark.table(tbl).collect()}
        assert got[7] == 777.0 and len(got) == 101
        assert r3["generation"] == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_write_one_file_per_bucket(spark, tmp_path):
    """The pre-partitioned bucketed write must land one file per
    bucket, not n_tasks × n_buckets small files."""
    import glob

    tbl = f"gold_bkt_{uuid.uuid4().hex[:8]}"
    path = str(tmp_path / "t")
    try:
        df = spark.range(1000).selectExpr("id AS product_id", "id * 2 AS v")
        G.write_bucketed_gold(spark, df, tbl, keys=["product_id"], path=path, n_buckets=8)
        files = glob.glob(f"{path}/*.parquet")
        assert len(files) == 8, files
        assert spark.table(tbl).count() == 1000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
