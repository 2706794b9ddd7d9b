"""Focused pins for the round-12 optimization internals.

Each test guards one optimization against semantic drift:
- footer-derived file stats must be value-identical to the Spark
  stats-job fallback (and the fallback must still engage for types the
  footer can't serve exactly);
- sorted_output must return the exact same rows as a plain orderBy and
  actually place a materialization barrier under the sort;
- merge_branch's folded emptiness probe must still commit a delete-only
  branch (n_up == 0) and an upsert-only branch (n_del == 0) correctly.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pim_etl_spark.pipeline import versioned as V
from pim_etl_spark.tuning import sorted_output


def _mk_df(spark):
    rows = [
        (1, "alpha", datetime.date(2020, 1, 2), 1.5),
        (2, "Beta", datetime.date(2019, 6, 1), -2.25),
        (3, None, datetime.date(2021, 12, 31), 0.0),
        (4, "zz top", datetime.date(2020, 1, 1), 9.75),
    ]
    return spark.createDataFrame(rows, "k long, s string, d date, x double")


def test_footer_stats_match_spark_job_values(spark, tmp_path):
    """Per-file min/max served from parquet footers must equal the
    scan-and-aggregate job's values exactly — for every type the
    footer fast path accepts (int, string, date)."""
    tbl = str(tmp_path / "t1")
    df = _mk_df(spark).repartition(2, "k")
    V.commit_snapshot(df, tbl, stats_cols=("k", "s", "d"))
    manifest = V.read_manifest(tbl, 1)
    fstats = manifest["file_stats"]
    assert fstats, "stats missing from manifest"
    # recompute the old way: one Spark agg per file over the data files
    for fname, per_col in fstats.items():
        scan = spark.read.parquet(f"{tbl}/data/{fname}")
        row = scan.agg(
            F.min("k"), F.max("k"), F.min("s"), F.max("s"), F.min("d"), F.max("d")
        ).collect()[0]
        # the manifest JSON stringifies non-JSON types (default=str) in
        # BOTH the footer and the Spark-job path — compare post-JSON
        # representations, which is what every manifest reader sees
        assert per_col["k"] == [row[0], row[1]]
        assert per_col["s"] == [row[2], row[3]]
        assert per_col["d"] == [str(row[4]), str(row[5])]


def test_footer_stats_fall_back_for_inexact_types(spark, tmp_path):
    """Doubles (NaN hazard) are NOT served from footers — the Spark
    stats job must still run and produce correct values, so pruning
    behavior is unchanged for them."""
    assert V._stats_from_footers("/nonexistent", ["nope.parquet"], ("x",)) is None
    tbl = str(tmp_path / "t2")
    df = _mk_df(spark).coalesce(1)
    V.commit_snapshot(df, tbl, stats_cols=("x",))
    fstats = V.read_manifest(tbl, 1)["file_stats"]
    (per_col,) = fstats.values()
    assert per_col["x"] == [-2.25, 9.75]


def test_footer_stats_all_null_column(spark, tmp_path):
    """A file whose stats column is entirely NULL must record
    [None, None], exactly like the Spark-job path did."""
    tbl = str(tmp_path / "t3")
    df = spark.createDataFrame([(1, None), (2, None)], "k long, s string").coalesce(1)
    V.commit_snapshot(df, tbl, stats_cols=("s",))
    (per_col,) = V.read_manifest(tbl, 1)["file_stats"].values()
    assert per_col["s"] == [None, None]


def test_sorted_output_rows_identical_and_barriered(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v")
    )
    agg = df.groupBy("g").agg(F.sum("v").alias("s"))
    plain = agg.orderBy("g").collect()
    barriered_df = sorted_output(
        df.groupBy("g").agg(F.sum("v").alias("s")), "g"
    )
    assert barriered_df.collect() == plain
    # the barrier must actually be there: an InMemoryRelation under the sort
    plan = barriered_df._sc._jvm.PythonSQLUtils.explainString(
        barriered_df._jdf.queryExecution(), "formatted"
    )
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    spark.catalog.clearCache()


SCHEMA = "product_id long, price double, version long"


def _branch_fixture(spark, tmp_path, tag):
    src = str(tmp_path / f"src-{tag}")
    br = str(tmp_path / f"br-{tag}")
    base = spark.createDataFrame(
        [(i, float(i), 1) for i in range(10)], SCHEMA
    ).coalesce(1)
    V.commit_snapshot(base, src, op="bootstrap", stats_cols=("product_id",))
    V.shallow_clone(src, br)
    return src, br


def test_merge_branch_delete_only_branch(spark, tmp_path):
    """n_up == 0 path of the folded probe: a branch holding ONLY a
    delete must skip the merge commit and still apply the delete."""
    src, br = _branch_fixture(spark, tmp_path, "delonly")
    V.delete_matching(
        spark, br, spark.createDataFrame([(3,)], "product_id long"), ["product_id"]
    )
    out = V.merge_branch(spark, src, br, keys=["product_id"], order_col="version")
    assert out["merged"]
    keys = {r[0] for r in V.read_version(spark, src).select("product_id").collect()}
    assert keys == set(range(10)) - {3}
    # exactly one commit on top of the bootstrap: the delete, no merge
    assert V.current_version(src) == 2


def test_merge_branch_upsert_only_branch(spark, tmp_path):
    """n_del == 0 path: an upsert-only branch must skip the delete
    commit."""
    src, br = _branch_fixture(spark, tmp_path, "uponly")
    V.merge_files(
        spark, br,
        spark.createDataFrame([(3, 99.0, 2), (42, 42.0, 2)], SCHEMA),
        keys=["product_id"], order_col="version",
    )
    out = V.merge_branch(spark, src, br, keys=["product_id"], order_col="version")
    assert out["merged"]
    rows = {
        r["product_id"]: r["price"]
        for r in V.read_version(spark, src).collect()
    }
    assert rows[3] == 99.0 and rows[42] == 42.0 and len(rows) == 11
    assert V.current_version(src) == 2
