"""Manifest-versioned gold store (pipeline/versioned.py): snapshot
isolation, time travel, file-granular copy-on-write MERGE, rollback,
vacuum. This is the transactional-MERGE surface VERDICT r3 listed as
env-blocked on delta-spark, implemented directly on parquet + a JSON
commit log."""

from __future__ import annotations

import os

from pim_etl_spark.pipeline import versioned as V

SCHEMA = "product_id long, base_price double, version long"


def _rows(df):
    return {r.product_id: (r.base_price, r.version) for r in df.collect()}


def _bootstrap(spark, path, n=40, files=4):
    # cluster keys into files by range so a narrow batch touches few files
    df = (
        spark.range(n)
        .selectExpr(
            "id AS product_id", "CAST(id AS DOUBLE) AS base_price", "CAST(1 AS LONG) AS version"
        )
        .repartitionByRange(files, "product_id")
    )
    return V.commit_snapshot(df, path, op="bootstrap")


def test_snapshot_commit_and_read(spark, tmp_path):
    path = str(tmp_path / "t")
    v = _bootstrap(spark, path)
    assert v == 1
    assert V.current_version(path) == 1
    assert V.read_version(spark, path).count() == 40
    assert V.history(path)[0]["op"] == "bootstrap"


def test_merge_is_file_granular_and_time_travel_isolated(spark, tmp_path):
    path = str(tmp_path / "t")
    _bootstrap(spark, path, n=40, files=4)
    files_v1 = {os.path.basename(f) for f in V.snapshot_files(path, 1)}

    # batch updates keys 0..4 (one range-file) and inserts 100..101
    batch = spark.createDataFrame(
        [(k, 1000.0 + k, 2) for k in range(5)] + [(100, 100.0, 2), (101, 101.0, 2)],
        SCHEMA,
    )
    stats = V.merge_files(spark, path, batch, keys=["product_id"], order_col="version")
    assert stats["version"] == 2
    # only the file(s) holding keys 0..4 were rewritten; the rest carried
    assert 1 <= stats["files_rewritten"] < 4
    assert stats["files_kept"] >= 2
    files_v2 = {os.path.basename(f) for f in V.snapshot_files(path, 2)}
    assert files_v1 & files_v2, "untouched files must be carried by NAME (no copy)"

    # v2 content: replaced + inserted + untouched
    got = _rows(V.read_version(spark, path, 2))
    assert got[0] == (1000.0, 2) and got[4] == (1004.0, 2)
    assert got[100] == (100.0, 2) and got[101] == (101.0, 2)
    assert got[39] == (39.0, 1)
    assert len(got) == 42

    # time travel: v1 is byte-stable and still the pre-merge content
    v1 = _rows(V.read_version(spark, path, 1))
    assert len(v1) == 40 and v1[0] == (0.0, 1)


def test_merge_pure_insert_rewrites_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    _bootstrap(spark, path, n=20, files=2)
    batch = spark.createDataFrame([(500, 5.0, 2)], SCHEMA)
    stats = V.merge_files(spark, path, batch, keys=["product_id"], order_col="version")
    assert stats["files_rewritten"] == 0
    assert V.read_version(spark, path).count() == 21


def test_append_carries_parent_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _bootstrap(spark, path, n=10, files=1)
    v = V.commit_append(spark.createDataFrame([(200, 2.0, 1)], SCHEMA), path)
    m = V.read_manifest(path, v)
    assert m["stats"]["files_carried"] >= 1
    assert V.read_version(spark, path).count() == 11


def test_rollback_is_a_new_commit_with_old_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _bootstrap(spark, path, n=10, files=1)
    V.merge_files(
        spark,
        path,
        spark.createDataFrame([(0, 999.0, 2)], SCHEMA),
        keys=["product_id"],
        order_col="version",
    )
    v3 = V.rollback(path, to_version=1)
    assert v3 == 3 and V.current_version(path) == 3
    assert _rows(V.read_version(spark, path)) == _rows(V.read_version(spark, path, 1))
    assert V.read_manifest(path, 3)["files"] == V.read_manifest(path, 1)["files"]


def test_vacuum_reclaims_only_unreferenced_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _bootstrap(spark, path, n=40, files=4)
    for step in (2, 3):
        V.merge_files(
            spark,
            path,
            spark.createDataFrame([(0, float(step), step)], SCHEMA),
            keys=["product_id"],
            order_col="version",
        )
    data_dir = os.path.join(path, "data")
    before = set(os.listdir(data_dir))
    res = V.vacuum(path, keep_last=2)
    after = set(os.listdir(data_dir))
    assert res["data_files_removed"] == len(before - after) > 0
    # retained snapshots still fully readable
    assert V.read_version(spark, path, 3).count() == 40
    assert V.read_version(spark, path, 2).count() == 40
    # expired manifest gone from history, head unchanged
    assert [m["version"] for m in V.history(path)] == [2, 3]
    assert V.current_version(path) == 3
