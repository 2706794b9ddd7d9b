"""Smoke test of the driver contract."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"s_name", "o_orderstatus", "revenue", "n_items"} == set(df.columns)


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "catalog is empty"
    assert set(oracles).issubset(set(qs))


def test_catalog_entries_clear_cache_on_start(spark, sf_dir):
    """Every catalog callable is wrapped by catalog._entry_scoped:
    invoking an entry clears leftover Spark caches from the previous
    entry, so a 300+-entry driver/bench run cannot accumulate executor
    storage (round-6 ADVICE) and no entry's timing can lean on a
    sibling's caches."""
    from pyspark import StorageLevel

    from pim_etl_spark.catalog import get_queries

    leftover = spark.range(100).cache()
    leftover.count()
    assert leftover.storageLevel != StorageLevel.NONE
    qs = get_queries()
    qs["bench_control"](spark, sf_dir).collect()
    # assert on THIS frame's storage, not a global zero: sibling tests
    # in the shared session may hold localCheckpoint RDD blocks, which
    # clearCache deliberately does not touch
    assert leftover.storageLevel == StorageLevel.NONE
