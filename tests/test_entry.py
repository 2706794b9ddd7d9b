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
