"""Local replica of the driver's correctness gate: run every catalog
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, compare row count + column names + order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pim_etl_spark.catalog import get_oracles, get_queries

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and float repr jitter
        return f"{v + 0.0:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


QUERY_NAMES = sorted(get_queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = get_queries()[name]
    oracles = get_oracles()

    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = [f.name for f in sdf.schema.fields]

    if name not in oracles:
        # rows-only check, mirroring the driver's weaker gate
        assert isinstance(spark_rows, list)
        return

    con = _duck(sf_dir)
    res = con.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
