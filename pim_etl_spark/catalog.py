"""Query catalog — the driver-checked operator inventory.

Every operator from SURVEY.md §2 registers here as a named query
(``(spark, sf_dir) -> DataFrame``) with, where SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables. The driver's
correctness harness runs both sides at sf0.01 and compares row count +
schema + order-insensitive value hash; ``tests/test_oracle_parity.py``
runs the identical check locally at sf0.001.

Conventions (SURVEY.md §7.4):
- every computed column is aliased identically in Spark and SQL;
- outputs are flat (no structs/maps) unless the driver can hash them;
- arrays in outputs are deterministically sorted;
- no current-date/time dependence — fixed literals only.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = (
    "pim_etl_spark.operators.relational",
    "pim_etl_spark.operators.windows",
    "pim_etl_spark.operators.nested",
    "pim_etl_spark.operators.scalar",
    "pim_etl_spark.operators.advanced",
    "pim_etl_spark.operators.tpch",
    "pim_etl_spark.operators.analytics",
    "pim_etl_spark.operators.strings_dates",
    "pim_etl_spark.operators.pim_queries",
    "pim_etl_spark.llm_ops.dedup",
    "pim_etl_spark.llm_ops.similarity",
    "pim_etl_spark.llm_ops.text",
    "pim_etl_spark.llm_ops.multimodal",
    "pim_etl_spark.streaming.queries",
)

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query; ``oracle`` is the DuckDB-SQL twin.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate catalog query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_catalog() -> None:
    """Import every operator module (side effect: registration)."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def get_queries() -> dict[str, QueryFn]:
    load_catalog()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load_catalog()
    return dict(ORACLES)
