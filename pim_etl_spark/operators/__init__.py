"""Relational operator catalog (SURVEY.md §2.2–§2.7).

Each module registers named queries with DuckDB oracles via
``pim_etl_spark.catalog.query``.
"""
