"""Supplier registry (SURVEY §2.9): the extension surface.

Mirrors the reference's ``@etl_component`` decorator + factory dicts
(etl/base.py:315-385): a supplier plugs in with a dict of feed schemas
and a transform function returning the unified-product DataFrame. The
orchestrator (run_sync) loops registered suppliers — P11's
sync-one-or-all — and unions results tagged by supplier.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TransformFn = Callable[[dict[str, DataFrame], SparkSession], DataFrame]

_REGISTRY: dict[str, "SupplierSpec"] = {}


@dataclass
class SupplierSpec:
    supplier_id: str
    feed_schemas: dict[str, StructType]
    transform: TransformFn
    display_name: str = ""
    # error-quarantine contract (SURVEY N5): the product-bearing feed
    # and the fields a row must carry to be transformable
    primary_feed: str = ""
    required_fields: tuple = ()
    # feeds the transform can work without (e.g. extra-language
    # fetches) — the orchestrator skips them when not landed
    optional_feeds: tuple = ()
    # incremental-sync watermark: the dialect's row-level modified-time
    # field in its feed (raw name, e.g. XD's
    # ItemDataLastModifiedDateTime, `sample data/XD Sample Data.jsonc:7`;
    # Sanmar's lastChangeDate, `sample data/Sanmar Sample Data.jsonc:236`),
    # which the transform surfaces as the unified ``modified_at``
    # timestamp column. None = the feed has no row-level change
    # tracking; --since falls back to the feed-level ``feed_timestamp``
    # (MidOcean's per-feed ``timestamp``), and rows with neither are
    # KEPT — a feed that can't prove a row unchanged degrades to full
    # sync rather than silently dropping products.
    watermark_field: str | None = None
    extra: dict = field(default_factory=dict)


def register_supplier(spec: SupplierSpec) -> SupplierSpec:
    if spec.supplier_id in _REGISTRY:
        raise ValueError(f"supplier {spec.supplier_id!r} already registered")
    _REGISTRY[spec.supplier_id] = spec
    return spec


def get_supplier(supplier_id: str) -> SupplierSpec:
    try:
        return _REGISTRY[supplier_id]
    except KeyError:
        raise KeyError(
            f"no supplier registered as {supplier_id!r}; known: {sorted(_REGISTRY)}"
        ) from None  # mirrors ETLPipelineFactory's unregistered error (etl/base.py:357-362)


def list_suppliers() -> list[str]:
    return sorted(_REGISTRY)


def run_sync(
    spark: SparkSession,
    feeds_by_supplier: dict[str, dict[str, DataFrame]],
    supplier_id: str | None = None,
) -> DataFrame:
    """Full sync for one supplier or all configured (etl/orchestrator.py:39-80):
    transform each supplier's landed feeds and union the unified
    outputs. "All" means all suppliers with feeds provided, mirroring
    the reference's configured-supplier loop."""
    from functools import reduce

    from pyspark.sql import functions as F

    targets = [supplier_id] if supplier_id else sorted(feeds_by_supplier)
    dfs = [get_supplier(sid).transform(feeds_by_supplier[sid], spark) for sid in targets]
    assert dfs, "no suppliers registered"
    if len(dfs) == 1:
        return dfs[0]
    # suppliers emit different unified-column subsets; missing columns
    # null-fill (the pydantic Optional-field semantics). Align every
    # output against the column superset ONCE, then chain positional
    # unions: chained unionByName(allowMissingColumns) re-analyzes the
    # accumulated plan per supplier (quadratic driver-side analysis —
    # measured 3.2 s for 9 dialects), while pre-aligned unions analyze
    # each dialect subtree once.
    types: dict[str, object] = {}
    for df in dfs:
        for fld in df.schema.fields:
            types.setdefault(fld.name, fld.dataType)
    cols = list(types)
    aligned = [
        df.select(
            *[
                F.col(c) if c in set(df.columns) else F.lit(None).cast(types[c]).alias(c)
                for c in cols
            ]
        )
        for df in dfs
    ]
    return reduce(DataFrame.union, aligned)


def incremental_filter(df: DataFrame, since: str) -> DataFrame:
    """``--since`` incremental-sync semantics (reference intent:
    etl/orchestrator.py:354-359): keep rows whose normalized watermark
    is at/after the cutoff.

    The watermark is the per-supplier row-level ``modified_at`` where
    the dialect surfaces one (SupplierSpec.watermark_field), falling
    back to the feed-level ``feed_timestamp``. Rows with NO watermark
    at all are kept: a feed without change tracking cannot prove a row
    unchanged, so incremental degrades to full sync for that supplier
    instead of silently dropping its products.

    At scale this filter sits directly above the feed scan, so when the
    watermark is a physical column Catalyst pushes the comparison into
    the parquet reader (min/max row-group pruning).
    """
    from pyspark.sql import functions as F

    cols = set(df.columns)
    parts = [
        F.to_timestamp(F.col(c)) for c in ("modified_at", "feed_timestamp") if c in cols
    ]
    if not parts:
        return df
    wm = F.coalesce(*parts)
    return df.filter(wm.isNull() | (wm >= F.lit(since).cast("timestamp")))


def _register_midocean() -> None:
    from pim_etl_spark.pipeline import schemas, silver

    def _transform(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
        return silver.transform_products(
            feeds["mo_products"],
            feeds["mo_pricelist"],
            feeds["mo_printdata"],
            feeds["mo_printprices"],
            spark,
            localized_raw=feeds.get("mo_products_i18n"),
            sustainability_raw=feeds.get("mo_sustainability"),
        )

    register_supplier(
        SupplierSpec(
            supplier_id=silver.SUPPLIER_ID,
            display_name=silver.SUPPLIER_NAME,
            primary_feed="mo_products",
            required_fields=("master_code", "product_name"),
            feed_schemas={
                "mo_products": schemas.MO_PRODUCTS,
                "mo_pricelist": schemas.MO_PRICELIST,
                "mo_printdata": schemas.MO_PRINTDATA,
                "mo_printprices": schemas.MO_PRINTPRICES,
                "mo_stock": schemas.MO_STOCK,
                "mo_products_i18n": schemas.MO_PRODUCTS_I18N,
                "mo_sustainability": schemas.MO_SUSTAINABILITY,
            },
            optional_feeds=("mo_products_i18n", "mo_sustainability"),
            transform=_transform,
        )
    )


_register_midocean()

# additional supplier dialects register themselves on import (safe
# circular import: suppliers.py only needs the symbols defined above)
from pim_etl_spark.pipeline import suppliers  # noqa: E402,F401
