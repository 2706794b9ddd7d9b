"""Data-quality expectations + Write-Audit-Publish (WAP).

The reference validates feeds row-by-row with pydantic models and
drops/collects errors per record (etl/base.py:121-133,
etl/models/*.py); here the same intent is declarative constraints
evaluated as native aggregates, plus the table-level classes pydantic
cannot express (uniqueness, referential integrity, freshness). The
combination with the versioned store gives Write-Audit-Publish: the
snapshot is STAGED (data files written), AUDITED, and only PUBLISHED
(manifest committed) if the audit passes — a failed audit leaves the
live table byte-identical, because readers only ever see
manifest-listed files.

Scale shape: all row-level expectations evaluate in ONE pass over the
batch (a single conditional-sum aggregate — adding an expectation adds
a column, not a scan); uniqueness is one hash aggregate on the key;
referential integrity is a broadcast anti-join when the referenced dim
is dimension-sized. Nothing collects more than one row per
expectation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    """One declarative constraint.

    kind:
    - "row":    ``condition`` (SQL bool expr) must hold per row;
                violations = failing rows.
    - "unique": ``columns`` must be unique; violations = surplus rows
                (rows beyond the first per duplicated key).
    - "ref":    ``columns`` must exist in ``ref_df``'s ``ref_columns``;
                violations = rows whose key has no match.
    - "table":  ``condition`` is a table-level SQL bool over aggregates
                (e.g. ``max(o_orderdate) >= DATE'2001-01-01'``);
                violations = 0 or 1.
    """

    name: str
    kind: Literal["row", "unique", "ref", "table"]
    condition: str | None = None
    columns: tuple[str, ...] = field(default=())
    ref_columns: tuple[str, ...] = field(default=())


def evaluate(
    df: DataFrame, expectations: list[Expect], refs: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Evaluate all expectations; returns (constraint_name,
    n_violations, passed) — one row per expectation, deterministic
    order."""
    spark = df.sparkSession
    refs = refs or {}

    rows = [e for e in expectations if e.kind == "row"]
    tables = [e for e in expectations if e.kind == "table"]
    results: list[DataFrame] = []

    if rows or tables:
        aggs = [
            F.sum(F.when(~F.expr(e.condition), 1).otherwise(0)).cast("long").alias(e.name)
            for e in rows
        ] + [
            F.when(F.expr(e.condition), 0).otherwise(1).cast("long").alias(e.name)
            for e in tables
        ]
        one_pass = df.agg(*aggs)
        stack = ", ".join(f"'{e.name}', `{e.name}`" for e in rows + tables)
        results.append(
            one_pass.selectExpr(
                f"stack({len(rows) + len(tables)}, {stack}) AS (constraint_name, n_violations)"
            )
        )

    for e in expectations:
        if e.kind == "unique":
            results.append(
                df.groupBy(*e.columns)
                .agg((F.count(F.lit(1)) - 1).alias("surplus"))
                .agg(F.coalesce(F.sum("surplus"), F.lit(0)).cast("long").alias("n_violations"))
                .select(F.lit(e.name).alias("constraint_name"), "n_violations")
            )
        elif e.kind == "ref":
            ref_df = refs[e.name]
            probe = ref_df.select(
                *[F.col(rc).alias(c) for c, rc in zip(e.columns, e.ref_columns)]
            ).distinct()
            results.append(
                df.join(F.broadcast(probe), list(e.columns), "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .select(F.lit(e.name).alias("constraint_name"), "n_violations")
            )

    if not results:
        raise ValueError("evaluate() needs at least one expectation")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "constraint_name", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("constraint_name")


def audit(
    df: DataFrame, expectations: list[Expect], refs: dict[str, DataFrame] | None = None
) -> dict:
    """Collect the (model-sized) audit verdict as a dict."""
    rows = evaluate(df, expectations, refs).collect()
    return {
        "passed": all(r["passed"] for r in rows),
        "violations": {r["constraint_name"]: r["n_violations"] for r in rows},
    }


def split_row_violations(
    df: DataFrame, expectations: list[Expect]
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty) split on the row-level expectations only — the
    quarantine path (reference error isolation, etl/base.py:121-133)."""
    conds = [F.expr(e.condition) for e in expectations if e.kind == "row"]
    if not conds:
        return df, df.limit(0)
    ok = conds[0]
    for c in conds[1:]:
        ok = ok & c
    return df.filter(ok), df.filter(~ok)


def merge_files_audited(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    keys: list[str],
    order_col: str,
    expectations: list[Expect],
    refs: dict[str, DataFrame] | None = None,
    on_violation: Literal["fail", "drop", "warn"] = "fail",
) -> dict:
    """Write-Audit-Publish MERGE into the versioned store.

    - "fail": audit the batch first; any violation aborts BEFORE any
      commit — the live table stays byte-identical (readers only see
      manifest-listed files, so even staged files are invisible).
    - "drop": quarantine row-level violations, merge only clean rows;
      the audit verdict (including dropped counts) is recorded in the
      manifest — the published snapshot carries its own audit trail.
    - "warn": merge everything, record the verdict in the manifest.
    """
    from pim_etl_spark.pipeline import versioned as V

    verdict = audit(incoming, expectations, refs)
    to_merge = incoming
    dropped = 0
    if not verdict["passed"]:
        if on_violation == "fail":
            raise ValueError(f"audit failed, publish aborted: {verdict['violations']}")
        if on_violation == "drop":
            to_merge, dirty = split_row_violations(incoming, expectations)
            dropped = dirty.count()
    audit_record = {**verdict, "mode": on_violation, "rows_dropped": dropped}
    result = V.merge_files(
        spark,
        path,
        to_merge,
        keys=keys,
        order_col=order_col,
        extra={"audit": audit_record},
    )
    result["audit"] = audit_record
    return result


from pim_etl_spark.catalog import query  # noqa: E402
from pim_etl_spark.sources import load_table  # noqa: E402


@query(
    "expectations_audit",
    oracle="""
    -- independent recomputation of every constraint verdict
    SELECT 'custkey_exists' AS constraint_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'fresh_enough',
           CAST((SELECT CASE WHEN max(o_orderdate) >= DATE '2001-01-01'
                             THEN 0 ELSE 1 END FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'orderkey_unique',
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'priority_expedited',
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM')) AS BIGINT)
    UNION ALL
    SELECT 'totalprice_floor',
           CAST((SELECT count(*) FROM orders WHERE NOT (o_totalprice > 5000)) AS BIGINT)
    """,
)
def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit under the hash gate: five
    constraint kinds over the orders table (two row predicates that
    REAL data partially fails, key uniqueness, referential integrity
    against customer, a table-level freshness bound), all recomputed
    independently by the oracle. The row+table constraints share ONE
    aggregate pass; ``passed`` is derived, so it is dropped here in
    favor of the raw counts the oracle can pin."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    expectations = [
        Expect("totalprice_floor", "row", condition="o_totalprice > 5000"),
        Expect(
            "priority_expedited",
            "row",
            condition="o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')",
        ),
        Expect("orderkey_unique", "unique", columns=("o_orderkey",)),
        Expect(
            "custkey_exists", "ref", columns=("o_custkey",), ref_columns=("c_custkey",)
        ),
        Expect(
            "fresh_enough", "table", condition="max(o_orderdate) >= DATE '2001-01-01'"
        ),
    ]
    return evaluate(orders, expectations, refs={"custkey_exists": customer}).select(
        "constraint_name", "n_violations"
    )
