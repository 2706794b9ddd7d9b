"""End-to-end demo (the reference's demo.py:18-116 analogue):
land fixture feeds → validate → sync all suppliers → print stats and
three sample products.

    python -m pim_etl_spark.demo [workdir]
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import functions as F


def main(workdir: str | None = None) -> int:
    from pim_etl_spark.orchestrator import run_status, run_sync, run_validate
    from pim_etl_spark.pipeline import fixtures
    from pim_etl_spark.session import get_spark

    workdir = workdir or tempfile.mkdtemp(prefix="pim_demo_")
    spark = get_spark(app_name="pim-etl-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== landing feeds under {workdir}/feeds")
    feeds = fixtures.all_supplier_feeds(spark, n_masters=12)
    for sid, by_name in feeds.items():
        for name, df in by_name.items():
            df.write.mode("overwrite").parquet(f"{workdir}/feeds/{sid}/{name}.parquet")

    print("== validate")
    print(json.dumps(run_validate(spark, f"{workdir}/feeds")))

    print("== full sync (all suppliers)")
    gold = f"{workdir}/gold/products.parquet"
    print(json.dumps(run_sync(spark, f"{workdir}/feeds", gold)))

    print("== status")
    print(json.dumps(run_status(spark, gold)))

    print("== sample products (limit 3, reference demo.py:88-97 shape)")
    sample = (
        spark.read.parquet(gold)
        .select(
            "product_id",
            "name",
            "status",
            "base_price",
            F.size(F.coalesce(F.col("variants"), F.array())).alias("n_variants"),
        )
        .orderBy("product_id")
        .limit(3)
    )
    for row in sample.collect():
        print(f"  {row.product_id}: {row.name!r} status={row.status} "
              f"base_price={row.base_price} variants={row.n_variants}")

    print("== versioned (commit-log) store: sync → re-sync → history → rollback")
    vgold = f"{workdir}/vgold"
    from pim_etl_spark.pipeline import versioned as V

    print(json.dumps(run_sync(spark, f"{workdir}/feeds", vgold, versioned=True)))
    print(json.dumps(run_sync(spark, f"{workdir}/feeds", vgold, versioned=True)))
    print("history:", json.dumps([
        {"v": m["version"], "op": m["op"], "stats": m["stats"]} for m in V.history(vgold)
    ]))
    V.rollback(vgold, to_version=1)
    print(f"rolled back to v1 as v{V.current_version(vgold)}; "
          f"rows={V.read_version(spark, vgold).count()}")
    changes = V.changes_between(
        spark, vgold, ["product_id"], 1, 2, ignore_cols=("last_sync",)
    ).count()
    print(f"CDC v1→v2 content changes: {changes} (idempotent re-sync, "
          f"last_sync watermark ignored ⇒ expect 0)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else None))
