#!/usr/bin/env python
"""Capture .explain("formatted") for a list of catalog entries into
plans/<tag>/<entry>_<suffix>.txt (r12 deliverable: before/after plan
evidence for every touched query).

Usage:
  python scripts/capture_plans.py --suffix after --entries a,b,c
  python scripts/capture_plans.py --repo /tmp/repo_before --suffix before --entries a,b,c

--repo points sys.path at an alternate checkout (the pre-optimization
tree) so `before` plans come from the exact code the round started
with. Building an entry's DataFrame executes any imperative lifecycle
inside it (versioned commits etc.) but not the final query, which is
what explain() describes.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--out-dir", default=None, help="default <this repo>/plans/r12")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--entries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out_dir or os.path.join(here, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    sys.path.insert(0, args.repo)
    from pim_etl_spark.catalog import get_queries  # noqa: E402
    from pim_etl_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    names = [n.strip() for n in args.entries.split(",") if n.strip()]
    jvm = spark.sparkContext._jvm
    for name in names:
        try:
            spark.catalog.clearCache()
            df = queries[name](spark, args.sf_dir)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # keep going; note the failure
            txt = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
            fh.write(txt)
        print("wrote", name, args.suffix)
    spark.stop()


if __name__ == "__main__":
    main()
