#!/usr/bin/env python
"""Bounded-memory gate for the heaviest catalog entries (round-11
VERDICT item 5): run each under a PINNED-SMALL JVM heap at sf0.1 and
assert completion.

Why this proves something: the round-11 sf0.1 parity rehearsal OOM'd
a default 1 g-driver JVM — but in the HARNESS's compare step
(toPandas materialization of full result sets), not in the engine.
This probe separates the two: entries execute into a noop sink (no
driver materialization beyond Spark's own scheduler state), so a pass
under a small pinned heap demonstrates (a) no engine-side data-sized
collect/broadcast hides in any plan, and (b) the shuffle/agg/join
paths spill to disk rather than OOM when executor memory is tight —
exactly the discipline a 100 TB run needs, where per-task memory is
always scarcer than data.

In local[32] mode driver and executors share ONE JVM, so
spark.driver.memory IS the whole engine heap: 32 concurrent tasks'
execution memory + block manager + scheduler all inside the pinned
budget. 1 g across 32 threads leaves ~20–30 MB of execution memory
per task slot — tighter, relative to the sf0.1 partitions, than a
production 4–8 GB executor core facing 128 MB splits.

Runs as ONE pinned subprocess by default (the entries execute
sequentially inside it); `--heap` dials the pin.

Usage:
    python scripts/bounded_memory_probe.py [--heap 1g] [--entries a,b]
                                           [--sf-dir /root/testdata/sf0.1]
Exit 0 = every entry completed under the pin; 1 = something failed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the 10 heaviest entries by the committed bench artifact (see
# bench_last.json / SCALE.md): the full ER family, the two heaviest
# versioned lifecycles, the streaming admission pipeline, and the
# incremental rollup — every shape with real shuffle/state volume
DEFAULT_ENTRIES = (
    "stream_er_admission",
    "er_incremental_link",
    "er_golden_record",
    "er_blocking_candidates",
    "er_matched_pairs",
    "versioned_branch_merge",
    "versioned_replica_sync",
    "versioned_partition_evolution",
    "incremental_rollup_minmax",
    "bitemporal_asof_query",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--heap", default="1g")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--entries", default=",".join(DEFAULT_ENTRIES))
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BOUNDED_MEMORY.json"), help="artifact path"
    )
    args = ap.parse_args()
    entries = [n.strip() for n in args.entries.split(",") if n.strip()]

    from pyspark.sql import SparkSession

    from pim_etl_spark.catalog import get_queries

    # pinned heap, otherwise the naive driver-gate shape (no tuned
    # session confs — the spill behavior must come from Spark's
    # defaults + the operators' own plan shapes, not a generous heap)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", args.heap)
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    actual = spark.sparkContext.getConf().get("spark.driver.memory")
    print(f"probe heap pin: {actual} over {len(entries)} entries", file=sys.stderr)

    queries = get_queries()
    unknown = [n for n in entries if n not in queries]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    results: dict[str, dict] = {}
    failed: list[str] = []
    for i, name in enumerate(entries, 1):
        t0 = time.perf_counter()
        try:
            queries[name](spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            results[name] = {"ok": True, "sec": dt}
            print(f"[{i}/{len(entries)}] OK {name}: {dt}s under {actual}", file=sys.stderr)
        except Exception as exc:
            failed.append(name)
            results[name] = {"ok": False, "error": str(exc)[:500]}
            print(f"[{i}/{len(entries)}] FAILED {name}: {exc}", file=sys.stderr)
    spark.stop()

    artifact = {
        "heap": args.heap,
        "sf_dir": args.sf_dir,
        "entries": results,
        "failed": failed,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "bounded_memory_probe", "heap": args.heap,
                      "ok": len(entries) - len(failed), "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
