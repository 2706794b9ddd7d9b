#!/usr/bin/env python
"""Empirical time-vs-sf scale curves for the heaviest catalog entries
(round-10 VERDICT item 1: the 100 TB design claims were plan-audited
but never CURVE-measured — a super-linear entry is a hidden
scale-killer no plan audit catches).

Runs each entry at sf0.001 / sf0.01 / sf0.1 (a 100× data span),
min-of-3 per point in one otherwise-idle session, and reports the
per-decade exponent of each segment:

    exponent = log10(t_hi / t_lo)          (per 10× data)

so 1.0 = perfectly linear, 0.0 = flat (fixed cost dominates), >1.2 =
investigate. The LOW segment (0.001→0.01) is dominated by fixed
per-job cost (Spark job launch, micro-batch engine startup, store
bootstrap commits) at these tiny sizes, so the HIGH segment
(0.01→0.1) is the one the 100 TB claims rest on — and even it still
carries the fixed floor, which DILUTES the measured growth: with
t = F + c·sf^a the raw segment exponent UNDERESTIMATES the
data-dependent exponent ``a``. `exp_high_adjusted` therefore
subtracts the per-entry sf0.001 reading as a floor estimate and fits
the residual — that is the number to hold against the 1.2 bar. A
raw exponent near 0 with no computable adjusted value means the
entry is fixed-cost-bound across the whole measured span.

Round 12 extension: ``--sf-dirs`` accepts any comma list of sf
directories (e.g. adding the self-generated ``.scratch/sf1`` — see
scripts/gen_scratch_sf.py), and the exponent math normalizes by each
segment's actual sf ratio, so non-decade spans report the same
per-10× exponent scale. The floor estimate stays the LOWEST point's
reading.

Usage:
    python scripts/scale_curves.py [--runs 3] [--out SCALE_CURVES.json]
                                   [--entries a,b,c] [--sf-dirs d1,d2,...]
Writes a JSON artifact plus a ready-to-paste markdown table on stdout.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)

# The heaviest catalog entries by the round-10 driver bench, i.e. the
# ones whose 100× behavior matters most: the full ER family,
# the frequent-itemset / sequential miners, the grid-code ANN kernels,
# the LSH dedup chain, and the two heaviest versioned lifecycles
# (versioned_branch_merge doubles as the round-10 wobble A/B).
DEFAULT_ENTRIES = (
    "stream_er_admission",
    "er_incremental_link",
    "er_golden_record",
    "er_blocking_candidates",
    "er_matched_pairs",
    "er_linkage_quality",
    "apriori_triple_itemsets",
    "sequential_purchase_patterns",
    "knn_label_vote",
    "hard_negative_mining",
    "dedup_cluster_resolution",
    "versioned_branch_merge",
    "versioned_replica_sync",
)


def _sf(d: str) -> float:
    return float(os.path.basename(d.rstrip("/")).replace("sf", ""))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "SCALE_CURVES.json"))
    ap.add_argument("--entries", default=",".join(DEFAULT_ENTRIES))
    ap.add_argument("--sf-dirs", default=",".join(SF_DIRS))
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra spark conf(s) pinned for the whole run, recorded in the "
        "artifact — e.g. spark.sql.autoBroadcastJoinThreshold=-1 to hold a "
        "curve inside the shuffle-join regime across a span that would "
        "otherwise cross the broadcast boundary (round 12: a regime "
        "transition mid-span reads as a fake super-linear exponent)",
    )
    args = ap.parse_args()
    entries = [n.strip() for n in args.entries.split(",") if n.strip()]
    sf_dirs = [d.strip() for d in args.sf_dirs.split(",") if d.strip()]
    sf_dirs.sort(key=_sf)
    assert len(sf_dirs) >= 2, "need at least two sf points for a curve"

    from pim_etl_spark.catalog import get_queries
    from pim_etl_spark.session import get_spark
    from pim_etl_spark.sources import load_table

    spark = get_spark(app_name="pim-etl-spark-scale-curves")
    spark.sparkContext.setLogLevel("ERROR")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
    queries = get_queries()
    unknown = [n for n in entries if n not in queries]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        sys.exit(2)

    # pay one-time session costs outside every timed region: scan-path
    # warmup per SF + the Python-UDF worker daemons
    for d in sf_dirs:
        for t in ("orders", "customer", "lineitem", "documents", "embeddings", "events"):
            try:
                load_table(spark, d, t).count()
            except Exception:
                pass
    spark.range(10_000, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    sfs = [_sf(d) for d in sf_dirs]
    results: dict[str, dict] = {}
    for name in entries:
        fn = queries[name]
        per_sf: dict[str, float] = {}
        runs_detail: dict[str, list[float]] = {}
        for d in sf_dirs:
            times: list[float] = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df = fn(spark, d)
                df.write.mode("overwrite").format("noop").save()
                times.append(time.perf_counter() - t0)
            per_sf[str(_sf(d))] = round(min(times), 3)
            runs_detail[str(_sf(d))] = [round(t, 3) for t in times]
            print(f"  {name} sf={_sf(d)}: min {min(times):.3f}s of {[round(t,2) for t in times]}", file=sys.stderr)
        ts = [per_sf[str(s)] for s in sfs]
        # per-10× exponent of each consecutive segment, normalized by
        # the segment's actual sf ratio (decade segments divide by 1)
        segs = [
            round(math.log10(ts[i + 1] / ts[i]) / math.log10(sfs[i + 1] / sfs[i]), 2)
            if ts[i] > 0
            else None
            for i in range(len(ts) - 1)
        ]
        # fixed-floor-adjusted exponent of the TOP segment: treat the
        # lowest-sf reading as the entry's fixed per-run cost (job
        # launch, store bootstrap, micro-batch startup) and fit the
        # growth of the remaining data-dependent part. Guard: needs
        # both residuals clearly positive or the log is meaningless.
        t_lo = ts[0]
        r_mid, r_hi = ts[-2] - t_lo, ts[-1] - t_lo
        exp_hi_adj = (
            round(
                math.log10(r_hi / r_mid) / math.log10(sfs[-1] / sfs[-2]), 2
            )
            if r_mid > 0.05 and r_hi > 0.05
            else None
        )
        results[name] = {
            "sec_by_sf": per_sf,
            "runs_by_sf": runs_detail,
            "exp_low_segment": segs[0],
            "exp_high_segment": segs[-1],
            "exp_segments": segs,
            "exp_high_adjusted": exp_hi_adj,
        }

    out_path = os.path.abspath(args.out)
    payload: dict = {"runs_per_point": args.runs, "entries": results}
    # merge into an existing artifact instead of clobbering it, so a
    # targeted re-measurement (e.g. the pinned-regime re-run of a
    # transition entry) replaces only its own entries. entry_confs
    # carries per-entry conf provenance and must SURVIVE unpinned
    # follow-up runs that merge other entries (round 12: an unpinned
    # LSH merge dropped the ER entries' regime-pin record because the
    # old carry-forward only fired when the prior had legacy
    # pinned_confs or the new run had --conf).
    per_entry: dict[str, list[str]] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        if prior.get("runs_per_point") == args.runs:
            merged = dict(prior.get("entries", {}))
            merged.update(results)
            payload["entries"] = merged
            per_entry = dict(prior.get("entry_confs", {}))
            # legacy artifacts recorded a run-wide pinned_confs; fold
            # it into per-entry records for the entries it measured
            for n in prior.get("pinned_confs", []) and prior.get("entries", {}) or ():
                per_entry.setdefault(n, prior["pinned_confs"])
    # a re-measured entry's provenance is THIS run's conf: record the
    # pin, or clear a stale one (re-measured unpinned = default confs)
    for n in results:
        if args.conf:
            per_entry[n] = args.conf
        else:
            per_entry.pop(n, None)
    if per_entry:
        payload["entry_confs"] = per_entry
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)

    # ready-to-paste markdown
    sf_cols = " | ".join(f"sf{s:g}" for s in sfs)
    seg_cols = " | ".join(f"exp {sfs[i]:g}→{sfs[i+1]:g}" for i in range(len(sfs) - 1))
    print(f"| entry | {sf_cols} | {seg_cols} | top-seg (floor-adj) |")
    print("|---" * (len(sfs) * 2 + 1) + "|")
    for name, r in results.items():
        s = r["sec_by_sf"]
        adj = r["exp_high_adjusted"]
        vals = " | ".join(str(s[str(x)]) for x in sfs)
        segs_str = " | ".join(str(x) for x in r["exp_segments"])
        print(f"| {name} | {vals} | {segs_str} | {adj if adj is not None else '—'} |")
    spark.stop()


if __name__ == "__main__":
    main()
