#!/usr/bin/env python
"""Per-entry job-level profiler (optimization round 12, guide §1).

Runs the named catalog entries exactly as bench.py does (same preland,
same noop sink, cold per entry) with the Spark event log enabled, then
parses the event log to attribute every Spark job to its entry via the
job description. Output per entry: wall seconds, number of jobs, sum of
job seconds (wall − jobs ≈ driver/planning/py4j time), stage count,
task count, and total shuffle read/write bytes.

Usage: python scripts/profile_entries.py entry[,entry...] [--runs N]
Writes /tmp/profile_entries.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVT_DIR = "/tmp/spark-events-profile"


def main() -> None:
    names = [n for a in sys.argv[1:] if not a.startswith("--") for n in a.split(",") if n]
    runs = 1
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    os.makedirs(EVT_DIR, exist_ok=True)
    from pim_etl_spark.catalog import get_queries
    from pim_etl_spark.session import get_spark

    spark = get_spark(
        app_name="pim-etl-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVT_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    import bench

    bench._preland(spark)

    queries = get_queries()
    walls: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"__prof__:{name}:{r}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            walls.setdefault(name, []).append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    spark.stop()

    # --- parse the event log (Spark 4: eventlog_v2_<appId>/ dir) ---
    log_path = os.path.join(EVT_DIR, app_id)
    if not os.path.exists(log_path):
        cands = [f for f in os.listdir(EVT_DIR) if app_id in f]
        log_path = os.path.join(EVT_DIR, cands[0])
    if os.path.isdir(log_path):
        parts = sorted(
            os.path.join(log_path, f)
            for f in os.listdir(log_path)
            if f.startswith("events_")
        )
    else:
        parts = [log_path]

    def _lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    stage_info: dict[int, dict] = {}
    if True:
        for line in _lines():
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                jobs[jid] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
                for s in ev.get("Stage Infos", []):
                    stage_to_job[s["Stage ID"]] = jid
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
                stage_info[sid] = {
                    "tasks": si.get("Number of Tasks", 0),
                    "shuffle_write": int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0),
                    "shuffle_read": int(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0)
                    + int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0),
                    "run_ms": int(acc.get("internal.metrics.executorRunTime", 0) or 0),
                }

    per_entry: dict[str, dict] = {}
    for jid, j in jobs.items():
        desc = j.get("desc", "")
        if not desc.startswith("__prof__:"):
            continue
        name, run_i = desc.split(":")[1], int(desc.split(":")[2])
        if run_i != 0 and runs > 1:
            # keep run 0 only for breakdown (cold run, like bench's first)
            continue
        e = per_entry.setdefault(
            name,
            {"n_jobs": 0, "job_sec": 0.0, "n_stages": 0, "n_tasks": 0,
             "shuffle_rw_mb": 0.0, "task_sec": 0.0, "jobs": []},
        )
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        e["n_jobs"] += 1
        e["job_sec"] += dur
        st_tasks = st_rw = st_run = 0
        for sid in j["stages"]:
            si = stage_info.get(sid)
            if not si:
                continue
            e["n_stages"] += 1
            st_tasks += si["tasks"]
            st_rw += si["shuffle_write"] + si["shuffle_read"]
            st_run += si["run_ms"]
        e["n_tasks"] += st_tasks
        e["shuffle_rw_mb"] += st_rw / 1e6
        e["task_sec"] += st_run / 1000.0
        e["jobs"].append({"job": jid, "sec": round(dur, 3), "tasks": st_tasks,
                          "rw_mb": round(st_rw / 1e6, 2)})

    out = {}
    for name in names:
        e = per_entry.get(name, {})
        wall = walls.get(name, [])
        out[name] = {
            "wall_sec": [round(w, 3) for w in wall],
            "n_jobs": e.get("n_jobs", 0),
            "job_sec": round(e.get("job_sec", 0.0), 3),
            "driver_sec": round(wall[0] - e.get("job_sec", 0.0), 3) if wall else None,
            "n_stages": e.get("n_stages", 0),
            "n_tasks": e.get("n_tasks", 0),
            "task_sec": round(e.get("task_sec", 0.0), 3),
            "shuffle_rw_mb": round(e.get("shuffle_rw_mb", 0.0), 2),
            "jobs": sorted(e.get("jobs", []), key=lambda d: -d["sec"])[:12],
        }
    with open("/tmp/profile_entries.json", "w") as fh:
        json.dump(out, fh, indent=1)
    hdr = f"{'entry':<38}{'wall0':>8}{'jobs':>6}{'jobsec':>8}{'drv':>7}{'stages':>7}{'tasks':>7}{'tasksec':>8}{'shufMB':>8}"
    print(hdr)
    for name in names:
        o = out[name]
        w0 = o["wall_sec"][0] if o["wall_sec"] else float("nan")
        print(
            f"{name:<38}{w0:>8.2f}{o['n_jobs']:>6}{o['job_sec']:>8.2f}"
            f"{o['driver_sec']:>7.2f}{o['n_stages']:>7}{o['n_tasks']:>7}"
            f"{o['task_sec']:>8.2f}{o['shuffle_rw_mb']:>8.2f}"
        )


if __name__ == "__main__":
    main()
