#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

Runs named queries exactly like bench.py (same session factory, same noop
sink, same sf0.001 warmup, same artifact-state discipline) but with the
Spark event log enabled, then parses the log to attribute jobs/stages to
each query via setJobDescription. Prints, per query:

  wall seconds, #jobs, #stages, #tasks, executor task-time (sum),
  shuffle read/write bytes, input bytes, python-eval presence.

Optionally dumps .explain("formatted") for each query to plans/r12/.

Usage:
  python scripts/profile_query.py NAME [NAME...]       # profile queries
  python scripts/profile_query.py --plans NAME...      # also dump plans
  SPARK_GRAFT_BENCH_ARTIFACTS=warm ... to keep the at-rest index store.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdw_spark.registry import load_all
from cdw_spark.session import get_spark

EVDIR = "/tmp/cdw_profile_events"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="cdw_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    names = [n for n in args if n in specs]
    missing = [n for n in args if n not in specs]
    if missing:
        print("unknown queries:", missing, file=sys.stderr)

    # bench.py warmup parity: one-time JVM costs off the record
    for name in names:
        specs[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    artifact_state = os.environ.get("SPARK_GRAFT_BENCH_ARTIFACTS", "cold")
    if artifact_state != "warm":
        from cdw_spark.operators.artifacts import clear_all

        clear_all()

    walls: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"PROFILE::{name}")
        t0 = time.time()
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        if dump_plans:
            os.makedirs("plans/r12", exist_ok=True)
            with open(f"plans/r12/{name}_profile.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        gc.collect()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()

    # flush the event log
    appid = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)

    # ---- parse event log ----
    path = None
    for p in os.listdir(EVDIR):
        if appid in p:
            path = os.path.join(EVDIR, p)
    if path is None:
        print("no event log found", file=sys.stderr)
        return 1

    job_q: dict[int, str] = {}          # job id -> query name
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, dict] = {}    # stage id -> metrics
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                if desc.startswith("PROFILE::"):
                    jid = ev["Job ID"]
                    job_q[jid] = desc[len("PROFILE::"):]
                    job_stages[jid] = [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stage_info[sid] = {
                    "tasks": si.get("Number of Tasks", 0),
                    "wall_ms": (comp - sub) if (sub and comp) else 0,
                    "name": si.get("Stage Name", ""),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                d = stage_info.setdefault(sid, {"tasks": 0, "wall_ms": 0, "name": ""})
                d["run_ms"] = d.get("run_ms", 0) + m.get("Executor Run Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                swm = m.get("Shuffle Write Metrics") or {}
                im = m.get("Input Metrics") or {}
                d["sh_read"] = d.get("sh_read", 0) + srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                d["sh_write"] = d.get("sh_write", 0) + swm.get("Shuffle Bytes Written", 0)
                d["input"] = d.get("input", 0) + im.get("Bytes Read", 0)

    print(f"\n{'query':42s} {'wall':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s} "
          f"{'taskT(s)':>8s} {'stageW(s)':>9s} {'shRd(MB)':>8s} {'shWr(MB)':>8s} {'in(MB)':>7s}")
    per_q: dict[str, dict] = {}
    for jid, qname in job_q.items():
        agg = per_q.setdefault(
            qname,
            {"jobs": 0, "stages": 0, "tasks": 0, "run_ms": 0, "wall_ms": 0,
             "sh_read": 0, "sh_write": 0, "input": 0},
        )
        agg["jobs"] += 1
        seen = set()
        for sid in job_stages.get(jid, []):
            if sid not in stage_info or sid in seen:
                continue
            seen.add(sid)
            si = stage_info[sid]
            # skipped stages have no tasks recorded
            if si.get("run_ms") is None and si.get("tasks", 0) == 0:
                continue
            agg["stages"] += 1
            agg["tasks"] += si.get("tasks", 0)
            agg["run_ms"] += si.get("run_ms", 0)
            agg["wall_ms"] += si.get("wall_ms", 0)
            agg["sh_read"] += si.get("sh_read", 0)
            agg["sh_write"] += si.get("sh_write", 0)
            agg["input"] += si.get("input", 0)
    for name in names:
        a = per_q.get(name)
        if a is None:
            print(f"{name:42s} {walls.get(name, -1):7.2f}  (no jobs attributed)")
            continue
        print(f"{name:42s} {walls.get(name, -1):7.2f} {a['jobs']:5d} {a['stages']:6d} "
              f"{a['tasks']:6d} {a['run_ms']/1e3:8.2f} {a['wall_ms']/1e3:9.2f} "
              f"{a['sh_read']/1e6:8.2f} {a['sh_write']/1e6:8.2f} {a['input']/1e6:7.2f}")
    print(f"\nevent log: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
