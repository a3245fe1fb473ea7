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
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
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
    with open("/tmp/cdw_profile_walls.json", "w") as f:
        json.dump(walls, f)

    # ---- parse event log (plain file, or a Spark-4 eventlog_v2 dir) ----
    paths: list[str] = []
    for p in os.listdir(EVDIR):
        if appid not in p:
            continue
        full = os.path.join(EVDIR, p)
        if os.path.isdir(full):
            paths.extend(
                os.path.join(full, q)
                for q in sorted(os.listdir(full))
                if q.startswith("events")
            )
        else:
            paths.append(full)
    if not paths:
        print("no event log found", file=sys.stderr)
        return 1

    import itertools

    job_q: dict[int, str] = {}          # job id -> query name
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, dict] = {}    # stage id -> metrics
    with open(paths[0]) as _f0:
        lines = list(_f0)
    for p in paths[1:]:
        with open(p) as _f:
            lines.extend(_f)
    for line in lines:
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
            d = stage_info.setdefault(sid, {})
            d["tasks"] = si.get("Number of Tasks", 0)
            d["wall_ms"] = (comp - sub) if (sub and comp) else 0
            d["name"] = si.get("Stage Name", "")
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            acc = {
                a["Name"]: a.get("Update", 0)
                for a in (ev.get("Task Info") or {}).get("Accumulables", [])
                if a.get("Internal")
            }
            m = ev.get("Task Metrics") or {}
            d = stage_info.setdefault(sid, {"tasks": 0, "wall_ms": 0, "name": ""})
            d["run_ms"] = d.get("run_ms", 0) + (
                m.get("Executor Run Time")
                or acc.get("internal.metrics.executorRunTime", 0)
            )
            d["sh_read"] = d.get("sh_read", 0) + acc.get(
                "internal.metrics.shuffle.read.localBytesRead", 0
            ) + acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
            d["sh_write"] = d.get("sh_write", 0) + acc.get(
                "internal.metrics.shuffle.write.bytesWritten", 0
            )
            d["input"] = d.get("input", 0) + acc.get(
                "internal.metrics.input.bytesRead", 0
            )

    print(f"\n{'query':42s} {'wall':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s} "
          f"{'taskT(s)':>8s} {'stageW(s)':>9s} {'shRd(MB)':>8s} {'shWr(MB)':>8s} {'in(MB)':>7s}")
    per_q: dict[str, dict] = {}
    # Stage IDs dedup PER QUERY, not per job: stages shared (or
    # skipped-and-reused) across jobs of the same query would otherwise be
    # counted once per job, inflating tasks/task-time/shuffle totals.
    q_seen: dict[str, set] = {}
    for jid, qname in job_q.items():
        agg = per_q.setdefault(
            qname,
            {"jobs": 0, "stages": 0, "tasks": 0, "run_ms": 0, "wall_ms": 0,
             "sh_read": 0, "sh_write": 0, "input": 0},
        )
        agg["jobs"] += 1
        seen = q_seen.setdefault(qname, set())
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
    if "--stages" in sys.argv:
        # top stages per query by task run time, with stage names
        jq_stages: dict[str, list[int]] = {}
        for jid, qname in job_q.items():
            jq_stages.setdefault(qname, []).extend(job_stages.get(jid, []))
        for name in names:
            rows = [
                (stage_info[sid].get("run_ms", 0), stage_info[sid].get("wall_ms", 0),
                 stage_info[sid].get("tasks", 0), sid, stage_info[sid].get("name", ""))
                for sid in sorted(set(jq_stages.get(name, [])))
                if sid in stage_info
            ]
            rows.sort(reverse=True)
            print(f"\n== {name} (wall {walls.get(name)}s)")
            for run_ms, wall_ms, tasks, sid, sname in rows[:8]:
                print(f"  run={run_ms/1e3:6.2f}s stageWall={wall_ms/1e3:6.2f}s "
                      f"tasks={tasks:4d} sid={sid:5d} {sname[:90]}")
    print(f"\nevent logs: {paths}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
