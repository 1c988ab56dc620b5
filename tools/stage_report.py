#!/usr/bin/env python3
"""Summarize a Spark event log: per-stage wall time, task count, summed
task time, and the job description it ran under. Diagnostics for the
r06 optimization round (guide §7.1 without a live UI).

Usage: python3 tools/stage_report.py /tmp/spark-events/<app-id> [minMs]
"""
import json, sys, collections

path = sys.argv[1]
min_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 50

stages = {}          # id -> dict
job_desc = {}        # jobId -> description
stage_job = {}       # stageId -> jobId

with open(path) as f:
    for line in f:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            job_desc[jid] = ev.get("Properties", {}).get(
                "spark.job.description", "")
            for sid in ev.get("Stage IDs", []):
                stage_job[sid] = jid
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", "")[:70],
                "wall_ms": (comp - sub) if sub and comp else -1,
                "tasks": si.get("Number of Tasks", -1),
            }
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            st = stages.setdefault(sid, {})
            st["task_ms"] = st.get("task_ms", 0) + m.get("Executor Run Time", 0)
            st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
            sr = (m.get("Shuffle Read Metrics") or {})
            st["sh_read"] = st.get("sh_read", 0) + sr.get("Remote Bytes Read", 0) \
                + sr.get("Local Bytes Read", 0)
            sw = (m.get("Shuffle Write Metrics") or {})
            st["sh_write"] = st.get("sh_write", 0) + sw.get("Shuffle Bytes Written", 0)

rows = [(sid, st) for sid, st in sorted(stages.items())
        if st.get("wall_ms", 0) >= min_ms]
total_wall = sum(st.get("wall_ms", 0) for _, st in rows)
print(f"{'sid':>4} {'wall_ms':>8} {'tasks':>6} {'task_s':>7} {'gc_s':>5} "
      f"{'shR_MB':>7} {'shW_MB':>7}  desc/name")
for sid, st in rows:
    desc = job_desc.get(stage_job.get(sid, -1), "")
    label = (desc or st.get("name", ""))[:80]
    print(f"{sid:>4} {st.get('wall_ms', -1):>8} {st.get('tasks', -1):>6} "
          f"{st.get('task_ms', 0)/1000:>7.1f} {st.get('gc_ms', 0)/1000:>5.1f} "
          f"{st.get('sh_read', 0)/1e6:>7.1f} {st.get('sh_write', 0)/1e6:>7.1f}  {label}")
print(f"total stage wall (>= {min_ms} ms): {total_wall/1000:.2f}s")
