"""Offline Spark event-log analyzer: per-stage work attribution.

Usage: python tools/analyze_eventlog.py <eventlog file or dir> [--window t0_ms t1_ms]

Prints per-stage: wall, executorRunTime, executorCpuTime, jvmGCTime,
shuffle bytes, task count, and the RDD scope name — enough to compare a
1-slot vs 4-slot run of the same job and see which stages fail to
scale (run time not shrinking) and why (cpu < run => waiting; GC; etc.)
"""

from __future__ import annotations

import json
import os
import sys


def iter_events(path: str):
    if os.path.isdir(path):
        for g in sorted(os.listdir(path)):
            if g.startswith("events_"):
                path = os.path.join(path, g)
                break
    with open(path) as fh:
        for line in fh:
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def main() -> None:
    path = sys.argv[1]
    tail_s = float(sys.argv[2]) if len(sys.argv) > 2 else None
    stages = {}
    stage_desc = {}  # stageId -> job description (from setJobDescription)
    for ev in iter_events(path):
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get("spark.job.description", "")
            for sid in ev.get("Stage IDs", []):
                stage_desc[sid] = desc
        if t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            k = (si["Stage ID"], si["Stage Attempt ID"])
            acc = {a["Name"]: a.get("Value", 0) for a in si.get("Accumulables", [])}
            rdds = si.get("RDD Info", [])
            scope = ""
            for r in rdds:
                sc = r.get("Scope")
                if sc:
                    try:
                        scope = json.loads(sc).get("name", "")
                    except Exception:
                        pass
                    if scope:
                        break
            stages[k] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "desc": stage_desc.get(si["Stage ID"], ""),
                "scope": scope,
                "sub": si.get("Submission Time", 0),
                "done": si.get("Completion Time", 0),
                "tasks": si["Number of Tasks"],
                "run_s": acc.get("internal.metrics.executorRunTime", 0) / 1000,
                "cpu_s": acc.get("internal.metrics.executorCpuTime", 0) / 1e9,
                "gc_s": acc.get("internal.metrics.jvmGCTime", 0) / 1000,
                "deser_s": acc.get("internal.metrics.executorDeserializeTime", 0) / 1000,
                "sh_read_mb": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) / 2**20
                + acc.get("internal.metrics.shuffle.read.localBytesRead", 0) / 2**20,
                "sh_write_mb": acc.get("internal.metrics.shuffle.write.bytesWritten", 0) / 2**20,
                "input_mb": acc.get("internal.metrics.input.bytesRead", 0) / 2**20,
                "result_mb": acc.get("internal.metrics.resultSize", 0) / 2**20,
            }

    if tail_s is not None and stages:
        t_max = max(s["done"] for s in stages.values() if s["done"])
        cut = t_max - tail_s * 1000
        stages = {k: s for k, s in stages.items() if s["done"] >= cut}
        base = cut
        for s in stages.values():
            s["off"] = (s["sub"] - base) / 1000
    rows = sorted(stages.values(), key=lambda s: -s["run_s"])
    tot_run = sum(s["run_s"] for s in rows)
    tot_cpu = sum(s["cpu_s"] for s in rows)
    tot_gc = sum(s["gc_s"] for s in rows)
    print(f"TOTAL exec run {tot_run:.1f}s  cpu {tot_cpu:.1f}s  gc {tot_gc:.1f}s  stages {len(rows)}")
    print(f"{'run_s':>8} {'cpu_s':>8} {'gc_s':>6} {'wall':>7} {'tasks':>5} {'shR_mb':>7} {'shW_mb':>7} {'in_mb':>7} {'res_mb':>7}  scope/name")
    for s in rows[:30]:
        wall = (s["done"] - s["sub"]) / 1000 if s["done"] else 0
        label = s["scope"] or s["name"]
        if s.get("desc"):
            label = f"[{s['desc'][:40]}] {label}"
        print(
            f"{s['run_s']:8.1f} {s['cpu_s']:8.1f} {s['gc_s']:6.1f} {wall:7.1f} {s['tasks']:5d} "
            f"{s['sh_read_mb']:7.0f} {s['sh_write_mb']:7.0f} {s['input_mb']:7.0f} {s['result_mb']:7.2f}  {label}"
        )
    # roll up by job description — the Amdahl attribution view
    by_desc = {}
    for s in stages.values():
        d = s.get("desc") or "(no description)"
        a = by_desc.setdefault(d, [0.0, 0.0, 0])
        a[0] += s["run_s"]
        a[1] += s["cpu_s"]
        a[2] += s["tasks"]
    print("\nBY JOB DESCRIPTION (run_s, cpu_s, tasks):")
    for d, (r, c, tk) in sorted(by_desc.items(), key=lambda x: -x[1][0]):
        print(f"{r:8.1f} {c:8.1f} {tk:6d}  {d[:80]}")


if __name__ == "__main__":
    main()
