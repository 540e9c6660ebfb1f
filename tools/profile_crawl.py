"""Per-stage scaling profiler for the crawl loop.

Runs ONE timed crawl rep at a given slot count over a pre-written pages
parquet (same protocol as bench.py's scaling windows), with the Spark
event log enabled, then attributes wall time:

  * per-stage wall (submission -> completion) and executor run time
  * DRIVER GAPS: wall intervals covered by no running stage — the
    serial time Amdahl's c is made of (broadcast builds, plan
    compilation, driver-side bookkeeping)

Usage:
  python tools/profile_crawl.py --slots 4 --hosts 180000 \
      --pages /tmp/bench_pages_scale_sf0.1

Compare two runs (1 vs 4 slots): a stage whose wall does not shrink
~4x is a non-scaling stage; gap time that stays constant is driver
serial time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--hosts", type=int, default=180_000)
    ap.add_argument("--pages", default="/tmp/bench_pages_scale_sf0.1")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--budget", type=int, default=6)
    ap.add_argument("--eventlog-dir", default="/tmp/crawl_eventlog")
    ap.add_argument("--skip-warmup", action="store_true")
    ap.add_argument("--mpb", type=int, default=None, help="spark.sql.files.maxPartitionBytes")
    args = ap.parse_args()

    os.makedirs(args.eventlog_dir, exist_ok=True)
    from pyspark.sql import SparkSession

    nparts = 16
    spark = (
        SparkSession.builder.master(f"local[{args.slots}]")
        .appName(f"profile-crawl-{args.slots}")
        .config("spark.sql.shuffle.partitions", str(nparts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", args.eventlog_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.files.maxPartitionBytes",
            str(args.mpb) if args.mpb else str(128 * 1024 * 1024),
        )
        .getOrCreate()
    )
    app_id = spark.sparkContext.applicationId

    from bench import _mk_seeds, _warm_python_workers
    from tripwire_spark.operators.crawl import run_crawl
    from tripwire_spark.sources.synth import BLACKLIST_PATTERNS, synth_robots

    pages = spark.read.parquet(args.pages)
    robots = synth_robots(spark, args.hosts)

    if not args.skip_warmup:
        _warm_python_workers(spark, args.slots)
        warm = run_crawl(
            spark, _mk_seeds(spark, max(1000, args.hosts // 50)), pages, robots,
            BLACKLIST_PATTERNS, max_rounds=args.rounds, default_budget=args.budget,
        )
        warm.frontier.count()
        warm.release()

    t0 = time.time()
    state = run_crawl(
        spark, _mk_seeds(spark, args.hosts), pages, robots, BLACKLIST_PATTERNS,
        max_rounds=args.rounds, default_budget=args.budget,
    )
    n = state.frontier.count()
    wall = time.time() - t0
    t_end_ms = time.time() * 1000
    state.release()
    print(f"== wall {wall:.1f}s  frontier {n}  slots {args.slots}  hosts {args.hosts}")

    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    spark.stop()
    time.sleep(1.0)

    # ---- parse event log ----
    log_path = None
    for f in os.listdir(args.eventlog_dir):
        if app_id in f:
            p = os.path.join(args.eventlog_dir, f)
            if os.path.isdir(p):  # eventlog_v2 rolling layout
                for g in os.listdir(p):
                    if g.startswith("events_"):
                        log_path = os.path.join(p, g)
            else:
                log_path = p
    stages = {}  # (stageId, attempt) -> dict
    with open(log_path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "sub": si.get("Submission Time"),
                    "tasks": si["Number of Tasks"],
                }
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                k = (si["Stage ID"], si["Stage Attempt ID"])
                if k in stages:
                    stages[k]["sub"] = si.get("Submission Time", stages[k]["sub"])
                    stages[k]["done"] = si.get("Completion Time")
                    acc = {a["Name"]: a for a in si.get("Accumulables", [])}
                    rt = acc.get("internal.metrics.executorRunTime", {}).get("Value", 0)
                    stages[k]["exec_ms"] = rt

    ivals = sorted(
        (s["sub"], s["done"], k[0], s["name"], s.get("exec_ms", 0), s["tasks"])
        for k, s in stages.items()
        if s.get("sub") and s.get("done")
    )
    # restrict to the timed rep window
    t_start_ms = t_end_ms - wall * 1000
    ivals = [iv for iv in ivals if iv[1] >= t_start_ms]

    # gap analysis over the timed window
    covered = []
    for sub, done, *_ in ivals:
        sub, done = max(sub, t_start_ms), min(done, t_end_ms)
        if done <= sub:
            continue
        if covered and sub <= covered[-1][1]:
            covered[-1] = (covered[-1][0], max(covered[-1][1], done))
        else:
            covered.append((sub, done))
    gap_total = t_end_ms - t_start_ms - sum(b - a for a, b in covered)
    print(f"== driver-gap time (no stage running): {gap_total/1000:.1f}s of {wall:.1f}s")

    # top stages by wall
    print("== stages in timed window (wall_s, exec_s, tasks, name):")
    agg = {}
    for sub, done, sid, name, exec_ms, tasks in ivals:
        w = (min(done, t_end_ms) - max(sub, t_start_ms)) / 1000
        key = name
        a = agg.setdefault(key, [0.0, 0.0, 0, 0])
        a[0] += w
        a[1] += exec_ms / 1000
        a[2] += tasks
        a[3] += 1
    for name, (w, e, tk, cnt) in sorted(agg.items(), key=lambda x: -x[1][0])[:25]:
        print(f"  {w:8.1f}  {e:8.1f}  {tk:5d}  x{cnt:<3d} {name}")

    # gap intervals > 1s, with neighbors for attribution
    print("== gaps > 1s (start_off_s, len_s, prev_stage -> next_stage):")
    prev = None
    evs = sorted(ivals, key=lambda x: x[0])
    bounds = [(t_start_ms, "<<rep start>>")]
    for sub, done, sid, name, *_ in evs:
        bounds.append((done, name))
    gap_list = []
    last_end = t_start_ms
    last_name = "<<rep start>>"
    for sub, done, sid, name, *_ in evs:
        if sub > last_end + 1000:
            gap_list.append((last_end, sub - last_end, last_name, name))
        if done > last_end:
            last_end, last_name = done, name
    if t_end_ms > last_end + 1000:
        gap_list.append((last_end, t_end_ms - last_end, last_name, "<<rep end>>"))
    for st, ln, pn, nn in sorted(gap_list, key=lambda x: -x[1])[:15]:
        print(f"  +{(st-t_start_ms)/1000:7.1f}s  {ln/1000:6.1f}s  {pn[:60]} -> {nn[:60]}")


if __name__ == "__main__":
    main()
