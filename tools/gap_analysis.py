"""Timeline-gap analysis of a Spark event log: where is the serial constant?

Usage: python tools/gap_analysis.py <eventlog>

Builds a task-execution timeline and reports wall intervals with ZERO
running tasks (pure driver time: planning, AQE, broadcast builds,
checkpoint coordination) attributed to the job description of the NEXT
stage that starts, plus per-description totals.  At local[1] everything
that is not a zero-task gap is executor work (scales with slots); the
gaps are the Amdahl constant c.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    events = []  # (ts, +1/-1)
    stage_desc = {}
    stage_sub = []  # (submit_ts, desc)
    t_min, t_max = None, None
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                for sid in ev.get("Stage IDs", []):
                    stage_desc[sid] = desc
            elif t == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                ts = si.get("Submission Time")
                if ts:
                    stage_sub.append((ts, stage_desc.get(si["Stage ID"], "")))
            elif t == "SparkListenerTaskStart":
                ts = ev["Task Info"]["Launch Time"]
                events.append((ts, 1))
                t_min = ts if t_min is None else min(t_min, ts)
            elif t == "SparkListenerTaskEnd":
                te = ev["Task Info"]["Finish Time"]
                events.append((te, -1))
                t_max = te if t_max is None else max(t_max, te)
    events.sort()
    stage_sub.sort()

    # sweep: intervals by concurrency level
    by_level = defaultdict(float)
    gaps = []  # (start, end) with zero tasks
    cur = 0
    prev = t_min
    for ts, d in events:
        if ts > prev:
            by_level[cur] += (ts - prev) / 1000
            if cur == 0:
                gaps.append((prev, ts))
        cur += d
        prev = ts

    wall = (t_max - t_min) / 1000
    print(f"wall {wall:.1f}s   time at concurrency level (s):")
    for lvl in sorted(by_level):
        print(f"  {lvl:3d} running: {by_level[lvl]:8.1f}")

    # attribute each zero-task gap to the next stage submitted after it
    attr = defaultdict(float)
    import bisect

    sub_ts = [s[0] for s in stage_sub]
    for g0, g1 in gaps:
        dur = (g1 - g0) / 1000
        if dur < 0.05:
            continue
        i = bisect.bisect_left(sub_ts, g1)
        desc = stage_sub[i][1] if i < len(stage_sub) else "(end)"
        attr[desc or "(no description)"] += dur
    print("\nzero-task gap time by next-stage job description:")
    for d, s in sorted(attr.items(), key=lambda x: -x[1]):
        print(f"  {s:8.1f}s  {d[:90]}")
    # largest individual gaps
    big = sorted(gaps, key=lambda g: g[0] - g[1])[:12]
    print("\nlargest individual gaps (offset_s, dur_s, next stage):")
    for g0, g1 in sorted(big, key=lambda g: g[1] - g[0], reverse=True)[:12]:
        dur = (g1 - g0) / 1000
        i = bisect.bisect_left(sub_ts, g1)
        desc = stage_sub[i][1] if i < len(stage_sub) else "(end)"
        print(f"  {(g0 - t_min) / 1000:8.1f} {dur:7.2f}  {desc[:80]}")


if __name__ == "__main__":
    main()
