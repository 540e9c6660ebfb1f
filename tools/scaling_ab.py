"""Scaling-pair replicate under the EXACT bench config (round-5 ask #1).

Runs the bench's 1.5x-shape scaling pair (1 vs 4 slots, same
pre-written pages parquet, same session conf as bench.py's windows)
with 2 reps per window and 2 interleaved windows per side, then
reports raw N->4N efficiency and the Amdahl (w, c) fit — the exact
statistic BENCH_r{N}.json publishes, isolated so protocol/engine
changes can be measured without paying for the full bench.

Usage: python tools/scaling_ab.py [out.json] [n_hosts]
(pages parquet expected at /tmp/bench_pages_scale_sf0.1 — run bench.py
once, or synth_pages(...).write.parquet(...) it.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _LoadSampler, _stop, _wait_quiet, crawl_bench  # noqa: E402


def window(slots: int, n_hosts: int, pages_path: str, reps: int, nparts: int) -> dict:
    from tripwire_spark.session import get_spark

    _wait_quiet()
    sp = get_spark(
        f"scaleab-{slots}-{time.monotonic_ns() % 97}", cores=slots,
        shuffle_partitions=nparts,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024)},
    )
    with _LoadSampler() as ls:
        r = crawl_bench(sp, n_hosts=n_hosts, reps=reps, pages_path=pages_path)
    _stop(sp)
    r.update({"slots": slots, "load_mean": ls.mean, "load_peak": ls.peak,
              "clean": ls.mean <= 2 * slots + 3.0})
    print(json.dumps({k: v for k, v in r.items() if k != "urls"} | {"urls": r["urls"]}))
    return r


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5/scaling_ab.json"
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 90_000
    pages = os.environ.get("BENCH_PAGES_SCALE_DIR", "/tmp/bench_pages_scale_sf0.1")
    nparts = 16  # bench: 2 * slots_head
    obs = {1: [], 4: []}
    for _ in range(2):  # two interleaved windows per side
        for slots in (1, 4):
            obs[slots].append(window(slots, n_hosts, pages, reps=2, nparts=nparts))
    best = {k: min(s for r in v for s in r["rep_secs"]) for k, v in obs.items()}
    urls = obs[4][0]["urls"]
    eff = (urls / best[4]) / (urls / best[1]) / 4
    w_fit = (best[1] - best[4]) * 4 / 3
    c_fit = best[1] - w_fit
    result = {
        "experiment": "scaling_pair_bench_config",
        "n_hosts": n_hosts,
        "frontier_urls": urls,
        "best_1slot": best[1],
        "best_4slot": best[4],
        "efficiency_raw": round(eff, 3),
        "amdahl_fit": {"w_sec": round(w_fit, 1), "c_sec": round(c_fit, 1),
                       "raw_ceiling": round((w_fit + c_fit) / (w_fit + 4 * c_fit), 3)},
        "rep_secs": {k: [s for r in v for s in r["rep_secs"]] for k, v in obs.items()},
        "windows": [
            {"slots": r["slots"], "rep_secs": r["rep_secs"], "load_mean": r["load_mean"],
             "load_peak": r["load_peak"], "clean": r["clean"]}
            for v in obs.values() for r in v
        ],
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"efficiency_raw": result["efficiency_raw"],
                      "amdahl_fit": result["amdahl_fit"]}))


if __name__ == "__main__":
    main()
