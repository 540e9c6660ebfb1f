"""Fetch-join strategy A/B at the 3x scale shape (round-4 VERDICT #3).

Round 3 measured the per-run serial constant c of the Amdahl fit
T(k) = w/k + c growing from 24 s (1.5x shape) to 150 s (3x shape) and
attributed it to the claimed-set broadcast being BUILT SINGLE-THREADED
ON THE DRIVER each round (plus proportional commit barriers).  The fix
landed as ``run_crawl(fetch_join='shuffle_hash')``: the hash-relation
build becomes distributed executor work.  This experiment measures the
same 3x-shape (1-slot, 4-slot) pair per strategy and reports each fit.

Success = the shuffle_hash fit's c is materially below broadcast's at
3x (and its raw ceiling (w+c)/(w+4c) correspondingly higher).

Usage: python tools/fetch_join_ab.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _mk_seeds, _stop, _wait_quiet, _LoadSampler, crawl_bench  # noqa: E402


def window(join: str, slots: int, n_hosts: int, pages_path: str, reps: int) -> dict:
    from tripwire_spark.session import get_spark

    _wait_quiet()
    sp = get_spark(
        f"fetchab-{join}-{slots}", cores=slots, shuffle_partitions=16,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024)},
    )
    with _LoadSampler() as ls:
        r = crawl_bench(sp, n_hosts=n_hosts, reps=reps, pages_path=pages_path,
                        crawl_kwargs={"fetch_join": join})
    _stop(sp)
    r.update({"join": join, "slots": slots, "load_mean": ls.mean, "load_peak": ls.peak,
              "clean": ls.mean <= 2 * slots + 3.0})
    print(json.dumps(r))
    return r


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local_r04_fetch_ab.json"
    sf = 0.1
    n_hosts = int(3 * 600_000 * sf)  # the 3x shape of BENCH_local_r03c
    pages_path = f"/tmp/fetch_ab_pages_{n_hosts}"
    if not os.path.isdir(pages_path):
        from tripwire_spark.session import get_spark
        from tripwire_spark.sources.synth import synth_pages

        sp = get_spark("fetchab-gen", cores=32, shuffle_partitions=32)
        synth_pages(sp, n_hosts=n_hosts, n_pages=10, n_links=30, n_words=1200,
                    num_partitions=64).write.mode("overwrite").parquet(pages_path)
        _stop(sp)

    t0 = time.time()
    runs = []
    # 4-slot sides first (fast), then the two 1-slot sides interleaved
    for join in ("broadcast", "shuffle_hash"):
        runs.append(window(join, 4, n_hosts, pages_path, reps=2))
    for join in ("broadcast", "shuffle_hash"):
        runs.append(window(join, 1, n_hosts, pages_path, reps=1))

    result = {"experiment": "fetch_join_ab_3x", "n_hosts": n_hosts, "runs": runs,
              "wall_total_s": round(time.time() - t0, 1)}
    fits = {}
    for join in ("broadcast", "shuffle_hash"):
        t4 = min(min(r["rep_secs"]) for r in runs if r["join"] == join and r["slots"] == 4)
        t1 = min(min(r["rep_secs"]) for r in runs if r["join"] == join and r["slots"] == 1)
        w = (t1 - t4) * 4 / 3
        c = t1 - w
        fits[join] = {"t1_best": t1, "t4_best": t4, "w_sec": round(w, 1),
                      "c_sec": round(c, 1),
                      "raw_ceiling": round((w + c) / (w + 4 * c), 3) if c >= 0 else None,
                      "raw_efficiency": round(t1 / t4 / 4, 3)}
    result["amdahl_fits"] = fits
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(fits))


if __name__ == "__main__":
    main()
