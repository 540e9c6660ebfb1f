"""Seen-state read-side scale experiment (round-4 VERDICT #4 evidence).

Question: does the per-round admit cost grow with TOTAL seen-set size
(history) or only with the round's NEW urls?  The old cogroup admit
shipped every state segment through its exchange once all buckets were
touched — O(total) per round; scan mode broadcasts the candidates'
hashes onto the state scan instead, so state bytes move zero hops.

Protocol: the SAME 2-round crawl (sf0.01 shape, 4 slots) runs with the
initial seen set preloaded with 0x / 100x / 300x synthetic history
hashes (disjoint from real urls — results identical, only state size
varies), once per admit mode.  If scan mode is right, its wall stays
~flat in history while cogroup's grows with it.

Usage: python tools/seen_scale_ab.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _mk_seeds, _stop, _warm_python_workers  # noqa: E402


def one_run(mode: str, hist_mult: int, n_hosts: int, pages_path: str, slots: int) -> dict:
    import pyspark.sql.functions as F

    from tripwire_spark.operators.crawl import run_crawl
    from tripwire_spark.session import get_spark
    from tripwire_spark.sources.synth import BLACKLIST_PATTERNS, synth_robots

    sp = get_spark(f"seen-ab-{mode}-{hist_mult}", cores=slots, shuffle_partitions=2 * slots,
                   extra_conf={"spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024)})
    pages = sp.read.parquet(pages_path)
    robots = synth_robots(sp, n_hosts)
    # ~33k urls enter the frontier in this shape; history = mult * 33k
    # synthetic hashes in a disjoint range (never collide with xxhash64
    # of real urls in practice; collisions would only shrink the
    # frontier identically across arms anyway)
    preload = None
    if hist_mult:
        preload = sp.range(33_000 * hist_mult).select(
            (F.col("id") * F.lit(2_654_435_761) + F.lit(10**15)).alias("url_hash")
        )
    _warm_python_workers(sp, slots)
    warm = run_crawl(sp, _mk_seeds(sp, max(500, n_hosts // 50)), pages, robots,
                     BLACKLIST_PATTERNS, max_rounds=2, default_budget=6, seen_mode=mode)
    warm.frontier.count()
    warm.release()
    secs = []
    for _ in range(2):
        t0 = time.time()
        st = run_crawl(sp, _mk_seeds(sp, n_hosts), pages, robots, BLACKLIST_PATTERNS,
                       max_rounds=2, default_budget=6, seen_mode=mode,
                       seen_preload=preload)
        n = st.frontier.count()
        secs.append(round(time.time() - t0, 2))
        st.release()
    _stop(sp)
    return {"mode": mode, "hist_mult": hist_mult, "secs": secs,
            "best": min(secs), "frontier_urls": n,
            "loadavg": round(os.getloadavg()[0], 2)}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local_r04_seen_ab.json"
    n_hosts, slots = 6000, 4
    pages_path = "/tmp/seen_ab_pages"
    from tripwire_spark.session import get_spark
    from tripwire_spark.sources.synth import synth_pages

    sp = get_spark("seen-ab-gen", cores=8, shuffle_partitions=8)
    synth_pages(sp, n_hosts=n_hosts, n_pages=10, n_links=30, n_words=1200,
                num_partitions=16).write.mode("overwrite").parquet(pages_path)
    _stop(sp)

    runs = []
    # interleave modes per history level so tenant drift hits both arms
    for hist in (0, 100, 300):
        for mode in ("scan", "cogroup"):
            runs.append(one_run(mode, hist, n_hosts, pages_path, slots))
            print(json.dumps(runs[-1]))
    result = {"experiment": "seen_state_history_scaling", "n_hosts": n_hosts,
              "slots": slots, "rounds": 2, "runs": runs}
    by = {(r["mode"], r["hist_mult"]): r["best"] for r in runs}
    result["growth_0_to_300x"] = {
        m: round(by[(m, 300)] / by[(m, 0)], 3) for m in ("scan", "cogroup")
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["growth_0_to_300x"]))


if __name__ == "__main__":
    main()
