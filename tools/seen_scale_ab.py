"""Seen-state read-side scale experiment (round-4 VERDICT #4 evidence).

Question: does one admit() pass cost O(total seen-set size) or O(new
candidates)?  The old cogroup admit shipped every state segment through
its exchange once all buckets were touched — O(total) per round; scan
mode broadcasts the candidates' hashes onto the state scan instead, so
state bytes move zero hops (plan-asserted in tests/test_seen.py).

Protocol: build the seen state ONCE per history size (0.25M / 10M /
30M hashes ~ 2 MB / 80 MB / 240 MB of state), persist + materialize it
OUTSIDE every timed window, then time admit() of the same 100k-
candidate batch (noop sink) per mode, interleaved, best-of-3.  If scan
mode is right its wall stays ~flat in history while cogroup's grows
with the state bytes its exchange must carry.

Usage: python tools/seen_scale_ab.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from bench import _stop, _warm_python_workers
    from tripwire_spark.operators.seen import SeenState
    from tripwire_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local_r04_seen_ab.json"
    slots = 4
    sp = get_spark("seen-ab", cores=slots, shuffle_partitions=2 * slots)
    _warm_python_workers(sp, slots)
    svc = SeenState(n_buckets=64, capacity=40_000_000)

    def hashes(start: int, n: int):
        return sp.range(start, start + n).select(
            (F.col("id") * F.lit(2_654_435_761) + F.lit(7)).alias("url_hash")
        )

    n_cand = 100_000
    # half the candidates are already seen (ids overlap), half fresh —
    # the steady-state mix where membership actually filters
    cands = hashes(0, n_cand).persist()
    cands.count()

    runs = []
    for n_state in (250_000, 10_000_000, 30_000_000):
        state = svc.init(hashes(n_cand // 2, n_state), "url_hash").persist()
        state_bytes = state.agg(F.sum(F.length("hashes") + F.length("bloom"))).first()[0]
        # cogroup_bucketed (round-5): the state persisted BUCKETED on
        # `bucket` via the snapshot table (the run_crawl checkpoint
        # layout) — cogroup's state side then reads exchange-free, so
        # its cost should be ~flat in state size like scan's, while
        # plain in-memory cogroup ships the state bytes per admit.
        import shutil, tempfile
        from tripwire_spark.sources.snapshots import SnapshotTable
        ck = tempfile.mkdtemp(prefix="seen_ab_bk_")
        tbl = SnapshotTable(sp, ck, "seen_sketch", bucket_key="bucket", bucket_count=64)
        tbl.commit(state, {})
        state_bk = tbl.read_base()
        for mode, st_df in (("scan", state), ("cogroup", state),
                            ("cogroup_bucketed", state_bk)):
            kw = {"mode": mode.split("_")[0]}
            # warm the code path once, then best-of-3 timed
            svc.admit(cands, st_df, **kw).write.mode("overwrite").format("noop").save()
            secs = []
            for _ in range(3):
                t0 = time.time()
                svc.admit(cands, st_df, **kw).write.mode("overwrite").format("noop").save()
                secs.append(round(time.time() - t0, 3))
            runs.append({"mode": mode, "n_state": n_state,
                         "state_mb": round(state_bytes / 1e6, 1), "secs": secs,
                         "best": min(secs), "loadavg": round(os.getloadavg()[0], 2)})
            print(json.dumps(runs[-1]))
        state.unpersist()
        shutil.rmtree(ck, ignore_errors=True)
    _stop(sp)

    by = {(r["mode"], r["n_state"]): r["best"] for r in runs}
    growth = {m: round(by[(m, 30_000_000)] / by[(m, 250_000)], 3)
              for m in ("scan", "cogroup", "cogroup_bucketed")}
    result = {"experiment": "seen_admit_history_scaling", "slots": slots,
              "n_candidates": n_cand, "runs": runs,
              "admit_growth_120x_state": growth}
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(growth))


if __name__ == "__main__":
    main()
