"""Bench harness: headline queries + frontier-crawl throughput.

Prints ONE JSON line:
  {"metric": "frontier_throughput_urls_per_sec", "value": N,
   "unit": "sec", "queries": {name: sec, ...}, "sf": 0.1, ...}

Env:
  SPARK_GRAFT_SF_DIR  input dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    parallelism (default 32)
  BENCH_SCALING=1     also run the crawl at cores/4 and report the
                      N->4N throughput scaling efficiency (BASELINE.md)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> int:
    """Force full computation of every column (noop sink, no driver pull)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def crawl_bench(spark, n_hosts: int, rounds: int = 2) -> dict:
    """Frontier throughput: URLs scheduled+deduped per second."""
    from pyspark.sql import functions as F

    from tripwire_spark.operators.crawl import run_crawl
    from tripwire_spark.sources.synth import BLACKLIST_PATTERNS, synth_pages, synth_robots

    pages = synth_pages(spark, n_hosts=n_hosts, n_pages=5, n_links=5).persist()
    pages.count()  # materialize input outside the timed window
    seeds = (
        spark.range(n_hosts)
        .select(
            (F.col("id") + 1).cast("int").alias("alexa"),
            F.format_string("site%04d.test/p1", F.col("id")).alias("url"),
            F.col("id").alias("file_order"),
        )
    )
    robots = synth_robots(spark, n_hosts)
    t0 = time.time()
    state = run_crawl(
        spark, seeds, pages, robots, BLACKLIST_PATTERNS, max_rounds=rounds, default_budget=3
    )
    n_frontier = state.frontier.count()  # URLs scheduled + deduped (exact seen set)
    dt = time.time() - t0
    pages.unpersist()
    return {"urls": n_frontier, "sec": dt, "urls_per_sec": n_frontier / dt}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entrymod
    from tripwire_spark.session import get_spark

    spark = get_spark("bench", cores=cores, shuffle_partitions=cores)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    headline = [
        "tpch_q1",
        "login_info_5way",
        "politeness_rank",
        "frontier_schedule",
        "registration_status",
        "doc_exact_dedup",
    ]
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        _force(qs[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    # Frontier crawl throughput, scaled by sf (sf0.1 -> 2000 hosts, 10k pages).
    n_hosts = max(200, int(20000 * sf))
    crawl = crawl_bench(spark, n_hosts=n_hosts)
    times["frontier_crawl"] = round(crawl["sec"], 3)

    out = {
        "metric": "frontier_throughput_urls_per_sec",
        "value": round(crawl["urls_per_sec"], 2),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "frontier_urls": crawl["urls"],
        "cores": cores,
    }

    if os.environ.get("BENCH_SCALING") == "1":
        spark.stop()
        small = max(2, cores // 4)
        spark_small = get_spark("bench-small", cores=small, shuffle_partitions=small)
        crawl_small = crawl_bench(spark_small, n_hosts=n_hosts)
        spark_small.stop()
        eff = (crawl["urls_per_sec"] / crawl_small["urls_per_sec"]) / (cores / small)
        out["scaling"] = {
            "cores_small": small,
            "cores_large": cores,
            "urls_per_sec_small": round(crawl_small["urls_per_sec"], 2),
            "urls_per_sec_large": round(crawl["urls_per_sec"], 2),
            "efficiency": round(eff, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
