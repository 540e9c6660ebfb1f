"""Bucketed co-located joins (sources/bucketed.py): the write-once
shuffle-never layout for the engine's repeated url_hash joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripwire_spark.sources.bucketed import colocated_join, write_bucketed


def _mk(spark, n, val):
    return spark.range(n).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id").alias(val),
    )


def test_colocated_join_has_no_exchange(spark, tmp_path):
    a = _mk(spark, 500, "a_val")
    b = _mk(spark, 300, "b_val")
    write_bucketed(a, "bk_left", str(tmp_path / "l"), "url_hash", buckets=8)
    write_bucketed(b, "bk_right", str(tmp_path / "r"), "url_hash", buckets=8)
    try:
        j = colocated_join(spark, "bk_left", "bk_right", "url_hash")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # matching bucket specs: the sort-merge join reads bucket files
        # pairwise — NO shuffle on either side, ever again
        assert "Exchange" not in plan, plan
        assert j.count() == 300
        # values line up (join actually matched on the hash key)
        bad = j.filter(F.col("a_val") != F.col("b_val")).count()
        assert bad == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_mismatched_bucket_counts_still_correct(spark, tmp_path):
    # wrong layout (different bucket counts) must stay CORRECT — the
    # zero-exchange plan is an optimization contract, not a semantics one
    a = _mk(spark, 100, "a_val")
    b = _mk(spark, 100, "b_val")
    write_bucketed(a, "bk_l2", str(tmp_path / "l2"), "url_hash", buckets=4)
    write_bucketed(b, "bk_r2", str(tmp_path / "r2"), "url_hash", buckets=8)
    try:
        j = colocated_join(spark, "bk_l2", "bk_r2", "url_hash")
        assert j.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_l2")
        spark.sql("DROP TABLE IF EXISTS bk_r2")


def test_bucketed_pages_fetch_join_pages_side_no_exchange(spark, tmp_path):
    """Round-4: fetch_extract over a pages table stored bucketed on a
    MATERIALIZED url_hash column + fetch_join='shuffle_hash' — the
    10^8-claimed-rows regime's plan.  The pages (fact) side must read
    pre-partitioned: the only Exchange in the plan is the claimed-keys
    side; no Exchange may output the html column."""
    from tripwire_spark.operators.crawl import fetch_extract
    from tripwire_spark.operators.frontier import build_frontier
    from tripwire_spark.sources.bucketed import write_bucketed
    from tripwire_spark.sources.synth import BLACKLIST_PATTERNS, synth_pages

    pages = synth_pages(spark, n_hosts=40, n_pages=3, n_links=3).withColumn(
        "url_hash", F.xxhash64("url")
    )
    write_bucketed(pages, "bk_pages", str(tmp_path / "pages"), "url_hash", buckets=8)
    try:
        seeds = spark.range(40).select(
            (F.col("id") + 1).cast("int").alias("alexa"),
            F.format_string("site%04d.test/p1", F.col("id")).alias("url"),
            F.col("id").alias("file_order"),
        )
        claimed = build_frontier(seeds, BLACKLIST_PATTERNS)
        out = fetch_extract(claimed, spark.table("bk_pages"), join="shuffle_hash")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "ShuffledHashJoin" in plan
        # parse Exchange detail blocks: none may carry the html bytes
        cur, offending = None, []
        for line in plan.splitlines():
            if line.startswith("(") and ")" in line:
                name = line.split(")", 1)[1].strip()
                cur = name if name.startswith("Exchange") else None
            elif cur and line.strip().startswith("Input") and "html" in line:
                offending.append(line)
        assert not offending, offending
        assert out.count() > 0  # and the join actually matches
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_pages")
