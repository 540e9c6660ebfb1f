"""Physical-plan shape assertions (SURVEY.md §4): the optimizations the
engine depends on at 100 TB must be visible in the plan at any sf —
filters reaching the parquet scan, dimension joins broadcast, codegen
covering the hot expressions, and the pages fact side never shuffled by
the fetch join.  These are regression tests: a refactor that silently
turns a broadcast join into a sort-merge shuffle fails here, not in a
cluster bill."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_claim_filter_pushdown(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["claim_filter"](spark, SF))
    assert "PushedFilters:" in plan
    # both predicates reach the parquet scan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1][:300]
    assert "o_totalprice" in plan.split("PushedFilters:")[1][:300]


def test_claim_filter_column_pruning(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["claim_filter"](spark, SF))
    # ReadSchema restricted to the 3 projected + filtered columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read and "o_custkey" in read and "o_totalprice" in read
    assert "o_comment" not in read  # untouched wide column pruned


def test_login_info_dims_broadcast(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["login_info_5way"](spark, SF))
    # nation + region are broadcast; the lineitem fact side must never be
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # partial+final hash aggregation (map-side combine before the exchange)
    assert "partial_count" in plan or plan.count("HashAggregate") >= 2


def test_fetch_join_broadcasts_claimed_not_pages(spark):
    from tripwire_spark.operators.crawl import fetch_extract
    from tripwire_spark.operators.frontier import build_frontier
    from tripwire_spark.sources.synth import BLACKLIST_PATTERNS, synth_pages

    seeds = spark.range(50).select(
        (F.col("id") + 1).cast("int").alias("alexa"),
        F.format_string("site%04d.test/p1", F.col("id")).alias("url"),
        F.col("id").alias("file_order"),
    )
    claimed = build_frontier(seeds, BLACKLIST_PATTERNS)
    pages = synth_pages(spark, n_hosts=50, n_pages=3, n_links=3)
    plan = _plan(fetch_extract(claimed, pages))
    # the claimed (frontier) side is the build side of a broadcast hash
    # join; a sort-merge join here would shuffle the 100 TB pages table
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the switchover flag (round-4, VERDICT #3): past ~10^8 claimed
    # rows/round the driver-built broadcast is the serial bottleneck —
    # shuffle_hash distributes the hash-relation build across executors
    plan_sh = _plan(fetch_extract(claimed, pages, join="shuffle_hash"))
    assert "ShuffledHashJoin" in plan_sh
    assert "BroadcastHashJoin" not in plan_sh and "SortMergeJoin" not in plan_sh


def test_field_pattern_match_is_shuffle_free(spark):
    """C19 matching is a literal-regex projection: the whole expanded
    pattern table evaluates scan-side — no join, no exchange.  At 100 TB
    the fields table streams through one codegen stage."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["field_pattern_match"](spark, SF))
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_fill_plan_is_shuffle_free(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["fill_plan"](spark, SF))
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_politeness_aggregates_map_side(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["tpch_q1"](spark, SF))
    # partial aggregation before the exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters:" in plan


def test_accept_mail_parses_each_message_once(spark):
    """The raw RFC-822 parse UDF must appear exactly once in the
    physical plan: metadata (to_addr, subject) rides THROUGH the url
    pipeline instead of joining back to the parsed frame, which would
    re-parse every message on the second side of the join."""
    import pyspark.sql.functions as F

    from tripwire_spark.operators.mail_pipeline import accept_mail

    raw = spark.range(20).select(
        F.col("id").alias("umid"),
        F.concat(
            F.lit("To: user@example.test\r\nSubject: Please confirm your account\r\n"
                  "Content-Type: text/plain\r\n\r\nClick http://conf"),
            F.col("id"),
            F.lit(".test/verify?t=1 now"),
        ).alias("raw"),
    )
    out = accept_mail(raw)
    plan = _plan(out)
    assert plan.count("parse_message") == 1, plan
    assert out.count() == 20  # and the pipeline still yields one row per mail


def test_dsir_model_join_is_broadcast(spark):
    """The DSIR bucket model (<= 4096 rows) must come back to the gram
    stream as a broadcast — a sort-merge there would shuffle the whole
    exploded bigram stream by bucket at 100 TB."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["dsir_importance"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_no_cartesian_and_partial_agg(spark):
    """tf-idf's corpus-size normalizer is a 1-row broadcast (never a
    cartesian over data), and the term-df aggregation must show
    map-side partial aggregation (the Zipf-skew absorber)."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["tfidf_top_terms"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_page_rank_iteration_joins_stay_hash(spark):
    """PageRank's per-iteration edge x rank join is keyed by node; no
    iteration may degrade to a cartesian, and the rank updates must
    partially aggregate before the exchange."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["host_rank"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
