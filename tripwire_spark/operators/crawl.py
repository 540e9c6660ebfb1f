"""Crawl rounds: fetch (join against the pages table), extraction,
link discovery, frontier evolution, checkpoint/resume.

This is the Spark-first restatement of the reference's
claim/execute/settle loop (runners/run_queue_nowrap:586-699, SURVEY.md
§3.2): the live CasperJS page load is replaced by an **equi-join of the
claimed frontier against the Common-Crawl-style pages table** (J11);
one "round" = one deterministic batch over the whole claimable set
instead of one worker claiming one row.

Per round:
1. politeness schedule (W2 rank under budget, robots filter)
2. salted-host repartition -> join pages on url (AQE-planned; the
   claimed side is broadcast when small)
3. extraction: byte-identical text (pageUtils.js:58-61), link + form
   candidates (vectorized pandas UDFs)
4. link scoring (C18 + D3 combine), blacklist (F1), canonicalize,
   in-round dedup, anti-join the exact seen set (D7 / F2 analog; the
   partitioned Bloom pre-filter slots in front at scale — see seen.py)
5. settle: status transitions (T2), qid assignment for discoveries,
   fetch_log (S10) + decision_log (S9) appends
6. snapshot commit per state table (= Iceberg snapshot per round;
   resume = read latest committed round).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripwire_spark.functions.html import extract_links, extract_text
from tripwire_spark.functions.scoring import link_weight
from tripwire_spark.functions.urls import reg_domain, resolve_canonicalize, url_hash, url_host
from tripwire_spark.operators.frontier import (
    FRONTIER_COLS,
    ST_QUEUED,
    blacklist_regex,
    build_frontier,
    politeness_schedule,
    seed_decision_log,
    settle,
)
from tripwire_spark.operators.ids import assign_dense_ids
from tripwire_spark.sources.snapshots import SnapshotTable

# Discovered URLs get qids above every seed qid: round r base = r << 40.
ROUND_QID_BASE = 1 << 40


def fetch_pages(claimed: DataFrame, pages: DataFrame, persist: bool = True) -> tuple[DataFrame, DataFrame]:
    """J11: the 'page load' as an equi-join on canonical url.

    The pages side is the 100 TB fact table and is NEVER shuffled.  A
    plain left join could not broadcast its outer (claimed) side, so it
    would sort-merge-shuffle the whole pages table; instead:

    - hits  = broadcast(claimed) INNER JOIN pages — the scan streams
      past a broadcast hash table of one round's claims (bounded by
      |hosts| x budget);
    - misses = claimed LEFT ANTI hits on qid — both sides tiny.

    Downstream extraction is per-row (no host co-location needed); AQE
    coalesces post-join partitions.  Host skew is defused inside
    politeness_schedule (two-phase salted ranking).  Assumes ``pages``
    holds one canonical snapshot row per url (dedup-at-ingest, like the
    reference's one-live-page-per-fetch).
    """
    pg = pages.select(
        F.col("url").alias("p_url"), "warc_ts", "html", F.col("text").alias("page_text"), "lang"
    )
    hits = (
        claimed.hint("broadcast")
        .join(pg, claimed["url"] == pg["p_url"], "inner")
        .drop("p_url")
        .withColumn("found", F.lit(True))
    )
    if persist:
        # Pin hits so the pages scan runs exactly once per round (the
        # miss anti-join and every downstream consumer read the cache).
        hits = hits.persist()
    misses = (
        claimed.join(F.broadcast(hits.select("qid")), "qid", "left_anti")
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("page_text", F.lit(None).cast("string"))
        .withColumn("lang", F.lit(None).cast("string"))
        .withColumn("found", F.lit(False))
    )
    return hits.unionByName(misses), hits


def extract_round(fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (results, discovered_links).

    results: (qid, url, round, text, lang) — ``text`` is re-extracted
    from html (NOT copied from the pages table), so the byte-identical
    invariant is enforced by construction and testable against the
    independent generator.
    """
    hits = fetched.filter(F.col("found"))
    results = hits.select(
        "qid",
        "url",
        extract_text("html").alias("text"),
        "lang",
        "warc_ts",
    )
    links = (
        hits.select("qid", "url", F.explode(extract_links("html")).alias("l"))
        .select(
            F.col("qid").alias("parent_qid"),
            F.col("url").alias("parent_url"),
            F.col("l.href").alias("href"),
            F.col("l.text").alias("anchor_text"),
            F.col("l.pos").alias("pos"),
        )
    )
    return results, links


def discover(
    links: DataFrame,
    seen: DataFrame,
    patterns: list[str],
    round_no: int,
    vid: int = 1,
    queue: str = "default",
    bloom=None,
    sketch: DataFrame | None = None,
    caches: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Score, filter, canonicalize, dedup, and anti-join new links.

    Returns (new_frontier_rows, decision_log_rows).
    Discovery order (and hence qid order) is pinned to
    (-weight, parent_qid, pos): best-scoring links first, ties broken by
    the FIFO order of the page that found them — the deterministic
    analog of 'click the best link first' (pagefinder.js:122,246-249).
    """
    bl = blacklist_regex(patterns)
    scored = (
        links.withColumn("curl", resolve_canonicalize("parent_url", "href"))
        .filter(F.col("curl").isNotNull())
        .withColumn("weight", F.coalesce(link_weight("anchor_text"), F.lit(0.0)))
    )
    # Decision log for every candidate (S9).
    decisions = scored.withColumn(
        "decision",
        F.when(F.col("curl").rlike(bl), F.lit("skipped-blacklist"))
        .when(F.col("weight") < 0, F.lit("skipped-negative-weight"))
        .otherwise(F.lit("candidate")),
    ).select(F.lit(round_no).alias("round"), "parent_qid", "curl", "weight", "decision")

    kept = scored.filter(~F.col("curl").rlike(bl)).filter(F.col("weight") >= 0)
    # In-round dedup: keep the best (first by discovery order) occurrence.
    w = Window.partitionBy("curl").orderBy(F.col("weight").desc(), "parent_qid", "pos")
    deduped = kept.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    # Seen filter: partitioned-bloom pre-filter (when provided) with the
    # exact anti-join backstop — the seen SET stays exact either way.
    if bloom is not None and sketch is not None:
        from tripwire_spark.operators.seen import filter_unseen

        cands = deduped.withColumn("url_hash", url_hash("curl"))
        fresh = filter_unseen(
            cands,
            seen.select(F.col("url").alias("curl")),
            sketch,
            bloom,
            hash_col="url_hash",
            url_col="curl",
            caches=caches,
        ).drop("url_hash")
    else:
        fresh = deduped.join(seen.select(F.col("url").alias("curl")), "curl", "left_anti")
    # Deterministic qid assignment above all earlier qids; best-first
    # order = ascending (-weight, parent_qid, pos).
    with_ids = assign_dense_ids(
        fresh.select(
            "curl",
            (-F.col("weight")).alias("__negw"),
            "parent_qid",
            "pos",
        ),
        order_cols=["__negw", "parent_qid", "pos"],
        id_col="__seq",
        start=0,
    )
    new_rows = with_ids.select(
        (F.lit(round_no * ROUND_QID_BASE) + F.col("__seq")).alias("qid"),
        F.col("curl").alias("url"),
        url_hash("curl").alias("url_hash"),
        reg_domain(url_host("curl")).alias("host"),
        F.lit(None).cast("int").alias("alexa"),
        F.lit(0).alias("try"),
        F.lit(ST_QUEUED).alias("status"),
        F.lit(queue).alias("queue"),
        F.lit(vid).alias("vid"),
        F.lit(round_no).alias("round_added"),
    )
    return new_rows, decisions


@dataclass
class CrawlState:
    frontier: DataFrame
    results: DataFrame | None = None
    fetch_log: DataFrame | None = None
    decision_log: DataFrame | None = None
    rounds_run: int = 0
    metrics: list[dict] = field(default_factory=list)


def run_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame,
    robots: DataFrame | None,
    patterns: list[str],
    max_rounds: int = 5,
    default_budget: int = 3,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    vid: int = 1,
    use_bloom: bool = True,
    bloom_buckets: int = 64,
) -> CrawlState:
    """The full crawl loop; one snapshot commit per round when
    ``checkpoint_dir`` is given; ``resume=True`` continues from the
    latest committed round."""
    tables = None
    start_round = 1
    if checkpoint_dir:
        tables = {
            name: SnapshotTable(spark, checkpoint_dir, name)
            for name in ("frontier", "results", "fetch_log", "decision_log", "seen_sketch")
        }

    if resume and tables and tables["frontier"].latest_id():
        frontier = tables["frontier"].read()
        results = tables["results"].read() if tables["results"].latest_id() else None
        fetch_log = tables["fetch_log"].read() if tables["fetch_log"].latest_id() else None
        decision_log = tables["decision_log"].read()
        last = tables["frontier"].snapshots()[-1]["summary"]
        start_round = int(last.get("round", 0)) + 1
    else:
        frontier = build_frontier(seeds, patterns, vid=vid)
        decision_log = seed_decision_log(seeds, patterns).select(
            F.lit(0).alias("round"),
            F.col("file_order").alias("parent_qid"),
            F.col("url").alias("curl"),
            F.lit(0.0).alias("weight"),
            "decision",
        )
        results = None
        fetch_log = None
        if tables:
            tables["frontier"].commit(frontier, {"round": 0, "stage": "seeded"})
            tables["decision_log"].commit(decision_log, {"round": 0})

    state = CrawlState(frontier=frontier, results=results, fetch_log=fetch_log, decision_log=decision_log)

    # Fixed-capacity incremental bloom: built ONCE over the seed
    # frontier (restored from its own snapshot on resume), then
    # OR-merged with each round's new urls — O(new) per round.
    bloom = None
    sketch = None
    if use_bloom:
        from tripwire_spark.operators.seen import BloomSeenSet

        bloom = BloomSeenSet(n_buckets=bloom_buckets)
        if resume and tables and tables["seen_sketch"].latest_id():
            sketch = tables["seen_sketch"].read().persist()
        else:
            sketch = bloom.build(state.frontier.select("url_hash"), "url_hash").persist()

    for r in range(start_round, max_rounds + 1):
        claimed, disabled = politeness_schedule(
            state.frontier, robots, default_budget=default_budget, round_no=r
        )
        claimed = claimed.persist()
        if claimed.isEmpty():
            claimed.unpersist()
            break

        fetched, hits = fetch_pages(claimed, pages)
        round_results, links = extract_round(fetched)
        seen = state.frontier.select("url", "url_hash")
        round_caches: list = []
        new_rows, link_decisions = discover(
            links, seen, patterns, round_no=r, vid=vid, bloom=bloom, sketch=sketch,
            caches=round_caches,
        )

        log = fetched.select(
            "qid",
            "url",
            "host",
            F.lit(r).alias("round"),
            F.col("found"),
            F.when(F.col("found"), F.lit(0)).otherwise(F.lit(404)).alias("errno"),
            F.spark_partition_id().alias("partition_id"),
        )

        state.frontier = settle(
            state.frontier,
            fetched.select("qid", "try", "found"),
            new_urls=new_rows,
            disabled=disabled,
        )
        if not tables:
            # Pin this round's increments NOW: they must stay readable
            # after hits.unpersist() without re-scanning the pages table.
            round_results = round_results.localCheckpoint(eager=True)
            log = log.localCheckpoint(eager=True)
            link_decisions = link_decisions.localCheckpoint(eager=True)
        state.results = round_results if state.results is None else state.results.unionByName(round_results)
        state.fetch_log = log if state.fetch_log is None else state.fetch_log.unionByName(log)
        state.decision_log = state.decision_log.unionByName(link_decisions)
        state.rounds_run = r

        # Incremental sketch update: OR-merge only this round's new urls.
        new_sketch = None
        if bloom is not None:
            new_sketch = bloom.merge(sketch, new_rows.select("url_hash"), "url_hash").persist()

        if tables:
            # Snapshot commit truncates lineage: re-read what we wrote.
            n_claimed = claimed.count()
            summary = {"round": r, "claimed": n_claimed}
            tables["frontier"].commit(state.frontier, summary)
            tables["results"].commit(state.results, summary)
            tables["fetch_log"].commit(state.fetch_log, summary)
            tables["decision_log"].commit(state.decision_log, summary)
            if new_sketch is not None:
                tables["seen_sketch"].commit(new_sketch, summary)
            state.frontier = tables["frontier"].read()
            state.results = tables["results"].read()
            state.fetch_log = tables["fetch_log"].read()
            state.decision_log = tables["decision_log"].read()
            state.metrics.append(summary)
        else:
            # No checkpoint: pin each round's frontier to break lineage growth.
            state.frontier = state.frontier.localCheckpoint(eager=True)
            if new_sketch is not None:
                new_sketch.count()  # materialize before dropping inputs

        hits.unpersist()
        claimed.unpersist()
        if new_sketch is not None:
            sketch.unpersist()
            sketch = new_sketch
        for c in round_caches:
            c.unpersist()

    if sketch is not None:
        sketch.unpersist()

    return state
