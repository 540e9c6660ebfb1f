"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``     — flagship crawl: seeds derived from the sf0.001
                       customer table, crawled against deterministic
                       synthetic Common-Crawl-style pages.
``queries()``        — one entry per implemented operator (SURVEY.md §2),
                       each runnable at any sf dir.
``oracle_sql()``     — DuckDB twins.  Column names/aliases match the
                       Spark side exactly; double sums go through exact
                       DECIMAL aggregation then a final cast to DOUBLE so
                       both engines hash identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(col, scale=2):
    """Exact decimal sum -> double (identical across Spark and DuckDB)."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier crawl seeded from sf0.001 customers.

    Loads /root/testdata/sf0.001/customer.parquet, derives a
    deterministic seed list, runs the full crawl loop (politeness,
    robots, fetch join, byte-identical extraction, discovery) against
    synthetic pages, and returns the extracted-results DataFrame.
    """
    from tripwire_spark.operators.crawl import run_crawl
    from tripwire_spark.sources.synth import BLACKLIST_PATTERNS, synth_pages, synth_robots

    customer = _t(spark, "/root/testdata/sf0.001", "customer")
    n_hosts = 40
    seeds = customer.select(
        F.col("c_custkey").cast("int").alias("alexa"),
        F.format_string("site%04d.test/p0", F.pmod(F.col("c_custkey"), F.lit(n_hosts))).alias("url"),
        F.col("c_custkey").cast("long").alias("file_order"),
    )
    pages = synth_pages(spark, n_hosts=n_hosts, n_pages=4, n_links=3)
    robots = synth_robots(spark, n_hosts=n_hosts)
    state = run_crawl(
        spark, seeds, pages, robots, BLACKLIST_PATTERNS, max_rounds=2, default_budget=2
    )
    return state.results.select("url", "text", "lang")


# ---------------------------------------------------------------------------
# queries — each callable (spark, sf_dir) -> DataFrame


def q_claim_filter(spark: SparkSession, sf: str) -> DataFrame:
    # F3: claim-eligibility predicate (common_queries.py:46-48)
    return (
        _t(spark, sf, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 50000))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_politeness_rank(spark: SparkSession, sf: str) -> DataFrame:
    # W2: per-host FIFO rank under budget (common_queries.py:42-56)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def q_first_last_flag(spark: SparkSession, sf: str) -> DataFrame:
    # W1: labeled_status first/last flags (schema.sql:1842-1843)
    wa = Window.partitionBy("user_id").orderBy("event_id")
    wd = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        _t(spark, sf, "events")
        .withColumn("is_first", F.row_number().over(wa) == 1)
        .withColumn("is_last", F.row_number().over(wd) == 1)
        .select("event_id", "user_id", "is_first", "is_last")
    )


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    # J5: identity-claim anti join (common_queries.py:242-244)
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti").select(
        "c_custkey", "c_name"
    )


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    # J8: existence check (common_queries.py:162-166)
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi").select(
        "c_custkey", "c_nationkey"
    )


def q_login_info_5way(spark: SparkSession, sf: str) -> DataFrame:
    # J1: 5-way equi-join view login_info (schema.sql:1904-1905); dims broadcast
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        )
    )


def q_registration_status(spark: SparkSession, sf: str) -> DataFrame:
    # A3: array_agg + max per group (schema.sql:2112); order pinned by o_orderkey
    o = _t(spark, sf, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderkey").alias("max_orderkey"),
        F.count("*").alias("n_orders"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("o_orderkey", "o_orderstatus"))),
                lambda x: x["o_orderstatus"],
            ),
        ).alias("statii"),
    )


def q_array_overlap(spark: SparkSession, sf: str) -> DataFrame:
    # J9: acceptable-status array overlap (common_queries.py:299-304)
    o = _t(spark, sf, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.collect_set("o_orderstatus").alias("sts"))
        .filter(F.arrays_overlap(F.col("sts"), F.array(F.lit("F"), F.lit("P"))))
        .select("custkey")
    )


def q_time_bucket(spark: SparkSession, sf: str) -> DataFrame:
    # C6: date_trunc day bucketing (schema.sql:2035)
    e = _t(spark, sf, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day_ts")).agg(
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value"), 6).alias("sum_value"),
    )


def q_price_bucket(spark: SparkSession, sf: str) -> DataFrame:
    # C8: alexa bucketing (alexa/500)*500 (schema.sql:2035)
    o = _t(spark, sf, "orders")
    return (
        o.withColumn("price_bucket", (F.floor(F.col("o_totalprice") / 500) * 500).cast("long"))
        .groupBy("price_bucket")
        .agg(F.count("*").alias("n_orders"))
    )


def q_latest_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    # O3: latest registration per username (handle_email.py:280-289)
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("custkey"), "o_orderkey", "o_orderdate")
    )


def q_repeat_bonus_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # D1: URL-seen within email — first weight + 20 per repeat
    # (handle_email.py:196,379,413-420)
    e = _t(spark, sf, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_seen"),
        (F.min_by("value", "event_id").cast("double") + 20 * (F.count("*") - 1).cast("double")).alias(
            "weight"
        ),
    )


def q_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    # C1: norm_url (schema.sql:902-907) over synthesized quirky URLs
    from tripwire_spark.functions.urls import canonicalize_url

    c = _t(spark, sf, "customer")
    raw = F.concat(
        F.lit("HTTP://Site"),
        F.col("c_custkey"),
        F.lit(".TEST:80/p"),
        F.pmod(F.col("c_custkey"), F.lit(7)),
        F.when(F.pmod(F.col("c_custkey"), F.lit(3)) == 0, F.lit("/sub/./x/../y")).otherwise(F.lit("")),
        F.when(F.pmod(F.col("c_custkey"), F.lit(5)) == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return c.select(F.col("c_custkey").alias("custkey"), canonicalize_url(raw).alias("canon_url"))


def q_reg_domain(spark: SparkSession, sf: str) -> DataFrame:
    # C4: dns_reg_domain politeness key (schema.sql:305-310)
    from tripwire_spark.functions.urls import reg_domain

    c = _t(spark, sf, "customer")
    host = (
        F.when(
            F.pmod(F.col("c_custkey"), F.lit(3)) == 0,
            F.concat(F.lit("www.shop"), F.col("c_custkey"), F.lit(".co.uk")),
        )
        .when(
            F.pmod(F.col("c_custkey"), F.lit(3)) == 1,
            F.concat(F.lit("a.b.site"), F.col("c_custkey"), F.lit(".com")),
        )
        .otherwise(F.concat(F.lit("site"), F.col("c_custkey"), F.lit(".test")))
    )
    return c.select(F.col("c_custkey").alias("custkey"), reg_domain(host).alias("rdomain"))


def q_frontier_schedule(spark: SparkSession, sf: str) -> DataFrame:
    # The frontier scheduling kernel (W2+O1) over seeds synthesized from
    # orders: per-host FIFO prefix under a budget of 3.
    o = _t(spark, sf, "orders")
    seeds = o.select(
        F.format_string("h%02d", F.pmod(F.col("o_custkey"), F.lit(20))).alias("host"),
        F.col("o_orderkey").alias("qid"),
    )
    w = Window.partitionBy("host").orderBy("qid")
    return seeds.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= 3)


def q_retry_policy(spark: SparkSession, sf: str) -> DataFrame:
    # T2: exit-code -> status transitions (run_queue_nowrap:49-80)
    e = _t(spark, sf, "events")
    agg = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("tries")
    )
    return agg.select(
        "user_id",
        "tries",
        F.when(F.col("tries") == 0, "completed")
        .when(F.col("tries") <= 2, "queued")
        .otherwise("failed")
        .alias("status"),
    )


def q_doc_token_count(spark: SparkSession, sf: str) -> DataFrame:
    # Text analysis: whitespace token counting over documents
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_txt"),
    )


def q_doc_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Exact dedup by content hash (md5 — identical in both engines)
    d = _t(spark, sf, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id")
    )


def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    # Headline agg (TPC-H Q1 shape) — the bench workhorse
    l = _t(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "claim_filter": q_claim_filter,
    "politeness_rank": q_politeness_rank,
    "first_last_flag": q_first_last_flag,
    "anti_join": q_anti_join,
    "semi_join": q_semi_join,
    "login_info_5way": q_login_info_5way,
    "registration_status": q_registration_status,
    "array_overlap": q_array_overlap,
    "time_bucket": q_time_bucket,
    "price_bucket": q_price_bucket,
    "latest_per_customer": q_latest_per_customer,
    "repeat_bonus_dedup": q_repeat_bonus_dedup,
    "url_canonicalize": q_url_canonicalize,
    "reg_domain": q_reg_domain,
    "frontier_schedule": q_frontier_schedule,
    "retry_policy": q_retry_policy,
    "doc_token_count": q_doc_token_count,
    "doc_exact_dedup": q_doc_exact_dedup,
    "tpch_q1": q_tpch_q1,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


ORACLES: dict[str, str] = {
    "claim_filter": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'O' AND o_totalprice < 50000
    """,
    "politeness_rank": """
        SELECT user_id, event_id, rn FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn <= 3
    """,
    "first_last_flag": """
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1 AS is_first,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1 AS is_last
        FROM events
    """,
    "anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "semi_join": """
        SELECT c_custkey, c_nationkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "login_info_5way": """
        SELECT r_name, n_name, count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "registration_status": """
        SELECT o_custkey AS custkey, max(o_orderkey) AS max_orderkey,
               count(*) AS n_orders,
               string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statii
        FROM orders GROUP BY o_custkey
    """,
    "array_overlap": """
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus IN ('F','P')
    """,
    "time_bucket": """
        SELECT date_trunc('day', ts) AS day_ts, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1
    """,
    "price_bucket": """
        SELECT CAST(floor(o_totalprice / 500) AS BIGINT) * 500 AS price_bucket,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "latest_per_customer": """
        SELECT o_custkey AS custkey, o_orderkey, o_orderdate FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1
    """,
    "repeat_bonus_dedup": """
        SELECT user_id, event_type, count(*) AS n_seen,
               CAST(arg_min(value, event_id) AS DOUBLE)
                 + 20 * CAST(count(*) - 1 AS DOUBLE) AS weight
        FROM events GROUP BY user_id, event_type
    """,
    "url_canonicalize": """
        SELECT c_custkey AS custkey,
               'http://site' || c_custkey || '.test/p' || (c_custkey % 7)
               || CASE WHEN c_custkey % 3 = 0 THEN '/sub/y' ELSE '' END
               AS canon_url
        FROM customer
    """,
    "reg_domain": """
        SELECT c_custkey AS custkey,
               CASE WHEN c_custkey % 3 = 0 THEN 'shop' || c_custkey || '.co.uk'
                    WHEN c_custkey % 3 = 1 THEN 'site' || c_custkey || '.com'
                    ELSE 'site' || c_custkey || '.test' END AS rdomain
        FROM customer
    """,
    "frontier_schedule": """
        SELECT host, qid, rank FROM (
          SELECT printf('h%02d', o_custkey % 20) AS host, o_orderkey AS qid,
                 row_number() OVER (PARTITION BY printf('h%02d', o_custkey % 20)
                                    ORDER BY o_orderkey) AS rank
          FROM orders) WHERE rank <= 3
    """,
    "retry_policy": """
        SELECT user_id, tries,
               CASE WHEN tries = 0 THEN 'completed'
                    WHEN tries <= 2 THEN 'queued'
                    ELSE 'failed' END AS status
        FROM (SELECT user_id,
                     CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS tries
              FROM events GROUP BY user_id)
    """,
    "doc_token_count": """
        SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_txt
        FROM documents
    """,
    "doc_exact_dedup": """
        SELECT md5(text) AS content_hash, count(*) AS n_copies,
               min(doc_id) AS keeper_doc_id
        FROM documents GROUP BY 1
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
