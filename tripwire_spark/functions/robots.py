"""robots.txt parsing and sitemap URL extraction (column/window layer).

The north rule requires the frontier to honor robots.txt.  The engine's
politeness gate (`operators.frontier.politeness_schedule`) consumes a
structured per-host dimension table ``(host, disallow_prefixes,
crawl_budget)``; the reference ships that table as deployed config
(/root/reference/deployed/url_pattern_blacklist is the analogous
hand-maintained rules file).  This module closes the loop for raw crawl
data: parse robots.txt *bodies* fetched from each host into exactly that
dimension shape, entirely with exploded lines + window functions — no
Python in the row path, so a 10^8-host robots corpus parses as one
codegen'd stage plus two window shuffles partitioned by host.

Group semantics follow the public robots.txt spec (RFC 9309):

* a group header is a maximal run of consecutive ``User-agent:`` lines;
  the rules that follow (until the next header) belong to every agent
  named in that run;
* blank lines and comments (``# ...``, including trailing comments) are
  ignored and do NOT terminate a group;
* a crawler obeys the MOST SPECIFIC matching group only — if any group
  names the agent literally, every ``*`` group is ignored for it;
* an empty ``Disallow:`` value means "allow all" and contributes no
  prefix; field names are case-insensitive.

``Crawl-delay`` is not in RFC 9309 but is honored by most engines; we
surface the minimum applying value and map it onto the politeness
budget with :func:`robots_budget`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_budget", "sitemap_locs"]


def parse_robots(
    robots_raw: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse raw robots.txt bodies into the politeness dimension table.

    Input: one row per host — ``(host, body)`` where ``body`` is the
    full robots.txt text.  Output: one row per host —

    ``(host, disallow_prefixes array<string> sorted, crawl_delay double)``

    with ``crawl_delay`` null when no applying group sets one and an
    empty prefix array when nothing applies (crawl everything).

    Scale shape: posexplode fans each body out to its lines; the group
    bookkeeping is two window passes partitioned by ``host`` (each
    robots file is a handful of lines, so partitions stay balanced no
    matter how skewed page counts are), and the final groupBy collapses
    back to one row per host.  All expressions are built-ins — the whole
    parse is JVM-side.
    """
    lines = robots_raw.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    )
    # strip trailing comments, then whitespace; classify "key: value"
    ln = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    key = F.lower(F.regexp_extract(ln, r"^([A-Za-z-]+)\s*:", 1))
    val = F.trim(F.regexp_extract(ln, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    is_ua = key == F.lit("user-agent")

    w_seq = Window.partitionBy("host").orderBy("pos")
    # a group starts at a user-agent line whose predecessor is not one
    starts = is_ua & ~F.coalesce(F.lag(is_ua).over(w_seq), F.lit(False))
    group_id = F.sum(starts.cast("int")).over(
        w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.select(
        "host",
        key.alias("key"),
        val.alias("val"),
        is_ua.alias("is_ua"),
        group_id.alias("gid"),
    )

    w_grp = Window.partitionBy("host", "gid")
    w_host = Window.partitionBy("host")
    named = F.lit(agent != "*") & (F.col("is_ua") & (F.lower(F.col("val")) == agent.lower()))
    star = F.col("is_ua") & (F.col("val") == "*")
    grp_named = F.max(named.cast("int")).over(w_grp)
    grp_star = F.max(star.cast("int")).over(w_grp)
    host_named = F.max(grp_named).over(w_host)
    # RFC 9309 precedence: the literal group wins; '*' groups are
    # ignored for an agent that has its own group anywhere in the file.
    applies = F.when(host_named == 1, grp_named == 1).otherwise(grp_star == 1)

    flagged = tagged.select("host", "key", "val", applies.alias("applies"))
    return flagged.groupBy("host").agg(
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        F.col("applies") & (F.col("key") == "disallow") & (F.col("val") != ""),
                        F.col("val"),
                    )
                )
            )
        ).alias("disallow_prefixes"),
        F.min(
            F.when(
                F.col("applies") & (F.col("key") == "crawl-delay"),
                F.col("val").cast("double"),
            )
        ).alias("crawl_delay"),
    )


def robots_budget(
    crawl_delay: Column,
    default_budget: int,
    round_seconds: int = 60,
) -> Column:
    """Map a Crawl-delay (seconds between fetches) onto the per-round
    politeness budget `politeness_schedule` consumes: a round spanning
    ``round_seconds`` admits at most floor(round_seconds / delay)
    fetches from the host, never below 1, defaulting when unset."""
    return (
        F.when(crawl_delay.isNull(), F.lit(default_budget))
        .otherwise(F.greatest(F.lit(1), F.floor(F.lit(round_seconds) / crawl_delay)))
        .cast("int")
    )


def sitemap_locs(
    sitemaps: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Extract ``<loc>`` URLs from sitemap XML bodies: one output row
    per non-empty loc — ``(host, url)``.  Pure regexp_extract_all +
    explode; seeds discovered this way feed the frontier exactly like
    seed-CSV rows (S1)."""
    locs = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.expr(f"regexp_extract_all({body_col}, '<loc>([^<]*)</loc>', 1)")
        ).alias("raw_loc"),
    )
    return locs.select("host", F.trim(F.col("raw_loc")).alias("url")).filter(
        F.col("url") != ""
    )
