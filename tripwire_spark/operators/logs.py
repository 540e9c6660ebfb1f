"""Crawl-log analytics: gap-based sessionization and per-session
rollups.

The reference's fetch scheduler emits a flat status/fetch log
(runners/run_queue_nowrap:586-654 writes one row per claim->execute->
settle pass; S10 in SURVEY §2.1); operators here turn that stream into
the per-host activity sessions an operations view needs — "how long did
the crawler dwell on this host, in how many bursts, at what rate" — the
same gap-based sessionization every web-log pipeline runs.

Scale shape: ``sessionize`` is ONE exchange on the session key; the
window ships (key, ts, order) only and each partition sorts its own
hosts.  A host's whole log lands in one partition — the same skew
posture as politeness ranking (one host is one partition's worth of
rows by construction: the politeness budget caps per-host log volume
per round).  ``session_stats`` adds one partial-agg groupBy over the
already-keyed rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    logs: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts_s",
    gap_s: int = 1800,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every log row a per-key session number: a new session
    starts when the gap to the previous row on the same key exceeds
    ``gap_s`` seconds.

    ``ts_col`` must be integer epoch seconds (cast timestamps with
    ``unix_timestamp`` first — integer gaps compare identically in any
    engine; float timestamp arithmetic does not).  ``order_cols`` break
    ties within one second so the row order — and therefore the session
    boundaries — are deterministic across cluster sizes.

    Output: the input columns plus ``session_seq`` (1-based per key, in
    time order) and ``session_id`` (key '#' seq).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap_s), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    seq = F.sum(is_new).over(run).cast("long")
    return logs.withColumn("session_seq", seq).withColumn(
        "session_id", F.concat_ws("#", F.col(key_col).cast("string"), F.col("session_seq"))
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts_s",
) -> DataFrame:
    """Per-session rollup over ``sessionize`` output: row count, first/
    last timestamp, and dwell seconds.  One partial-agg groupBy — the
    map-side combine collapses each session to one row before the
    exchange, so the shuffle carries one row per (key, session), not
    per log line."""
    return sessions.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        (F.max(ts_col) - F.min(ts_col)).cast("long").alias("dwell_s"),
    )
