"""Service-loop semantics as Structured Streaming + batch twins.

Reference parity:
- T5 sliding-window health monitor: proxy-watch samples every 5 s over
  a window of 20 (proxy-watch/proxy-watch:22-36); consumer gates jobs
  on the summary (run_queue_nowrap:219-231).  Streaming: windowed
  count; batch twin: window-frame rowsBetween(-19, 0).
- T6 heartbeat liveness: alive = heard within 10 s
  (redbeat/redbeat.py:28-38, timeout :52-54).  Streaming: watermarked
  max(ts) per name; batch twin: max(ts) vs cutoff.
- T3 visibility-delay retry: ignore_until = now + 60 s, attempt bump on
  requeue (handle_email.py:34,657-716).  Implemented as an event-time
  gate usable per micro-batch (foreachBatch) or per crawl round.

Every streaming query here also has a pure-batch twin with identical
semantics — the batch twins are what the DuckDB oracle checks
(sliding_window / heartbeat_liveness / visibility_delay queries in
__spark_entry__), and the streaming paths are smoke-tested end-to-end
with a memory sink in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- T5: sliding failure monitor ------------------------------------------


def sliding_failure_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    fail_predicate=None,
    window: str = "100 seconds",
    slide: str = "5 seconds",
    watermark: str = "2 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Streaming twin of the 20-sample @5s deque: failures per sliding
    window.  Works on both streaming and batch DataFrames."""
    fail = fail_predicate if fail_predicate is not None else (F.col("event_type") == "error")
    # Event-time ops need TIMESTAMP (LTZ); parquet often yields NTZ.
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    keys = [F.window(F.col(ts_col), window, slide).alias("win")]
    if group_col:
        keys.append(F.col(group_col))
    return src.groupBy(*keys).agg(
        F.sum(F.when(fail, 1).otherwise(0)).cast("long").alias("n_failures"),
        F.count("*").alias("n_samples"),
    )


def gate_from_summary(summary: DataFrame, max_failures: int = 10) -> DataFrame:
    """The consumer's go/no-go gate (run_queue_nowrap:219-231): a window
    is 'bad' when failures exceed the threshold."""
    return summary.withColumn("healthy", F.col("n_failures") <= max_failures)


# --- T6: heartbeat liveness -------------------------------------------------


def heartbeat_liveness(
    beats: DataFrame,
    name_col: str = "user_id",
    ts_col: str = "ts",
    timeout: str = "10 seconds",
    watermark: str = "1 minute",
) -> DataFrame:
    """alive = last beat within ``timeout`` of the stream's frontier.

    Streaming: per-name max(ts) in update mode; the liveness cutoff is
    evaluated against the watermark frontier downstream.  Batch: max(ts)
    vs (global max(ts) - timeout).
    """
    beats = beats.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if beats.isStreaming:
        return (
            beats.withWatermark(ts_col, watermark)
            .groupBy(name_col)
            .agg(F.max(ts_col).alias("last_beat"))
        )
    frontier = beats.agg(F.max(ts_col).alias("m")).select(
        (F.col("m") - F.expr(f"INTERVAL {timeout}")).alias("cutoff")
    )
    return (
        beats.groupBy(name_col)
        .agg(F.max(ts_col).alias("last_beat"))
        .crossJoin(F.broadcast(frontier))
        .withColumn("alive", F.col("last_beat") >= F.col("cutoff"))
        .drop("cutoff")
    )


# --- T3: visibility-delay retry queue ---------------------------------------

VISIBILITY_DELAY = "60 seconds"  # handle_email.py:34
DEQUEUE_LIMIT = 10  # handle_email.py:157


def dequeue_visible(
    queue: DataFrame,
    now,
    limit: int = DEQUEUE_LIMIT,
    attempt_col: str = "process_attempt",
    max_attempts: int = 5,
) -> DataFrame:
    """One dequeue batch: visible, not disabled, under the attempt cap,
    ORDER BY ignore_until DESC LIMIT n (handle_email.py:676-688)."""
    vis = queue.filter(
        (F.col("ignore_until") <= now)
        & (~F.col("disabled"))
        & (F.col(attempt_col) < max_attempts)
    )
    return vis.orderBy(F.col("ignore_until").desc(), F.col("umid").desc()).limit(limit)


def requeue(batch: DataFrame, now, delay: str = VISIBILITY_DELAY) -> DataFrame:
    """Failed handling -> bump attempt, push visibility out by the delay
    (handle_email.py:657-672)."""
    return batch.withColumn("process_attempt", F.col("process_attempt") + 1).withColumn(
        "ignore_until", now + F.expr(f"INTERVAL {delay}")
    )


# --- T3 streaming: stateful visibility queue ---------------------------------


# Sentinel umid marking a pure-timer tick row (never enqueued).  A
# sentinel instead of NULL keeps the Arrow batch's umid column int64 —
# a single null would upcast it to float64 and corrupt 64-bit ids.
TICK_UMID = -1


def visibility_ticks(
    spark, identities: DataFrame, interval_s: int = 12, key_col: str = "iid"
) -> DataFrame:
    """Periodic per-identity tick stream (the poller's cadence:
    tripwire-mail-poller:11-14 sleeps 12 s per identity): one rate
    source thinned to one row per ``interval_s``, crossed with the
    small static identities dimension, shaped like arrivals with the
    TICK_UMID sentinel payload.  Union it into
    ``streaming_visibility_queue`` so identities with no inbound mail
    still release matured messages on schedule; off by default because
    the arrival-driven path needs no extra epochs."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    tick = rate.filter(F.pmod(F.col("value"), F.lit(interval_s)) == 0)
    return tick.crossJoin(identities.select(key_col)).select(
        F.col(key_col),
        F.lit(TICK_UMID).cast("long").alias("umid"),
        F.col("timestamp").cast("timestamp").alias("ignore_until"),
    )


def streaming_visibility_queue(
    arrivals: DataFrame, key_col: str = "iid", ticks: DataFrame | None = None
):
    """T3 as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``): the unprocessed_messages queue with
    per-identity state (handle_email.py:34,657-716; schema.sql:2210-2219).

    Input stream rows: (iid, umid, ignore_until timestamp).  State per
    identity: the pending (umid, ignore_until) set.  Each invocation
    dequeues every message whose visibility has expired relative to the
    batch's processing time and keeps the rest in state.

    Release is arrival-driven: a key's matured messages emit when the
    key next appears in a batch.  The reference's poller provides
    exactly this tick (tripwire-mail-poller polls each identity every
    12 s); for deployments with silent identities pass
    ``ticks=visibility_ticks(spark, identities)`` — sentinel-payload
    rows (umid = TICK_UMID) that drive the key's dequeue without
    enqueuing anything.  A processing-time timeout variant was measured
    to busy-loop the micro-batch engine (sub-second re-arms ->
    continuous epochs), so the tick pattern is the supported one.

    This is the shape the engine uses for any per-key retry semantics
    Spark lacks natively — bounded state per key, Arrow in/out, no
    driver involvement.
    """
    import datetime

    import pandas as pd

    if ticks is not None:
        arrivals = arrivals.unionByName(ticks.select(*arrivals.columns))

    def dequeue(key, pdfs, state):
        now = datetime.datetime.now(tz=datetime.timezone.utc).replace(tzinfo=None)
        pend_umid, pend_until = ([], [])
        if state.exists:
            pend_umid, pend_until = state.get
            pend_umid, pend_until = list(pend_umid), list(pend_until)
        for pdf in pdfs:
            for umid, until in zip(pdf["umid"], pdf["ignore_until"]):
                if int(umid) < 0:
                    continue  # tick sentinel: drive the dequeue, enqueue nothing
                pend_umid.append(int(umid))
                pend_until.append(until.to_pydatetime())
        ready = {i for i, t in enumerate(pend_until) if t <= now}
        keep = [i for i in range(len(pend_umid)) if i not in ready]
        out = pd.DataFrame(
            {
                "iid": [key[0]] * len(ready),
                "umid": [pend_umid[i] for i in sorted(ready)],
                "dequeued_at": [now] * len(ready),
            }
        )
        if keep:
            state.update(
                ([pend_umid[i] for i in keep], [pend_until[i] for i in keep])
            )
        elif state.exists:
            state.remove()
        yield out

    return arrivals.groupBy(key_col).applyInPandasWithState(
        dequeue,
        outputStructType="iid long, umid long, dequeued_at timestamp",
        stateStructType="pend_umid array<long>, pend_until array<timestamp>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --- T4: scheduled re-check timers -------------------------------------------

# mail/mailchecker/tripwire-mail-checker:26 — click re-checks at 2 min
# and 12 min after the registration event.
CHECK_DELAYS_S = [2 * 60, 12 * 60]


def recheck_schedule(
    events: DataFrame,
    ts_col: str = "regtime",
    delays_s: list[int] | None = None,
) -> DataFrame:
    """T4: one re-emit row per (event, delay) with its scheduled
    event-time — the multi-deadline generalization of ``requeue``.

    Batch: explode a literal delay array (no shuffle — the schedule is a
    projection).  In streaming the same frame drives timer-style
    re-processing per micro-batch: filter scheduled_ts <= batch time.
    """
    delays = delays_s if delays_s is not None else CHECK_DELAYS_S
    d = F.explode(F.array(*[F.lit(x) for x in delays])).alias("delay_s")
    return events.select("*", d).withColumn(
        "scheduled_ts",
        F.col(ts_col).cast("timestamp") + F.col("delay_s").cast("int") * F.expr("INTERVAL 1 SECOND"),
    )


# --- crawl-log session rollups (streaming twin of operators.logs) ----------


def session_rollup_stream(
    logs: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Structured-Streaming twin of ``logs.sessionize`` +
    ``session_stats``: Spark's native ``session_window`` closes a
    per-key session after ``gap`` of event-time silence — the SAME
    gap-splitting rule the batch operator expresses with lag/cumsum —
    and emits one finalized rollup row per session once the watermark
    passes its close.

    Output: (key, session_start, session_end, n_rows) — the streaming
    state is bounded by open sessions per key (merged incrementally;
    late rows beyond ``watermark`` are dropped, the standard trade the
    batch path does not have to make).  ``ts_col`` must be a timestamp
    column on the stream.  Works identically on a batch frame, which is
    how tests pin stream == batch semantics.
    """
    w = logs.withWatermark(ts_col, watermark) if logs.isStreaming else logs
    return (
        w.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_rows",
        )
    )
