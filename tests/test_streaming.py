"""Structured Streaming smoke tests: the streaming paths of T5/T6 run
end-to-end against a memory sink and agree with their batch twins."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _events_stream(spark, tmp_path):
    """Stage the events file into a directory (streaming source needs one)."""
    import shutil

    src = tmp_path / "stream_src"
    src.mkdir(exist_ok=True)
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    batch = spark.read.parquet(f"{SF}/events.parquet")
    return spark.readStream.schema(batch.schema).parquet(str(src)), batch


def test_sliding_monitor_stream_matches_batch(spark, tmp_path):
    from tripwire_spark.streaming.monitor import sliding_failure_counts

    stream, batch = _events_stream(spark, tmp_path)

    agg = sliding_failure_counts(stream, window="1 hour", slide="30 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t5out")
        .option("checkpointLocation", str(tmp_path / "ck5"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.win.start, r.win.end): (r.n_failures, r.n_samples)
        for r in spark.sql("SELECT * FROM t5out").collect()
    }
    want = {
        (r.win.start, r.win.end): (r.n_failures, r.n_samples)
        for r in sliding_failure_counts(batch, window="1 hour", slide="30 minutes").collect()
    }
    assert got == want and len(want) > 0


def test_heartbeat_stream_runs(spark, tmp_path):
    from tripwire_spark.streaming.monitor import heartbeat_liveness

    stream, batch = _events_stream(spark, tmp_path)
    agg = heartbeat_liveness(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t6out")
        .option("checkpointLocation", str(tmp_path / "ck6"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.user_id: r.last_beat for r in spark.sql("SELECT * FROM t6out").collect()}
    want = {r.user_id: r.last_beat for r in heartbeat_liveness(batch).collect()}
    assert got == want and len(want) > 0


def test_recheck_schedule_stream_matches_batch(spark, tmp_path):
    """T4 streaming twin: the 2/12-minute re-emit schedule computed per
    micro-batch equals the batch schedule (event-time projection — no
    state, so append mode streams it directly)."""
    from tripwire_spark.streaming.monitor import recheck_schedule

    stream, batch = _events_stream(spark, tmp_path)
    sig = stream.filter(F.col("event_type") == "signup").select(
        "event_id", F.col("ts").alias("regtime")
    )
    agg = recheck_schedule(sig)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t4out")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.event_id, r.delay_s): str(r.scheduled_ts)
        for r in spark.sql("SELECT * FROM t4out").collect()
    }
    want = {
        (r.event_id, r.delay_s): str(r.scheduled_ts)
        for r in recheck_schedule(
            batch.filter(F.col("event_type") == "signup").select(
                "event_id", F.col("ts").alias("regtime")
            )
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_visibility_queue_stateful(spark, tmp_path):
    """T3 as applyInPandasWithState: already-visible messages dequeue on
    arrival; delayed ones are HELD in per-identity state and released by
    a later batch once their visibility matures."""
    import time

    from tripwire_spark.streaming.monitor import streaming_visibility_queue

    import datetime

    import glob as globmod
    import shutil

    src = tmp_path / "vq_src"
    src.mkdir()
    past = datetime.datetime(2020, 1, 1)

    def write_batch(name, rows):
        # stage as FLAT files in the watched dir (the file source tails
        # files, not nested directories)
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, "iid long, umid long, ignore_until timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(globmod.glob(tmp + "/part-*.parquet")):
            shutil.copy(f, str(src / f"{name}_{i}.parquet"))

    # far enough out that stream startup cannot cross it
    soon = datetime.datetime.utcnow() + datetime.timedelta(seconds=25)
    write_batch("b1", [(1, 101, past), (1, 102, soon), (2, 201, past)])
    stream = spark.readStream.schema("iid long, umid long, ignore_until timestamp").parquet(
        str(src)
    )
    q = (
        streaming_visibility_queue(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("vqout")
        .option("checkpointLocation", str(tmp_path / "ckvq"))
        .start()
    )
    q.processAllAvailable()
    got1 = {r.umid for r in spark.sql("SELECT * FROM vqout").collect()}
    assert got1 == {101, 201}  # visible immediately; 102 held in state
    while datetime.datetime.utcnow() <= soon:
        time.sleep(1)  # let umid 102's visibility mature
    write_batch("b2", [(1, 103, past)])  # new arrival triggers the key
    q.processAllAvailable()
    q.stop()
    got2 = {r.umid for r in spark.sql("SELECT * FROM vqout").collect()}
    assert got2 == {101, 201, 102, 103}


def test_visibility_retry_cycle(spark):
    from tripwire_spark.streaming.monitor import dequeue_visible, requeue

    now = F.lit("2024-01-10 00:00:00").cast("timestamp")
    q0 = spark.range(20).select(
        F.col("id").alias("umid"),
        (F.lit("2024-01-09 23:59:00").cast("timestamp") + F.expr("make_interval(0,0,0,0,0,0,id)")).alias(
            "ignore_until"
        ),
        F.lit(0).alias("process_attempt"),
        (F.col("id") % 7 == 0).alias("disabled"),
    )
    batch = dequeue_visible(q0, now)
    rows = batch.collect()
    assert 0 < len(rows) <= 10
    assert all(not r.disabled and r.ignore_until is not None for r in rows)
    re = requeue(batch, now).collect()
    assert all(r.process_attempt == 1 for r in re)
    assert all(str(r.ignore_until) == "2024-01-10 00:01:00" for r in re)


def test_streaming_visibility_queue_tick_releases_silent_key(spark, tmp_path):
    """A SILENT identity (no further arrivals) still releases its
    matured messages when a tick row (umid = TICK_UMID sentinel) drives
    its dequeue — the poller-cadence analog for keys with no inbound
    mail."""
    import datetime
    import glob as globmod
    import shutil
    import time

    from tripwire_spark.streaming.monitor import TICK_UMID, streaming_visibility_queue

    src = tmp_path / "vt_src"
    tick_src = tmp_path / "vt_ticks"
    src.mkdir()
    tick_src.mkdir()
    past = datetime.datetime(2020, 1, 1)

    def write_batch(dirpath, name, rows):
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, "iid long, umid long, ignore_until timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(globmod.glob(tmp + "/part-*.parquet")):
            shutil.copy(f, str(dirpath / f"{name}_{i}.parquet"))

    schema = "iid long, umid long, ignore_until timestamp"
    soon = datetime.datetime.utcnow() + datetime.timedelta(seconds=25)
    # identity 7 gets one delayed message and then goes silent forever
    write_batch(src, "b1", [(7, 701, soon), (8, 801, past)])
    arrivals = spark.readStream.schema(schema).parquet(str(src))
    # file-backed tick stream (deterministic test twin of the rate-source
    # helper, same sentinel shape)
    ticks = spark.readStream.schema(schema).parquet(str(tick_src))
    q = (
        streaming_visibility_queue(arrivals, ticks=ticks)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("vtout")
        .option("checkpointLocation", str(tmp_path / "ckvt"))
        .start()
    )
    q.processAllAvailable()
    assert {r.umid for r in spark.sql("SELECT * FROM vtout").collect()} == {801}
    while datetime.datetime.utcnow() <= soon:
        time.sleep(1)
    # no arrival for iid 7 — only a tick
    write_batch(tick_src, "t1", [(7, TICK_UMID, past)])
    q.processAllAvailable()
    q.stop()
    got = {r.umid for r in spark.sql("SELECT * FROM vtout").collect()}
    assert got == {801, 701}  # matured message released by the tick alone
    assert TICK_UMID not in got  # the sentinel itself is never emitted


def test_visibility_ticks_shape(spark):
    """The rate-source tick helper yields a STREAMING frame in the
    arrivals shape (iid, umid sentinel, ignore_until), one row per
    identity per interval."""
    from tripwire_spark.streaming.monitor import TICK_UMID, visibility_ticks

    ids = spark.createDataFrame([(1,), (2,)], ["iid"])
    t = visibility_ticks(spark, ids, interval_s=5)
    assert t.isStreaming
    assert [f.name for f in t.schema.fields] == ["iid", "umid", "ignore_until"]
    assert dict((f.name, f.dataType.simpleString()) for f in t.schema.fields)["umid"] == "bigint"
