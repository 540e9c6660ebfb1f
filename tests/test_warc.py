"""WARC ingestion round-trip: the writer emits Common-Crawl-style
framing (one gzip member per record), the binaryFile + mapInPandas
reader must recover every page byte-identically (SURVEY.md input hint:
Common-Crawl-style pages table)."""

from __future__ import annotations

import gzip

import pyspark.sql.functions as F


def _corpus():
    return [
        (f"http://site{i:04d}.test/p{i % 3}", f"2026-08-{10 + i:02d}T01:02:{i:02d}Z",
         f"<html><body>page {i} é</body></html>".encode())
        for i in range(6)
    ]


def test_warc_roundtrip_gz(spark, tmp_path):
    from tripwire_spark.sources.warc import read_warc, write_warc

    recs = _corpus()
    (tmp_path / "a.warc.gz").write_bytes(write_warc(recs[:4]))
    (tmp_path / "b.warc.gz").write_bytes(write_warc(recs[4:]))
    out = read_warc(spark, str(tmp_path)).orderBy("url").collect()
    assert [r["url"] for r in out] == sorted(u for u, _, _ in recs)
    by_url = {r["url"]: r for r in out}
    for url, ts, body in recs:
        r = by_url[url]
        assert bytes(r["html"]) == body  # byte-identical page bodies
        assert r["warc_ts"].isoformat().startswith(ts[:19])
    assert out[0]["source_path"].endswith("a.warc.gz")


def test_warc_plain_and_record_filtering(spark, tmp_path):
    from tripwire_spark.sources.warc import parse_warc, write_warc

    body = write_warc([("http://x.test/", "2026-01-01T00:00:00Z", b"<html>x</html>")],
                      gzipped=False)
    # prepend a warcinfo record (must be dropped) with LF-only headers
    info = (b"WARC/1.0\nWARC-Type: warcinfo\nContent-Length: 9\n\nrobots: x\n\n")
    files = spark.createDataFrame(
        [("mem://w.warc", bytearray(info + body))], "path string, content binary"
    )
    out = parse_warc(files).collect()
    assert len(out) == 1 and out[0]["url"] == "http://x.test/"
    assert bytes(out[0]["html"]) == b"<html>x</html>"


def test_warc_tolerates_bad_dates_and_empty_files(spark):
    from tripwire_spark.sources.warc import parse_warc, write_warc

    good = write_warc([("http://ok.test/", "not-a-date", b"B")], gzipped=False)
    files = spark.createDataFrame(
        [("mem://good.warc", bytearray(good)),
         ("mem://empty.warc", bytearray(b"")),
         ("mem://junk.warc", bytearray(b"\x00\x01nonsense"))],
        "path string, content binary",
    )
    out = parse_warc(files).collect()
    assert len(out) == 1
    assert out[0]["warc_ts"] is None and bytes(out[0]["html"]) == b"B"


def test_warc_feeds_text_extraction(spark, tmp_path):
    """Ingested pages flow straight into the extraction pipeline — the
    html column is the same bytes the crawler-side extractors consume."""
    from tripwire_spark.functions.html import extract_text
    from tripwire_spark.sources.warc import read_warc, write_warc

    (tmp_path / "c.warc.gz").write_bytes(
        write_warc([("http://t.test/", "2026-02-02T00:00:00Z",
                     b"<html><body><p>Hello WARC world</p></body></html>")])
    )
    pages = read_warc(spark, str(tmp_path)).withColumn(
        "html_str", F.col("html").cast("string")
    )
    txt = pages.select(extract_text(F.col("html_str")).alias("text")).collect()
    assert "Hello WARC world" in txt[0]["text"]


def test_ingest_warc_full_pages_shape(spark, tmp_path):
    """ingest_warc lands the exact BASELINE input_hint schema (url,
    warc_ts, html, text, lang) and, given a SnapshotTable, fast-appends
    with per-file lineage so a second archive batch is O(delta)."""
    from tripwire_spark.sources.snapshots import SnapshotTable
    from tripwire_spark.sources.warc import ingest_warc, write_warc

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "a.warc.gz").write_bytes(
        write_warc([
            ("http://en.test/", "2026-03-01T00:00:00Z",
             b"<html><body>the cat sat on the mat and it is the best of mats</body></html>"),
            ("http://de.test/", "2026-03-01T00:00:01Z",
             b"<html><body>der hund und die katze ist nicht mit der maus</body></html>"),
        ])
    )
    t = SnapshotTable(spark, str(tmp_path), "pages")
    out = ingest_warc(spark, str(wdir), table=t)
    assert [f.name for f in out.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    langs = {r["url"]: r["lang"] for r in out.collect()}
    assert langs == {"http://en.test/": "en", "http://de.test/": "de"}
    # second batch appends, older snapshot still readable
    (wdir / "b.warc.gz").write_bytes(
        write_warc([("http://fr.test/", "2026-03-02T00:00:00Z",
                     b"<html><body>le chat est avec je tu et la souris</body></html>")])
    )
    # re-ingest only the new archive dir contents: point at same dir is a
    # full re-read; a real incremental run passes the new path
    assert ingest_warc(spark, str(wdir)).count() == 3
    assert t.read(1).count() == 2
    assert t.lineage().groupBy().sum("rows").collect()[0][0] == 2


def test_multi_member_gzip_is_common_crawl_framing(tmp_path):
    """One gzip member per record — a reader that stops at the first
    member would lose every record but the first."""
    from tripwire_spark.sources.warc import write_warc

    blob = write_warc(_corpus())
    # the stream really is multiple members: naive single-member
    # decompress (zlib) stops after record 1
    first = gzip.decompress(blob[: blob.find(b"\x1f\x8b", 2)])
    assert first.count(b"WARC/1.0") == 1


def test_stream_warc_exactly_once_across_runs(spark, tmp_path):
    """The streaming twin drains a landing dir incrementally: run 1
    ingests the files present, run 2 (same checkpoint) ingests ONLY the
    newly dropped archive — the file-source ledger is the exactly-once
    guarantee ingest_warc gets from snapshot manifests."""
    from tripwire_spark.sources.warc import ingest_warc, stream_warc, write_warc

    land = tmp_path / "landing"
    land.mkdir()
    recs = _corpus()
    (land / "a.warc.gz").write_bytes(write_warc(recs[:3]))
    out_dir, ck = str(tmp_path / "pages"), str(tmp_path / "ck")

    q = stream_warc(spark, str(land), out_dir, ck)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 3

    (land / "b.warc.gz").write_bytes(write_warc(recs[3:]))
    q2 = stream_warc(spark, str(land), out_dir, ck)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 6  # +3 new, nothing re-ingested

    # streamed rows match the batch path row-for-row (same enrichment)
    batch = ingest_warc(spark, str(land))
    cols = ["url", "text", "lang"]
    assert sorted(map(tuple, got2.select(cols).collect())) == sorted(
        map(tuple, batch.select(cols).collect())
    )


def test_build_cdx_index_global_order_and_range_plan(spark):
    from tripwire_spark.sources.warc import build_cdx_index

    rows = [
        (f"http://site{i % 7}.test/p{i}", f"2026-01-{(i % 27) + 1:02d}T00:00:00Z",
         f"<html>{i % 5}</html>")
        for i in range(60)
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts string, html string")
    idx = build_cdx_index(pages, shards=4)

    # globally ordered: concatenating shards in partition order yields
    # the fully sorted (surt_key, ts) sequence
    parts = idx.rdd.glom().collect()
    flat = [(r.surt_key, r.ts) for p in parts for r in p]
    assert flat == sorted(flat)
    assert sum(len(p) for p in parts) == 60

    # the exchange is a range partitioning (no single-partition funnel)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan

    # digest is the md5 of the body: equal bodies share a digest
    d = {(r.url, r.ts): r.digest for p in parts for r in p}
    import hashlib
    for (u, ts), dig in d.items():
        i = int(u.rsplit("p", 1)[1])
        want = hashlib.md5(f"<html>{i % 5}</html>".encode()).hexdigest()
        assert dig == want


def test_streaming_curation_end_to_end(spark, tmp_path):
    """Compose the streaming ingest with the batch curation exprs: WARC
    landing dir -> stream_warc -> curation_verdicts over the streamed
    pages — the same operator chain a continuous-ingest curation
    pipeline runs, verified row-for-row against the batch path."""
    from tripwire_spark.operators.textstats import curation_verdicts
    from tripwire_spark.sources.warc import ingest_warc, stream_warc, write_warc

    land = tmp_path / "landing"
    land.mkdir()
    good = "the of is " + " ".join(f"word{i}" for i in range(25))
    recs = [
        (f"http://s{i}.test/", "2026-03-01T00:00:00Z",
         (f"<html><body><p>{good} v{i % 2}</p></body></html>").encode())
        for i in range(6)
    ]
    (land / "a.warc.gz").write_bytes(write_warc(recs))
    out_dir, ck = str(tmp_path / "pages"), str(tmp_path / "ck")
    stream_warc(spark, str(land), out_dir, ck).awaitTermination(120)

    import pyspark.sql.functions as F

    streamed = spark.read.parquet(out_dir).withColumn("doc_id", F.xxhash64("url"))
    v = curation_verdicts(streamed, id_col="doc_id", text_col="text")
    got = sorted((r.verdict) for r in v.collect())
    # 2 distinct bodies -> 2 keeps, 4 duplicates (title+text dedup on
    # the two planted variants)
    assert got == ["duplicate"] * 4 + ["keep"] * 2

    # identical verdicts via the batch ingest path
    batch = ingest_warc(spark, str(land)).withColumn("doc_id", F.xxhash64("url"))
    bv = sorted((r.verdict) for r in curation_verdicts(batch, id_col="doc_id", text_col="text").collect())
    assert bv == got


def test_asof_lookup_closest_at_or_before(spark):
    from tripwire_spark.sources.warc import asof_lookup, build_cdx_index
    import pyspark.sql.functions as FF

    caps = spark.createDataFrame(
        [
            ("http://A.test/x", 100, b"v1"),
            ("http://a.test/x", 200, b"v2"),
            ("http://www.a.test/x", 300, b"v3"),  # same SURT as a.test/x
            ("http://b.test/y", 150, b"only"),
        ],
        "url string, warc_ts long, html binary",
    )
    cdx = build_cdx_index(caps, shards=2)
    q = spark.createDataFrame(
        [
            ("http://a.test/x", 250),   # v2 (300 is in the future)
            ("http://a.test/x", 300),   # v3 via the www-folded capture
            ("http://a.test/x", 50),    # nothing yet -> NULLs
            ("http://b.test/y", 9999),  # latest = only capture
            ("http://c.test/z", 500),   # never captured -> NULLs
        ],
        "url string, ts long",
    )
    out = {(r.url, r.asof_ts): r for r in asof_lookup(cdx, q).collect()}
    assert len(out) == 5
    assert out[("http://a.test/x", 250)].capture_ts == 200
    assert out[("http://a.test/x", 300)].capture_ts == 300
    assert out[("http://a.test/x", 50)].capture_ts is None
    assert out[("http://b.test/y", 9999)].capture_ts == 150
    assert out[("http://c.test/z", 500)].capture_url is None
    # digest rides through for change-detection consumers
    import hashlib
    assert out[("http://b.test/y", 9999)].digest == hashlib.md5(b"only").hexdigest()
    # the index side is never shuffled; the query side broadcasts
    plan = asof_lookup(cdx, q)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
