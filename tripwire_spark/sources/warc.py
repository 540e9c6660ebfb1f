"""WARC (ISO 28500) ingestion: Common-Crawl-style archives -> pages table.

BASELINE.json's input hint is an Iceberg table of Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)``; the archives those tables
are loaded FROM are WARC files (one gzip member per record on Common
Crawl).  This module is that loader, Spark-shaped:

- ``spark.read.format("binaryFile")`` lists and reads the archive files
  (distributed listing, locality-aware splits, one task per file — the
  right granularity because a .warc.gz member stream cannot be split
  mid-file);
- ``parse_warc`` walks records with an iterator-form ``mapInPandas``
  (Arrow batches of whole files in, record rows out), so one Python
  parse per ARCHIVE, never per record-byte re-scan: headers are read
  until the blank line, the payload is sliced by ``Content-Length``
  (the spec's framing — no regex over payload bytes), and HTTP response
  headers are stripped to leave the raw html body.

Scale shape: a 100 TB WARC corpus is ~100k x 1 GB files; binaryFile
fans one task per file, the parser streams each file once, and the
output is immediately in the pages-table shape for the extraction
pipeline (`functions.html`) to derive text/lang.  No shuffle anywhere —
ingestion is a single mapPartitions-style stage ending in a parquet/
Iceberg write.

Record framing follows the public WARC 1.0/1.1 spec (warc-specifications
at iipc.github.io); only ``response`` (and ``resource``) records carry
page bodies — others (warcinfo, request, metadata) are dropped.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, source_path string"

_KEEP_TYPES = {"response", "resource"}


def _split_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record via Content-Length
    framing.  Tolerates both LF and CRLF header endings and any amount
    of inter-record padding newlines."""
    i, n = 0, len(blob)
    while i < n:
        # seek the next record marker
        j = blob.find(b"WARC/", i)
        if j < 0:
            return
        end = blob.find(b"\r\n\r\n", j)
        sep = 4
        if end < 0:
            end = blob.find(b"\n\n", j)
            sep = 2
        if end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[j:end].decode("utf-8", "replace").splitlines()[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            i = end + sep
            continue
        body_start = end + sep
        yield headers, blob[body_start : body_start + length]
        i = body_start + length


def _strip_http(payload: bytes) -> bytes:
    """A response record's payload is the full HTTP response; the page
    body starts after the header blank line."""
    if payload[:5] in (b"HTTP/", b"http/"):
        for sep in (b"\r\n\r\n", b"\n\n"):
            k = payload.find(sep)
            if k >= 0:
                return payload[k + len(sep) :]
    return payload


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a multi-member gzip stream (Common Crawl writes one
    member per record; ``GzipFile`` reads members back-to-back)."""
    with gzip.GzipFile(fileobj=io.BytesIO(blob)) as f:
        return f.read()


def parse_warc(files: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """(path, content:binary) -> one row per page record, in the pages
    input shape: ``(url, warc_ts, html, source_path)``.

    Iterator-form mapInPandas: at most one Arrow batch of archive blobs
    is materialized per task, and each blob is parsed exactly once.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                data = bytes(blob)
                if path.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    data = _gunzip_members(data)
                for headers, payload in _split_records(data):
                    if headers.get("warc-type") not in _KEEP_TYPES:
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    ts = pd.to_datetime(
                        headers.get("warc-date"), utc=True, errors="coerce"
                    )
                    rows.append(
                        (
                            url,
                            None if ts is pd.NaT else ts.tz_localize(None),
                            _strip_http(payload),
                            path,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "source_path"]
            )

    return files.mapInPandas(gen, PAGES_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Load WARC archives under ``path`` into the pages input shape.
    binaryFile's pathGlobFilter keeps the listing to archive files; one
    task per archive (a gzip member stream is not splittable)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return parse_warc(files)


def _enrich_pages(pages: DataFrame) -> DataFrame:
    """Record rows -> the full BASELINE input_hint pages shape
    ``(url, warc_ts, html:binary, text, lang)`` — the crawler's own
    Arrow-batched extractor (byte-identical-text contract) plus pure
    column-expression language ID.  Works identically on batch and
    streaming frames (no aggregation, no state)."""
    from pyspark.sql import functions as F

    from ..functions.html import extract_text
    from ..operators.textstats import lang_id, tokens

    return pages.withColumn(
        "text", extract_text(F.col("html").cast("string"))
    ).select(
        "url",
        "warc_ts",
        "html",
        "text",
        lang_id(tokens(F.col("text"))).alias("lang"),
    )


def ingest_warc(spark: SparkSession, path: str, table=None) -> DataFrame:
    """WARC archives -> the full BASELINE input_hint pages shape
    ``(url, warc_ts, html:binary, text, lang)``: parse records, extract
    text with the crawler's own Arrow-batched extractor (the
    byte-identical-text contract holds because it IS the same code
    path), and language-ID with pure column expressions.

    When ``table`` (a SnapshotTable) is given, the batch is
    fast-appended — per-file lineage stats land in the manifest, so
    ingestion is resumable and metered per archive partition.  One
    stage, no shuffle: binaryFile scan -> record walk -> text UDF ->
    lang exprs -> write.
    """
    pages = parse_warc(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    out = _enrich_pages(pages)
    if table is not None:
        table.commit_append(out, {"source": path})
        return table.read()
    return out


def stream_warc(
    spark: SparkSession,
    path: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuous WARC ingestion: the Structured-Streaming twin of
    ``ingest_warc`` for a landing directory that keeps receiving
    archives (the production Common-Crawl shape: crawlers drop
    .warc.gz files, the pages table follows).

    Same plan as the batch path — binaryFile source, record walk,
    Arrow text extraction, lang exprs — with the streaming engine's
    file-source ledger providing EXACTLY-ONCE per archive: processed
    files are recorded in ``checkpoint_dir``, so restarts and repeated
    ``availableNow`` runs ingest only new arrivals (the resumability
    ``ingest_warc`` gets from snapshot manifests, supplied here by the
    engine itself).  No aggregation, no watermark, no state store —
    a stateless map pipeline, so throughput is identical to batch.

    ``available_now=True`` drains everything currently in ``path`` and
    stops (incremental batch — the scheduled-ingest mode);
    ``False`` runs until stopped.  ``max_files_per_trigger`` bounds a
    micro-batch for backpressure at cluster scale.  Returns the
    StreamingQuery; callers ``awaitTermination()``.
    """
    reader = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .schema("path string, modificationTime timestamp, length long, content binary")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    out = _enrich_pages(parse_warc(files))
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_warc(records: list[tuple[str, str, bytes]], gzipped: bool = True) -> bytes:
    """Serialize (url, iso_ts, html_body) triples into WARC bytes — the
    test/fixture writer (one gzip member per record, like Common Crawl).
    Lives here so round-trip tests pin the same framing the parser
    reads."""
    out = bytearray()
    for url, ts, body in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode()
        rec = head + http + b"\r\n\r\n"
        out += gzip.compress(rec) if gzipped else rec
    return bytes(out)


def build_cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
    shards: int = 32,
) -> DataFrame:
    """CDX(J)-style capture index over an ingested pages table:
    (surt_key, ts, url, digest), globally ordered by (surt_key, ts).

    The public CDX format's whole point is the key order: pywb /
    OpenWayback binary-search flat sorted files, and Common Crawl's
    cc-index range-partitions by SURT prefix.  Spark's native shape for
    "globally sorted shard set" is repartitionByRange + within-partition
    sort — a range exchange against sampled bounds (no single-partition
    funnel), then each shard sorts only its slice; writing the result
    yields files whose key ranges are disjoint and ordered, so a
    per-domain lookup prunes to one shard.

    ``digest`` is the md5 of the body (the CDX content-digest column) —
    consumers diff it across ``ts`` to skip unchanged re-crawls without
    touching the bodies.
    """
    from tripwire_spark.functions.urls import surt

    keyed = pages.select(
        surt(url_col).alias("surt_key"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
        F.md5(F.col(body_col).cast("binary")).alias("digest"),
    )
    return keyed.repartitionByRange(shards, "surt_key", "ts").sortWithinPartitions(
        "surt_key", "ts"
    )


def asof_lookup(
    cdx: DataFrame,
    queries: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
) -> DataFrame:
    """Point-in-time capture retrieval: for each (url, as-of ts) query,
    the LATEST capture at or before that timestamp — the wayback
    "closest before" semantics every replay/diff tool speaks, and the
    canonical **as-of join** Spark lacks as a built-in.

    ``cdx``: output of ``build_cdx_index`` (surt_key, ts, url, digest).
    ``queries``: (url, ts) — urls are SURT-canonicalized here so callers
    pass plain urls.  Output: one row per query
    (url, asof_ts, capture_ts, capture_url, digest) with NULL capture
    columns when no capture precedes the asked-for instant (the query
    row is never silently dropped).

    Plan shape: the query side of a wayback workload is tiny against a
    petabyte index, so it BROADCASTS as the build side of an INNER join
    keyed on surt_key — the index side is never shuffled (and, being
    range-partitioned by surt_key on disk, scan pruning applies before
    the join).  A left-outer join could not do this (Spark cannot
    broadcast the preserved side), so never-matched queries are stitched
    back by an anti join between two query-sized frames.  The per-query
    argmax window runs over the matched captures only: partition count =
    query count, never index size.
    """
    from pyspark.sql import Window

    from tripwire_spark.functions.urls import surt

    q = queries.select(
        surt(url_col).alias("q_key"),
        F.col(url_col).alias("q_url"),
        F.col(ts_col).alias("asof_ts"),
    )
    c = cdx.select("surt_key", "ts", F.col("url").alias("capture_url"), "digest")
    hit = c.join(
        F.broadcast(q), (q["q_key"] == c["surt_key"]) & (c["ts"] <= q["asof_ts"]), "inner"
    )
    w = Window.partitionBy("q_url", "asof_ts").orderBy(
        F.col("ts").desc(), F.col("capture_url")
    )
    best = (
        hit.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("q_url").alias("url"),
            "asof_ts",
            F.col("ts").alias("capture_ts"),
            "capture_url",
            "digest",
        )
    )
    missed = q.join(
        best.select(F.col("url").alias("q_url"), "asof_ts"), ["q_url", "asof_ts"], "left_anti"
    ).select(
        F.col("q_url").alias("url"),
        "asof_ts",
        F.lit(None).cast(best.schema["capture_ts"].dataType).alias("capture_ts"),
        F.lit(None).cast("string").alias("capture_url"),
        F.lit(None).cast("string").alias("digest"),
    )
    return best.unionByName(missed)
