"""Training-corpus export: documents -> sharded JSONL, the lingua
franca every LLM data loader ingests (one JSON object per line,
bounded shard files, optional directory partitioning by split/source).

Shape notes for 100 TB:

- ``to_json(struct(...))`` is a JVM-side projection (whole-stage
  codegen) — no Python in the serialization path.
- ``maxRecordsPerFile`` bounds shard size without an extra shuffle;
  writer tasks roll files as they fill.
- ``shuffled=True`` applies the corpus-wide deterministic shuffle
  training wants (examples decorrelated from crawl/source order) as a
  repartitionByRange over the md5 of the id — sampled range bounds, so
  shards are balanced, the permutation is reproducible across runs AND
  cluster sizes (it depends only on doc ids), and each shard is
  internally ordered by the same key (resume-able data loading).
  That one range exchange is the entire cost; unshuffled export is a
  pure scan->write.
- ``partition_by`` (e.g. the ``split`` column from
  packing.split_corpus) writes train/val/test into separate
  directories so loaders never filter at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_jsonl(
    docs: DataFrame,
    path: str,
    columns: list[str] | None = None,
    id_col: str = "doc_id",
    max_records_per_file: int = 100_000,
    shuffled: bool = True,
    shards: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write ``docs`` as JSONL shards under ``path``."""
    cols = list(columns or docs.columns)
    for p in partition_by or []:
        if p not in cols:  # partition cols must survive the projection
            cols.append(p)
    out = docs
    if shuffled:
        key = F.md5(F.col(id_col).cast("string")).alias("__shuf")
        out = (
            docs.select(key, *[F.col(c) for c in cols])
            .repartitionByRange(shards or docs.sparkSession.sparkContext.defaultParallelism, "__shuf")
            .sortWithinPartitions("__shuf")
        )
    # partition columns live in the directory name, not in the JSON line
    # (duplicating them would collide with partition discovery on read)
    json_cols = [c for c in cols if c not in (partition_by or [])]
    line = F.to_json(F.struct(*[F.col(c) for c in json_cols])).alias("value")
    w = (
        out.select(*([line] + [F.col(c) for c in (partition_by or [])]))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.text(path)


def read_jsonl(spark, path: str, schema: str) -> DataFrame:
    """Read an exported corpus back (schema explicit — training
    manifests pin schemas; inference scans are banned at scale)."""
    return spark.read.schema(schema).json(path)
