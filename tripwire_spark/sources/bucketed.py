"""Bucketed (co-located) storage for the engine's big repeated joins.

The crawl's hottest join keys are stable across every round — the
frontier and the pages table both key on the canonical ``url_hash``,
and the dedup family keys on document ids.  Writing BOTH sides of such
a join bucketed by the same key into the same bucket count makes the
join **zero-exchange forever**: Spark's bucketing contract (hash(key)
mod n decides the file, one file set per bucket) lets the sort-merge
join read matching buckets pairwise, so a 100 TB pages table is never
shuffled for any subsequent frontier join, recrawl diff, or CDX merge
— the shuffle is paid ONCE at write time, amortized over every later
query.  This is the Spark-native analog of the reference's Postgres
indexes (schema.sql:2276-2345): a physical layout choice that turns a
repeated O(data) network cost into a local merge.

Used sparingly: bucketing only pays when the same join repeats (frontier
rounds, incremental dedup batches); one-shot joins should let AQE pick
the strategy instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str = "url_hash",
    buckets: int = 32,
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as external table
    ``name`` at ``path``.

    ``buckets`` must MATCH across the tables that will join (the
    zero-exchange plan needs equal bucket counts); sortBy makes each
    bucket file merge-ready so the join also skips the per-task sort.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    key: str = "url_hash",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on ``key`` with the merge strategy
    pinned — with matching bucket specs the physical plan contains NO
    Exchange on either side (asserted by tests/test_bucketed.py)."""
    left = spark.table(left_name)
    right = spark.table(right_name)
    return left.hint("merge").join(right, key, how)
