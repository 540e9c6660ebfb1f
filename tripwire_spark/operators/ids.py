"""Deterministic, scalable dense-id assignment.

The reference relies on Postgres ``serial`` PKs and a Redis ``INCR``
counter for global ids (``runners/common_utils.py:341-342``,
``schema.sql:2317``).  Spark's ``monotonically_increasing_id`` is not
stable across runs/partitionings, and a global ``row_number()`` window
collapses to a single partition — a non-starter at 10^10 rows.

``assign_dense_ids`` reproduces serial semantics scalably:

1. range-partition by the requested total order,
2. count rows per partition (tiny driver-side collect: one long per
   partition),
3. cumulative offsets + per-partition local index via
   ``zipWithIndex``-style arithmetic on Arrow batches.

Result: ids are dense, start at ``start``, and follow exactly the
requested sort order — replayable across runs and cluster sizes.

``assign_monotone_ids`` is the cheap sibling used in the crawl hot
loop: ids are SPARSE but strictly monotone in the requested order —
``start + (partition_rank << idx_bits) + local_index`` — computed with
zero driver-side actions (range partitions are emitted in sort order,
so the (pid, local_index) pair already encodes the global order).  Use
it whenever only the *order relation* of the ids matters (the
frontier's FIFO-claim semantics need exactly that, not density).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_monotone_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "qid",
    start: int = 0,
    num_partitions: int | None = None,
    idx_bits: int = 36,
) -> DataFrame:
    """Add ``id_col`` sparse-but-monotone in ``order_cols`` order, lazily.

    id = start + (pid << idx_bits) + local_index.  Bit budget: with the
    default 36 idx_bits, up to 2^21 range partitions x 68e9 rows each
    under a 57-bit id space — far past a 10^10-row frontier round.
    Deterministic for a fixed input + partition count (Spark's range
    sampler is seeded per partition index); callers that need run-to-run
    stability across *different* cluster sizes should pin
    ``num_partitions``.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parted = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    # StructType.add mutates — build a fresh schema, never touch df's.
    out_schema = T.StructType(
        list(parted.schema.fields) + [T.StructField(id_col, T.LongType(), False)]
    )

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = start + (TaskContext.get().partitionId() << idx_bits)
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf[id_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema)


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "qid",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = start, start+1, ... following ``order_cols`` order.

    Deterministic given deterministic ``order_cols`` (ties broken by the
    full column list — callers must pass a total order).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *[F.col(c) for c in order_cols]
    )
    parted = parted.withColumn("__pid", F.spark_partition_id())
    # Pin the sampled range boundaries: the count action and the final
    # mapInPandas must see the SAME physical partitioning.
    parted = parted.persist()
    # Per-partition counts: tiny aggregate (one row per partition).
    counts = {r["__pid"]: r["cnt"] for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = parted.drop("__pid").schema.add(id_col, "long", False)
    offs = offsets  # closure capture (small dict)

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offs.get(int(pdf["__pid"].iloc[0]), 0)
            pdf = pdf.drop(columns="__pid")
            pdf[id_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema)
