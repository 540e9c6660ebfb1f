"""Similarity search over embedding columns (array<float>).

- ``brute_topk``: exact cosine top-k — the correctness baseline.  The
  query set is broadcast; the corpus is scanned once; per-query top-k
  via ranking window on (query, -cos).
- ``signlsh_topk``: the scale path — 16-bit random-hyperplane sign
  buckets with deterministic pseudo-random planes derived from
  xxhash64 (no RNG state, reproducible across runs/cluster sizes).
  Probing matches query bucket + hamming<=R neighbor buckets via the
  chunk trick, then exact re-rank inside the candidate set.

Dot products use F.zip_with/F.aggregate (JVM codegen).  A Pandas-UDF
BLAS variant is deliberately NOT the default: for 64-dim vectors the
Arrow round-trip costs more than the fused codegen loop; revisit for
>=1024-dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tripwire_spark.operators.dedup import cosine


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self)."""
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cvec"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 9))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_table_keys(dim: int = 64, n_tables: int = 16, bits: int = 4):
    """Vectorized sign-LSH keys: ``n_tables`` keys of ``bits`` random
    hyperplane signs each.

    The projection is an (n x dim) @ (dim x n_tables*bits) matrix
    multiply — exactly the case where a numpy pandas UDF beats codegen
    (one BLAS call per Arrow batch, no per-row Python).  Planes are
    drawn from a FIXED seed, so signatures are reproducible across
    runs, partitionings, and cluster sizes.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rng = np.random.RandomState(42)
    planes = rng.standard_normal((dim, n_tables * bits))
    weights = 1 << np.arange(bits)

    def _keys(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(vecs.to_numpy())  # (n, dim)
        signs = (m @ planes) > 0  # (n, n_tables*bits)
        signs = signs.reshape(len(m), n_tables, bits)
        tkeys = (signs * weights).sum(axis=2)  # (n, n_tables)
        # encode table id in the key so one equi-join covers all tables
        tkeys = tkeys + (np.arange(n_tables) << 32)
        return pd.Series(list(tkeys.astype("int64")))

    return F.pandas_udf(_keys, T.ArrayType(T.LongType()))


def signlsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """ANN: candidates share >=1 of 16 4-bit sign-LSH table keys with
    the query (recall ~0.94 for cos~0.4 neighbors, higher for closer),
    then exact cosine re-rank of candidates only.

    At corpus scale the bucket join shuffles only (key, id) pairs; the
    re-rank joins vectors back by id.
    """
    keys = lsh_table_keys(dim, n_tables, bits)
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        F.explode(keys(F.col(vec_col).cast("array<double>"))).alias("key"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        F.explode(keys(F.col(vec_col).cast("array<double>"))).alias("key"),
    )
    cands = (
        c.join(F.broadcast(q), "key")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "qvec", "cid", "cvec")
        .distinct()
    )
    scored = cands.withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 9))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 6).alias("cos"), "rank")
    )
