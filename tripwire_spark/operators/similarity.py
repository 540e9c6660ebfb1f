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


# --- IVF (inverted-file) ANN ----------------------------------------------


def _nearest_cells(centroids, n_probe: int = 1):
    """Pandas UDF: top-``n_probe`` nearest centroid ids per vector by
    cosine — ONE BLAS matmul per Arrow batch, no per-row Python.

    ``centroids`` is a (k x dim) numpy array captured in the closure;
    at any real scale it is a few KB–MB, i.e. broadcast-sized by
    construction (k ~ sqrt(corpus), dim <= a few thousand).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def _cells(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(vecs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cn.T  # (n, k)
        p = min(n_probe, sims.shape[1])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        # stable probe order: by similarity desc, then cell id
        order = np.argsort(-np.take_along_axis(sims, top, 1), axis=1, kind="stable")
        return pd.Series(list(np.take_along_axis(top, order, 1).astype("int64")))

    return F.pandas_udf(_cells, T.ArrayType(T.LongType()))


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 5,
    sample_mod: int = 1,
):
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init: the ``n_centroids`` sample vectors with the smallest
    md5(id) — content-derived, so identical across runs, partitionings,
    and cluster sizes (same policy as packing.stratified_sample).
    Iterate: assign (pandas-UDF matmul, map-only) -> per-cell mean
    (posexplode + partial-agg groupBy — the only shuffle, carrying
    (cell, pos, val) triples of the SAMPLE, not the corpus) -> collect
    k x dim to the driver for the next closure.  Training runs on a
    deterministic 1/``sample_mod`` sample; k-means quality needs a
    sample, never the 100 TB corpus.

    Returns a (k x dim) numpy array.
    """
    import numpy as np

    s = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    if sample_mod > 1:
        s = s.filter(
            F.pmod(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast("long"),
                   F.lit(sample_mod)) == 0
        )
    s = s.persist()
    init = (
        s.withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h").limit(n_centroids).select("v").collect()
    )
    cents = np.array([r.v for r in init])
    for _ in range(iters):
        cell = _nearest_cells(cents, 1)
        assigned = s.select(F.element_at(cell(F.col("v")), 1).alias("c"), "v")
        means = (
            assigned.select("c", F.posexplode("v").alias("pos", "val"))
            .groupBy("c", "pos").agg(F.avg("val").alias("m"))
            .groupBy("c")
            .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos", "m"))),
                             lambda x: x["m"]).alias("cent"))
            .collect()
        )
        nxt = cents.copy()  # empty cells keep their old centroid
        for r in means:
            nxt[r.c] = np.array(r.cent)
        cents = nxt
    s.unpersist()
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    sample_mod: int = 1,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_centroids`` cells
    (trained k-means), probe each query's ``n_probe`` nearest cells,
    exact cosine re-rank inside the probed cells only.

    Scale shape: corpus assignment is map-only (one matmul UDF per
    batch; in a real deployment the cell id is written once as a
    partition column and reused); the probe join broadcasts the query
    side; candidate volume is corpus * n_probe / n_centroids — the
    tunable recall/cost dial IVF exists for.  Complements signlsh_topk:
    LSH needs no training pass, IVF adapts to the data distribution.
    """
    cents = kmeans_centroids(corpus, id_col, vec_col, n_centroids, iters, sample_mod)
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cell", F.element_at(_nearest_cells(cents, 1)(F.col("cvec")), 1))
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        F.explode(_nearest_cells(cents, n_probe)(F.col(vec_col).cast("array<double>"))).alias("cell"),
    )
    cands = (
        c.join(F.broadcast(q), "cell")
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


# --- SemDeDup (semantic dedup) ---------------------------------------------


def semantic_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 5,
    sample_mod: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    cluster the embedding space with the IVF coarse quantizer, then
    compare vectors ONLY within their cluster — two documents are
    semantic duplicates when their cosine exceeds ``threshold``.

    Returns (doc_a, doc_b, cos) with doc_a < doc_b.

    Scale shape — the reason SemDeDup clusters at all: all-pairs cosine
    over N documents is N^2; within-cluster pairs are sum_c n_c^2 ~=
    N^2/k, and the cluster assignment itself is map-only (one BLAS
    matmul per Arrow batch against the broadcast k x dim centroids).
    The pair join shuffles (cell, id, vec) once, keyed by cell; a skewed
    giant cell is the operator's known failure mode, so pick
    n_centroids ~ sqrt(N) and let AQE's skew-join handle stragglers.
    Like the paper, this FINDS the duplicate relation; the keep policy
    is ``semantic_dedup_keep`` so policy stays separately testable.
    """
    cents = kmeans_centroids(corpus, id_col, vec_col, n_centroids, iters, sample_mod)
    cell = _nearest_cells(cents, 1)
    v = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("cell", F.element_at(cell(F.col("vec")), 1))
    a = v.select("cell", F.col("id").alias("doc_a"), F.col("vec").alias("va"))
    b = v.select("cell", F.col("id").alias("doc_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, "cell")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", "cos")
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 5,
    sample_mod: int = 1,
) -> DataFrame:
    """Per-document keep/drop verdicts from semantic duplicate pairs:
    transitive closure over the pair graph (alternating star, O(log n)
    rounds), one canonical survivor per component — the same keep
    machinery the MinHash/SimHash families feed
    (clustering.dedup_keep_list)."""
    from tripwire_spark.operators.clustering import dedup_keep_list

    pairs = semantic_dup_pairs(
        corpus, id_col, vec_col, threshold, n_centroids, iters, sample_mod
    )
    return dedup_keep_list(pairs, corpus.select(F.col(id_col)), id_col)
