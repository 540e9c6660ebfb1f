"""Connected components over duplicate-pair edges (dedup clustering).

Near-dup pipelines (MinHash/SimHash/embedding) emit PAIRS; turning
pairs into KEEP/DROP decisions needs the transitive closure — the
connected component each document belongs to, with one canonical
representative (the min doc id) kept per component.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
shape used at web scale because it converges in O(log n) rounds of
pure groupBy/join (vs O(diameter) for naive label propagation, which
a 10^6-long crawl chain would turn into 10^6 shuffles):

- large-star: every node points its LARGER neighbors at the minimum
  of its neighborhood (incl. itself).
- small-star: every node folds its SMALLER neighbors (and itself)
  onto their minimum.

Both steps are one shuffle each (groupBy node + join back); the edge
set only shrinks toward the star forest, so per-round cost is bounded
by the current edge count, never the node count squared.  Each round
is localCheckpoint'ed so a 20-round worst case carries no lineage
blowup (same policy as the crawl loop, crawl.py).

Reference analog: the reference has no clustering operator — this is
part of the LLM-training-data family (SURVEY.md "beyond the
reference"), where candidate pairs from dedup.py must become
per-document keep/drop verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(v, m) for every v in N(u) with v > u, m = min(N(u) + {u})."""
    both = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = both.groupBy("src").agg(
        F.least(F.min("dst"), F.col("src")).alias("m")
    )
    return (
        both.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Canonicalize src > dst; fold each node's smaller neighbors (and
    the node itself) onto their minimum."""
    canon = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
    )
    mins = canon.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        canon.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("src").alias("src"), F.col("m").alias("dst")))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id in that node's connected component.

    Deterministic, driver-loop-free per round: each iteration is two
    shuffle stages over the CURRENT edge set.  Convergence is checked
    with an exceptAll emptiness probe (one cheap job per round); the
    star steps provably converge in O(log n) rounds so ``max_iter=25``
    covers any graph this engine will ever see (2^25 nodes per
    component would exceed the corpus).
    """
    e = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        if nxt.exceptAll(e).isEmpty() and e.exceptAll(nxt).isEmpty():
            e = nxt
            break
        e = nxt
    # converged: edges are (member -> root).  Roots point nowhere;
    # emit them as their own component so every node is covered.
    roots = e.select(F.col("dst").alias("node")).distinct().join(
        e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    )
    return (
        e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .unionByName(roots.select("node", F.col("node").alias("component")))
    )


def dedup_keep_list(pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document keep/drop verdict from near-dup PAIRS.

    pairs: (doc_a, doc_b) near-duplicate pairs (any orientation).
    all_ids: one row per document (covers docs with no duplicates).
    Returns (doc_id, component, keep) — keep=true iff the doc is its
    component's canonical representative (min id), or has no dups.
    """
    cc = connected_components(pairs, "doc_a", "doc_b")
    return (
        all_ids.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
            (F.coalesce("component", F.col("doc_id")) == F.col("doc_id")).alias("keep"),
        )
    )
