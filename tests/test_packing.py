"""Shard packing + stratified sampling (operators/packing.py)."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from tripwire_spark.operators.packing import md5_bucket, pack_shards, stratified_sample


def _docs(spark, n=500):
    return spark.range(n).select(
        (F.col("id") * 7 % 997).alias("doc_id"),  # non-contiguous, unique for n<=997
        (F.pmod(F.col("id") * 31, F.lit(400)) + 5).alias("n_tokens"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh"), F.lit("fr")),
            (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
    )


def test_pack_shards_matches_global_cumsum(spark):
    """The two-phase distributed cumsum equals the one-window global
    restatement (the oracle contract), bucket boundaries included."""
    d = _docs(spark).repartition(8)
    got = {
        r.doc_id: (r.token_offset, r.shard)
        for r in pack_shards(d, budget=1500, n_buckets=16).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = d.withColumn("off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    for r in ref.collect():
        assert got[r.doc_id] == (r.off, r.off // 1500), r.doc_id
    # the budget is a shard START rule: every shard's first doc starts
    # inside its [k*budget, (k+1)*budget) window
    for doc_id, (off, shard) in got.items():
        assert off // 1500 == shard


def test_pack_shards_no_global_sort_of_data(spark):
    """Scale shape: the only single-partition structure is the
    n_buckets-row totals window — the data itself is never funneled
    through one partition (the naive one-window plan would)."""
    d = _docs(spark, 400).repartition(8)
    plan = (
        pack_shards(d, budget=1000, n_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every SinglePartition exchange feeds from an aggregate — scalar
    # min/max or the n_buckets totals — never raw document rows
    lines = plan.splitlines()
    sp = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert sp, plan
    for i in sp:
        assert "HashAggregate" in lines[i + 1], "\n".join(lines[i : i + 2])
    # and the data-side running sum is a per-bucket window (parallel),
    # not an unpartitioned global window over the documents
    assert "windowspecdefinition(__bkt" in plan, plan


def test_stratified_sample_deterministic_and_proportional(spark):
    d = _docs(spark, 800)
    fr = {"en": 0.5, "de": 0.25, "zh": 0.1}
    s1 = stratified_sample(d, fr, group_col="lang", id_col="doc_id")
    s2 = stratified_sample(d.repartition(13), fr, group_col="lang", id_col="doc_id")
    rows1 = {r.doc_id for r in s1.collect()}
    rows2 = {r.doc_id for r in s2.collect()}
    assert rows1 == rows2  # partitioning-independent = run-reproducible
    got = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for g, f in fr.items():
        assert abs(got.get(g, 0) / tot[g] - f) < 0.12, (g, got.get(g, 0), tot[g])
    assert "fr" not in got  # default_fraction=0 drops unlisted groups


def test_chunk_documents_tiling_and_overlap(spark):
    from tripwire_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "   "), (4, "solo")],
        "doc_id long, text string",
    )
    # stride == window tiles exactly; short tail kept when >= min_tokens
    out = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.chunk_tokens)
        for r in chunk_documents(docs, window=4, min_tokens=1).collect()
    }
    assert out[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert out[(1, 1)] == ("t4 t5 t6 t7", 4)
    assert out[(1, 2)] == ("t8 t9", 2)
    assert out[(2, 0)] == ("a b", 2)
    assert (3, 0) not in out  # whitespace-only doc yields nothing
    assert out[(4, 0)] == ("solo", 1)

    # overlapping stride: chunk k starts at k*stride, windows overlap
    ov = {
        r.chunk_id: r.chunk_text
        for r in chunk_documents(
            docs.filter("doc_id = 1"), window=4, stride=2, min_tokens=3
        ).collect()
    }
    assert ov[0] == "t0 t1 t2 t3" and ov[1] == "t2 t3 t4 t5"
    assert ov[3] == "t6 t7 t8 t9"
    assert 4 not in ov  # 2-token tail dropped by min_tokens=3

    # zero shuffles: chunking is a pure narrow projection
    plan = (
        chunk_documents(docs, window=4, stride=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_md5_bucket_range(spark):
    vals = [r.b for r in spark.range(300).select(md5_bucket("id").alias("b")).collect()]
    assert all(0 <= v < 10_000 for v in vals)
    assert len(set(vals)) > 250  # near-uniform spread


def test_split_corpus_fractions_and_stability(spark):
    from tripwire_spark.operators.packing import split_corpus

    d = _docs(spark, 500)
    out = split_corpus(d, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 500 - 0.8) < 0.08  # md5 uniformity at n=500
    # growth stability: adding documents NEVER moves an existing doc's
    # split (assignment depends only on the doc's own id hash)
    small = {r.doc_id: r.split for r in split_corpus(d.limit(100), {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id").collect()}
    full = {r.doc_id: r.split for r in out.collect()}
    assert all(full[k] == v for k, v in small.items())
    # remainder falls to the LAST split: fractions that do not sum to 1
    out2 = split_corpus(d, {"train": 0.5, "rest": 0.1}, "doc_id")
    c2 = {r.split: r.n for r in out2.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert c2["rest"] > 500 * 0.3  # got 0.5, not 0.1
