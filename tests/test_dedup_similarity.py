"""Dedup family + similarity search: planted duplicates must be found;
LSH paths must agree with exact baselines (SURVEY.md §5.1)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select(F.col("doc_id").alias("doc"), "text")
    dups = d.filter(F.pmod("doc", F.lit(25)) == 0).select(
        (F.col("doc") + 100000).alias("doc"), F.concat("text", F.lit(" zzz end")).alias("text")
    )
    return d.unionAll(dups).persist()


def test_minhash_matches_exact(spark, docs):
    from tripwire_spark.operators.dedup import (
        exact_jaccard_pairs,
        minhash_dedup_pairs,
        shingles,
    )

    exact = {
        (r.doc_a, r.doc_b) for r in exact_jaccard_pairs(shingles(docs, "doc", "text"), 0.8).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in minhash_dedup_pairs(docs, "doc", "text").collect()}
    planted = {r[0] for r in docs.filter(F.col("doc") >= 100000).select("doc").collect()}
    # every planted near-dup pair is recovered by BOTH paths
    for d in planted:
        assert (d - 100000, d) in exact
    assert lsh == exact  # verified-LSH equals the exact pair set


def test_simhash_finds_planted(spark, docs):
    from tripwire_spark.operators.dedup import simhash, simhash_pairs

    pairs = {(r.doc_a, r.doc_b) for r in simhash_pairs(simhash(docs, "doc", "text"), 3).collect()}
    planted = {r[0] for r in docs.filter(F.col("doc") >= 100000).select("doc").collect()}
    found = sum((d - 100000, d) in pairs for d in planted)
    # A 2-token append on a ~150-token doc flips ~3-8 of 64 bits
    # (vote margins are tight), so simhash recall here is ~0.7 — it is
    # the coarse/fast tier; minhash is the high-recall tier (test above
    # asserts recall 1.0 there).
    assert found >= 0.6 * len(planted)


def test_ann_lsh_recall(spark):
    from tripwire_spark.operators.similarity import brute_topk, signlsh_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.pmod("vec_id", F.lit(100)) == 0)
    brute = {(r.qid, r.cid) for r in brute_topk(e, q, k=3).collect()}
    ann = {(r.qid, r.cid) for r in signlsh_topk(e, q, k=3).collect()}
    assert len(brute) > 0
    assert len(ann & brute) / len(brute) >= 0.6  # 16-bit LSH recall floor


def test_minhash_plan_has_no_allpairs_shingle_join(spark, docs):
    """The LSH must PRUNE: verification intersects shingle sets only for
    candidate pairs.  A join keyed on the bare shingle column is the
    quadratic all-pairs plan (the round-1 regression)."""
    import re

    from tripwire_spark.operators.dedup import minhash_dedup_pairs

    plan = (
        minhash_dedup_pairs(docs, "doc", "text")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Join" in line and re.search(r"shingle#\d+ = shingle#\d+", line):
            assert "doc_" in line, f"bare-shingle self-join in plan: {line}"


def test_embedding_bucketed_equals_brute(spark):
    from tripwire_spark.operators.dedup import embedding_dup_pairs, embedding_dup_pairs_brute

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pert = e.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.slice(F.col("embedding").cast("array<double>"), 1, 1),
            F.array(F.element_at(F.col("embedding").cast("array<double>"), 2) + F.lit(0.5)),
            F.slice(F.col("embedding").cast("array<double>"), 3, 62),
        ).alias("embedding"),
    )
    aug = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionAll(pert)
    brute = {(r.id_a, r.id_b) for r in embedding_dup_pairs_brute(aug, "vec_id", "embedding", 0.9).collect()}
    lsh = {(r.id_a, r.id_b) for r in embedding_dup_pairs(aug, "vec_id", "embedding", 0.9).collect()}
    assert len(brute) > 0
    # (16 tables x 4 bits) miss prob at cos>=0.9 is ~4e-6 per pair;
    # verification kills all false positives, so the sets are equal
    assert lsh == brute


def test_embedding_bucketed_plan_not_cartesian(spark):
    from tripwire_spark.operators.dedup import embedding_dup_pairs

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = (
        embedding_dup_pairs(e, "vec_id", "embedding", 0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_jaccard_symmetric_threshold(spark, docs):
    from tripwire_spark.operators.dedup import exact_jaccard_pairs, shingles

    pairs = exact_jaccard_pairs(shingles(docs, "doc", "text"), 0.8)
    rows = pairs.collect()
    assert all(r.doc_a < r.doc_b for r in rows)
    assert all(0.8 <= r.jaccard <= 1.0 for r in rows)


def test_decontaminate_flags_eval_members_and_broadcasts(spark, docs):
    from tripwire_spark.operators.dedup import decontaminate

    ev = docs.filter(F.pmod("doc", F.lit(25)) == 0)
    out = decontaminate(docs, ev, "doc", "text", "doc", "text", n=3, max_overlap=0.2)
    rows = {r["doc"]: r for r in out.collect()}
    # every eval member overlaps itself fully
    for d, r in rows.items():
        if d % 25 == 0 and d < 100000:
            assert r["contaminated"] and r["overlap"] == 1.0
    # the planted near-dups (same text + ' zzz end') must be flagged too
    planted = [r for d, r in rows.items() if d >= 100000]
    assert planted and all(r["contaminated"] for r in planted)
    # scale shape: eval shingles broadcast, no shuffle of the doc side vs eval
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_features_fixtures(spark):
    from tripwire_spark.operators.textstats import repetition_features

    rows = [
        ("clean", "alpha beta gamma delta epsilon zeta"),
        ("looped", "spam ham spam ham spam ham spam ham"),
        ("dup_lines", "line one\nline one\nline two\n\n"),
        ("single", "lonely"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, ["k", "text"])
    feats = repetition_features(F.col("text"))
    out = {
        r["k"]: r
        for r in df.select(
            "k", *[v.alias(n) for n, v in feats.items()]
        ).collect()
    }
    assert out["clean"]["dup_2gram_frac"] == 0.0 and out["clean"]["keep"]
    # "spam ham" x4: 7 grams, 2 distinct -> dup 5/7; top "spam ham" 4/7
    assert abs(out["looped"]["dup_2gram_frac"] - 5 / 7) < 1e-6
    assert abs(out["looped"]["top_2gram_frac"] - 4 / 7) < 1e-6
    assert not out["looped"]["keep"]
    # 3 non-empty lines, one repeat -> 1/3; trailing blank line ignored
    assert abs(out["dup_lines"]["dup_line_frac"] - 1 / 3) < 1e-6
    # 1-token and empty docs must not crash the sequence/slice path
    assert out["single"]["dup_2gram_frac"] == 0.0
    assert out["empty"]["top_2gram_frac"] == 0.0


def test_ann_ivf_recall(spark):
    from tripwire_spark.operators.similarity import brute_topk, ivf_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(40)) == 0)
    brute = {(r.qid, r.cid) for r in brute_topk(e, q, k=3).collect()}
    ivf = {(r.qid, r.cid) for r in ivf_topk(e, q, k=3, n_centroids=16, n_probe=6).collect()}
    # probing 6/16 cells must recover most exact neighbors
    assert len(ivf & brute) / len(brute) >= 0.7
    # determinism: the trained quantizer is content-derived, not RNG
    ivf2 = {(r.qid, r.cid) for r in ivf_topk(e, q, k=3, n_centroids=16, n_probe=6).collect()}
    assert ivf == ivf2


def test_remove_repeated_spans_cross_doc_and_self(spark):
    """ExactSubstr semantics hand-traced: the FIRST occurrence of a
    repeated 8-token span survives; later copies (cross-doc and within
    one doc) lose exactly the covered tokens."""
    from tripwire_spark.operators.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),                    # first occurrence
            (2, "x x a b c d e f g h tail"),               # copy at p=3
            (3, "m n o p q r s t m n o p q r s t"),        # self-repeat at p=9
            (4, "short doc"),                              # < span: untouched
        ],
        "doc long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, "doc", "text", span=8).collect()}
    assert out[1].clean_text == "a b c d e f g h i j" and out[1].n_removed == 0
    assert out[2].clean_text == "x x tail" and out[2].n_removed == 8
    assert out[3].clean_text == "m n o p q r s t" and out[3].n_removed == 8
    assert out[4].clean_text == "short doc" and out[4].n_removed == 0
    assert out[2].n_tokens == 11 and out[3].n_tokens == 16

    # stride=8 still catches the aligned self-repeat with 1/8 the windows
    s8 = {r.doc_id: r for r in
          remove_repeated_spans(docs, "doc", "text", span=8, stride=8).collect()}
    assert s8[3].clean_text == "m n o p q r s t"

    # deterministic across partitionings (window total order is (doc, p))
    a = remove_repeated_spans(docs.repartition(1), "doc", "text", span=8).collect()
    b = remove_repeated_spans(docs.repartition(7), "doc", "text", span=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_minhash_corpus_index_incremental_lifecycle(spark, tmp_path):
    """Bootstrap an index, dedup batch 1 against it, fast-append batch 1,
    then batch 2 must match BOTH the original corpus and batch 1 —
    history is queried via its persisted bucket/shingle snapshots, and
    appends never rewrite prior files (snapshot row counts add up)."""
    import pyspark.sql.functions as F

    from tripwire_spark.operators.dedup import MinHashCorpusIndex
    from tripwire_spark.sources.snapshots import SnapshotTable

    base = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame([(1, base), (2, "totally different words " * 10)],
                                   "doc long, text string")
    b1 = spark.createDataFrame([(101, base + " tail1")], "doc long, text string")
    b2 = spark.createDataFrame([(201, base + " tail2")], "doc long, text string")

    idx = MinHashCorpusIndex(
        SnapshotTable(spark, str(tmp_path), "buckets"),
        SnapshotTable(spark, str(tmp_path), "shingles"),
    )
    idx.bootstrap(corpus, "doc", "text")
    n_boot = idx.buckets.read().count()

    p1 = {(r.doc_a, r.doc_b) for r in idx.dedup_batch(b1, "doc", "text").collect()}
    assert p1 == {(1, 101)}  # matches the corpus twin, not the unrelated doc

    idx.append(b1, "doc", "text")
    assert idx.buckets.read().count() == n_boot + 32  # one batch doc x 32 bands

    p2 = {(r.doc_a, r.doc_b) for r in idx.dedup_batch(b2, "doc", "text").collect()}
    assert p2 == {(1, 201), (101, 201)}  # corpus AND previously appended batch


def test_semantic_dedup_finds_planted_dups(spark):
    from tripwire_spark.operators.dedup import embedding_dup_pairs_brute
    from tripwire_spark.operators.similarity import semantic_dedup_keep, semantic_dup_pairs

    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(120)
    # plant near-identical copies (id+1000) of the first 10 vectors
    pert = e.limit(10).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.concat(
            F.array(F.element_at(F.col("embedding").cast("array<double>"), 1) + F.lit(0.01)),
            F.slice(F.col("embedding").cast("array<double>"), 2, 63),
        ).alias("embedding"),
    )
    aug = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionAll(pert)
    pairs = semantic_dup_pairs(aug, "vec_id", "embedding", threshold=0.995, n_centroids=4)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    planted = {(i, i + 1000) for i in range(10)}
    # clustering partitions the space: recall < 1 only for BOUNDARY
    # pairs; near-identical vectors co-assign, so all planted pairs land
    assert planted <= got, planted - got
    # every emitted pair is a true positive vs the exact verifier
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_brute(aug, "vec_id", "embedding", 0.995).collect()
    }
    assert got <= brute
    # keep-list: exactly one survivor per duplicate component
    keep = {r.doc_id: r.keep for r in semantic_dedup_keep(
        aug, "vec_id", "embedding", threshold=0.995, n_centroids=4).collect()}
    for i in range(10):
        assert keep[i] and not keep[i + 1000]


def test_semantic_dedup_deterministic(spark):
    from tripwire_spark.operators.similarity import semantic_dup_pairs

    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(80)
    a = sorted(map(tuple, semantic_dup_pairs(e, threshold=0.7, n_centroids=4).collect()))
    b = sorted(map(tuple, semantic_dup_pairs(e.repartition(7), threshold=0.7, n_centroids=4).collect()))
    assert a == b
