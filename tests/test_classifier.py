"""Hashed log-odds quality classifier (operators/classifier.py)."""

import pyspark.sql.functions as F

from tripwire_spark.operators.classifier import (
    classifier_score,
    classifier_score_map,
    train_log_odds,
)

B = 512


def _corpus(spark, n=300):
    # positives talk about signal words, negatives about noise words —
    # learnable, deterministic, with shared filler in both classes
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        themed = ("signal quality clean prose " if pos else "noise spam junk click ") * 3
        rows.append((i, themed + f"filler{i % 7} common words", pos))
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_train_and_score_separates_classes(spark):
    d = _corpus(spark)
    w = train_log_odds(d, "label", buckets=B)
    out = classifier_score(d, w, buckets=B, carry=["label"]).collect()
    pos = [r.quality_score for r in out if r.label]
    neg = [r.quality_score for r in out if not r.label]
    assert min(pos) > max(neg)  # fully separable corpus: clean margin
    assert all(r.keep for r in out if r.label)
    assert not any(r.keep for r in out if not r.label)


def test_score_deterministic_across_partitioning(spark):
    d = _corpus(spark, 120)
    w = train_log_odds(d, "label", buckets=B)
    a = {r.doc_id: r.quality_score for r in classifier_score(d, w, buckets=B).collect()}
    b = {
        r.doc_id: r.quality_score
        for r in classifier_score(d.repartition(13), w, buckets=B).collect()
    }
    assert a == b


def test_map_variant_matches_join_and_is_shuffle_free(spark):
    d = _corpus(spark, 80)
    w = train_log_odds(d, "label", buckets=B)
    from tripwire_spark.operators.classifier import collect_weights

    w6 = collect_weights(w, B)  # densified: len == trained modulus
    assert len(w6) == B
    ref = {r.doc_id: (r.n_toks, r.quality_score, r.keep)
           for r in classifier_score(d, w, buckets=B).collect()}
    fast = classifier_score_map(d, w6)
    got = {r.doc_id: (r.n_toks, r.quality_score, r.keep) for r in fast.collect()}
    assert got == ref
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # pure projection: rides the scan


def test_empty_and_unseen_docs_score_zero(spark):
    train = _corpus(spark, 40)
    w = train_log_odds(train, "label", buckets=B)
    score_in = spark.createDataFrame(
        [(1000, "   "), (1001, "totally unseen vocabulary here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in classifier_score(score_in, w, buckets=B).collect()}
    assert out[1000].n_toks == 0
    assert out[1000].quality_score == 0.0 and out[1000].keep is False
    # unseen tokens still hash into trained buckets (hashing trick):
    # score is defined, keep is a real decision, no nulls anywhere
    assert out[1001].quality_score is not None and out[1001].keep is not None
