"""Hashed bigram LM perplexity (operators/lm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripwire_spark.operators.lm import lm_perplexity, train_bigram_lm


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat", 1),
        (2, "the dog sat on the rug", 1),
        (3, "the cat sat on the rug", 1),
        (4, "zx qv jk wp zx qv", 0),  # nothing like the training slice
        (5, "the cat sat on the mat", 0),  # identical to a training doc
        (6, "one", 0),  # < 2 tokens -> no grams
        (7, "", 0),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, train int")


def test_model_shape_and_counts(spark):
    d = _docs(spark)
    m = train_bigram_lm(d.filter(F.col("train") == 1), "doc_id", "text", buckets=256)
    rows = m.collect()
    assert set(m.columns) == {"bucket", "c_bg", "c_ctx"}
    assert all(0 <= r.bucket < 256 for r in rows)
    # 3 training docs x 5 bigrams each = 15 instances on each marginal
    assert sum(r.c_bg for r in rows) == 15
    assert sum(r.c_ctx for r in rows) == 15


def test_perplexity_orders_in_domain_below_noise(spark):
    d = _docs(spark)
    m = train_bigram_lm(d.filter(F.col("train") == 1), "doc_id", "text", buckets=256)
    out = {r.doc_id: r for r in lm_perplexity(d, m, "doc_id", "text", buckets=256).collect()}
    assert len(out) == 7
    # a doc the model was trained on scores far lower than gibberish
    assert out[5].ppl < out[4].ppl
    # identical texts score identically regardless of any other column
    assert out[1].ppl == out[5].ppl
    # gramless docs: n_grams 0, ppl NULL (the gate decides, not the scorer)
    for did in (6, 7):
        assert out[did].n_grams == 0 and out[did].ppl is None


def test_perplexity_deterministic_across_partitionings(spark):
    d = _docs(spark)
    m = train_bigram_lm(d.filter(F.col("train") == 1), "doc_id", "text", buckets=64)
    a = sorted(lm_perplexity(d, m, "doc_id", "text", buckets=64).collect())
    b = sorted(
        lm_perplexity(d.repartition(7), m.repartition(3), "doc_id", "text", buckets=64).collect()
    )
    assert a == b
