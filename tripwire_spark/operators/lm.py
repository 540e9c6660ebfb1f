"""Hashed n-gram language-model perplexity: the CCNet-style quality
gate (Wenzek et al. 2020 score Common-Crawl text with a KenLM n-gram
model trained on a trusted corpus; documents with low perplexity under
that model read like the reference corpus).

This is the closed-form Spark restatement at a hashed feature
granularity: the model is conditional bigram counts over a CLOSED md5
bucket space (``buckets`` rows no matter how large the training
corpus), trained in ONE partial-agg groupBy; scoring joins the gram
stream against the <= ``buckets``-row broadcast model — document text
never enters a shuffle, and the only wide exchange is the final
per-document sum keyed by doc id.

    logp(w | prev) = ln( (c[bg(prev,w)] + 1) / (c_ctx[b(prev)] + buckets) )
    ppl(doc)       = exp( -mean_instance logp )

add-one smoothing over the hashed vocabulary, so unseen grams score
finitely and the model needs no backoff table.  Per-instance log
probabilities are rounded to integer micro-units (1e-6) before the
per-document sum — float accumulation order is engine- and
partitioning-dependent, integer sums are exact, so scores are
byte-stable across engines and cluster sizes (same discipline as
weighting.dsir_importance / classifier.train_log_odds).

Reference analog: the crawler's lang_class enum gates pages on a text
heuristic (schema.sql:241-247); this is the corpus-curation
generalization the LLM pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripwire_spark.operators.dedup import word_ngrams
from tripwire_spark.operators.packing import md5_bucket
from tripwire_spark.operators.textstats import tokens


def _gram_stream(docs: DataFrame, id_col: str, text_col: str, buckets: int) -> DataFrame:
    """(id, bg_bucket, ctx_bucket) per bigram instance.

    The bigram hashes as the space-joined token pair, the context as
    the previous token alone — both through the engine-portable
    md5_bucket so the DuckDB oracle replays identical bucket ids.
    """
    toks = tokens(F.col(text_col))
    return (
        docs.select(F.col(id_col), F.explode(word_ngrams(toks, 2)).alias("gram"))
        .select(
            id_col,
            md5_bucket("gram", buckets).alias("bg_bucket"),
            md5_bucket(F.split(F.col("gram"), " ")[0], buckets).alias("ctx_bucket"),
        )
    )


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Train the hashed conditional-bigram model on ``docs``.

    Returns one row per OBSERVED bucket: (bucket, c_bg, c_ctx) where
    c_bg = bigram instances whose bigram hash lands in ``bucket`` and
    c_ctx = bigram instances whose CONTEXT (previous-token) hash lands
    there.  Both marginals share one bucket column so the model stays a
    single <= ``buckets``-row table — broadcast-sized at any corpus
    scale, built by one partial-agg groupBy per marginal over the gram
    stream (Zipf skew absorbed map-side).
    """
    g = _gram_stream(docs, id_col, text_col, buckets)
    bg = g.groupBy(F.col("bg_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("c_bg")
    )
    ctx = g.groupBy(F.col("ctx_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("c_ctx")
    )
    return (
        bg.join(ctx, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("c_bg", F.lit(0)).cast("long").alias("c_bg"),
            F.coalesce("c_ctx", F.lit(0)).cast("long").alias("c_ctx"),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Score every document's perplexity under a trained model.

    Output: (id, n_grams, ppl) — ppl rounded to 6 dp; documents with
    fewer than 2 tokens have n_grams = 0 and ppl NULL (no distribution
    to be perplexed by — the downstream gate decides their fate, the
    scorer does not invent a number).

    Plan: gram stream LEFT-joins the broadcast model twice (numerator
    bucket, context bucket; absent buckets count 0 by smoothing), one
    integer partial-agg groupBy(id) for the sum, then a left join back
    onto the corpus ids.  Lower ppl = more like the training corpus.
    """
    g = _gram_stream(docs, id_col, text_col, buckets)
    num = model.select(F.col("bucket").alias("bg_bucket"), "c_bg")
    den = model.select(F.col("bucket").alias("ctx_bucket"), "c_ctx")
    inst = (
        g.join(F.broadcast(num), "bg_bucket", "left")
        .join(F.broadcast(den), "ctx_bucket", "left")
        .select(
            id_col,
            F.round(
                (
                    F.log((F.coalesce("c_bg", F.lit(0)) + 1).cast("double"))
                    - F.log((F.coalesce("c_ctx", F.lit(0)) + buckets).cast("double"))
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )
    per_doc = inst.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"), F.sum("logp_micro").alias("__s")
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(
                F.exp(-(F.col("__s") / 1000000.0) / F.col("n_grams")), 6
            ).alias("ppl"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """CCNet's head/middle/tail corpus partition (Wenzek et al. 2020
    §4.3): rank documents by perplexity ascending and cut the corpus
    into thirds — 'head' reads most like the trusted training corpus
    and is sampled preferentially downstream.

    Bucket arithmetic is exact and engine-portable: with ``pos`` the
    0-based global rank in (ppl_micro, id) order and ``n`` the scored
    count, bucket = floor(3*pos/n) — the single-window SQL restatement
    an oracle runs; here the rank comes from ``packing.global_rank``
    (two-phase range-bucket cumsum, no single-partition sort) and ``n``
    from a 1-row broadcast.  Perplexity is compared in integer
    micro-units so the order is total and byte-stable.  Documents with
    no score (under 2 tokens) are excluded — they have no perplexity to
    rank by.

    Output: (id, n_grams, ppl, ppl_bucket in {'head','middle','tail'}).
    """
    from tripwire_spark.operators.packing import global_rank

    scored = (
        lm_perplexity(docs, model, id_col=id_col, text_col=text_col, buckets=buckets)
        .filter(F.col("ppl").isNotNull())
        .withColumn("__pplu", F.round(F.col("ppl") * 1000000.0, 0).cast("long"))
        # scored feeds global_rank's min/max agg, its rank window, AND
        # the n-count — checkpoint so the LM scoring subtree (gram
        # explode + model joins + per-doc sum) runs exactly once
        .localCheckpoint(eager=True)
    )
    ranked = global_rank(scored, "__pplu", tiebreak=(id_col,), pos_col="__pos")
    n = scored.agg(F.count(F.lit(1)).alias("__n"))
    # integer division end-to-end (matches the oracle's // exactly; a
    # double quotient could in principle round across a bucket boundary)
    b = F.expr("__pos * 3 div __n")
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            id_col,
            "n_grams",
            "ppl",
            F.when(b == 0, F.lit("head"))
            .when(b == 1, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )
