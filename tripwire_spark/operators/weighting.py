"""Corpus weighting for training-data pipelines: tf-idf keyword
extraction, temperature-scaled domain mixing weights, and DSIR-style
hashed n-gram importance scores.

These are the selection/weighting operators a 100 TB pretraining
pipeline runs after cleaning (textstats) and dedup (dedup/clustering):
which terms characterize a document, how much of each domain to sample,
and how target-like each document is.  Everything is pure DataFrame
algebra over the same whitespace tokenization the rest of the text
stack uses (textstats.tokens), with deterministic md5-derived feature
hashing (packing.md5_bucket) so every score has an exact ANSI-SQL
oracle twin and is byte-stable across engines and cluster sizes.

Scale shapes (the part that matters at 100 TB):

- tf-idf: per-(doc, term) counts carry the in-row document length
  through the explode, so document stats cost NO extra shuffle; the
  term-document-frequency aggregation is the classic Zipf-skew point,
  handled by map-side partial aggregation (one row per term per
  partition enters the exchange, so "the" costs one long per partition,
  not one row per occurrence).
- domain mixture: one partial-agg groupBy over the corpus; the
  normalization constant is a 1-row broadcast, never a driver collect.
- DSIR: the feature space is CLOSED (``buckets`` rows, default 4096)
  no matter how large the corpus — bucket statistics are a partial-agg
  groupBy down to ``buckets`` rows, then a broadcast join back onto the
  gram stream.  The corpus-side join input stays (doc_id, bucket):
  text never enters a shuffle.

Reference analog: the crawler scores and ranks pages/links by keyword
tables (pagefinder/expressions.js weights); these operators are the
corpus-curation generalization of that scoring family (Xie et al. 2023
DSIR; Rae et al. 2021 domain mixing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tripwire_spark.operators.packing import md5_bucket
from tripwire_spark.operators.textstats import tokens


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, doc_len) — one row per token instance; doc_len rides
    along from the pre-explode projection (no second pass / shuffle)."""
    toks = tokens(F.col(text_col))
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("doc_len"),
            F.explode("__toks").alias("term"),
        )
        .filter(F.col("term") != "")
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf.

    tf = in-document count / document length; idf = ln((N+1)/(df+1))+1
    (smoothed, rounded to 6 dp so both engines rank on identical
    doubles); ties broken by term ascending.  Output: (id, rnk, term,
    n, tfidf).

    Plan: explode -> partial-agg groupBy(id, term) -> term-df groupBy
    (partial-agg absorbs Zipf skew) -> join stats -> per-doc top-k
    window.  N is a 1-row broadcast, not a driver action.
    """
    terms = _doc_terms(docs, id_col, text_col)
    per_doc = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("n"), F.first("doc_len").alias("doc_len")
    )
    df_stats = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_corpus"))
    idf = df_stats.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.round(
            F.log((F.col("n_corpus") + 1).cast("double") / (F.col("df") + 1)) + 1.0, 6
        ).alias("idf"),
    )
    scored = per_doc.join(idf, "term").select(
        F.col(id_col),
        "term",
        "n",
        (F.col("n").cast("double") / F.col("doc_len") * F.col("idf")).alias("__score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "term", "n", F.round("__score", 6).alias("tfidf"))
    )


def domain_mixture(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain mixing weights.

    weight(g) = tokens(g)^alpha / sum_h tokens(h)^alpha — alpha=1 is
    proportional sampling, alpha=0 uniform; 0<alpha<1 upsamples small
    domains the standard way (multilingual/domain temperature
    sampling).  Output: (group, n_docs, n_tokens, weight) — one row per
    domain, the table a sampler (stratified_sample) consumes.

    One partial-agg groupBy over the corpus (token counts are computed
    in-row, text never shuffles); the normalizer is a 1-row broadcast.
    """
    per = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.filter(tokens(F.col(text_col)), lambda t: t != ""))
        ).cast("long").alias("n_tokens"),
    )
    # Micro-unit determinism: a float SUM's accumulation order is
    # engine- and partitioning-dependent, so the normalizer is summed
    # as exact integer micro-units (6-dp-rounded weight x 1e6) — the
    # oracle twin and any cluster size produce identical bytes.
    raw = per.withColumn(
        "__raw6", F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)), 6)
    )
    tot = raw.select(
        F.sum(F.round(F.col("__raw6") * 1000000.0, 0).cast("long")).alias("__tot_micro")
    )
    return raw.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("__raw6") * 1000000.0 / F.col("__tot_micro"), 6).alias("weight"),
    )


def _doc_gram_buckets(
    docs: DataFrame, id_col: str, text_col: str, buckets: int, *carry: str
) -> DataFrame:
    """(id, *carry, bucket) per word-bigram instance, via the
    engine-portable md5 bucket — the doc side of every DSIR join ships
    a few longs; ``carry`` columns ride through the explode so no join
    back to the document table is ever needed."""
    from tripwire_spark.operators.dedup import word_ngrams

    # zip-shifted bigrams (see word_ngrams: transform-over-index with a
    # captured outer array re-evaluates the capture per element)
    toks = tokens(F.col(text_col))
    grams = word_ngrams(toks, 2)
    return docs.select(F.col(id_col), *carry, F.explode(grams).alias("gram")).select(
        id_col, *carry, md5_bucket("gram", buckets).alias("bucket")
    )


def dsir_importance(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance score: how target-like is each document.

    Features are word bigrams hashed into a CLOSED space of ``buckets``
    md5 buckets (Xie et al. 2023 use 10k hashed n-gram buckets); the
    per-bucket model is add-one-smoothed bag-of-buckets likelihood for
    the ``target`` slice vs the rest, and a document's score is the
    mean per-gram log-likelihood ratio

        score(d) = (1/|grams(d)|) * sum_g [ln p_target(b(g)) - ln p_rest(b(g))]

    rounded to 6 dp per bucket so cross-engine doubles agree.  Output:
    (id, n_grams, dsir_score); gramless docs score 0.0.  Positive score
    = looks like the target slice; downstream sampling keeps documents
    with probability proportional to exp(score) (here: the score table
    itself, so the policy stays a separate, testable choice).

    Plan shape: the bucket model is a partial-agg groupBy down to
    <= ``buckets`` rows + a 1-row totals broadcast; scoring joins the
    (id, bucket) gram stream against the broadcast model — text never
    enters a shuffle, and the only wide exchange is the final
    per-document sum keyed by id.
    """
    flagged = docs.select(F.col(id_col), F.col(text_col), target.cast("int").alias("__t"))
    gb = _doc_gram_buckets(flagged, id_col, text_col, buckets, "__t")
    stats = gb.groupBy("bucket").agg(
        F.sum("__t").cast("long").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("__t")).cast("long").alias("n_r"),
    )
    totals = stats.select(
        F.sum("n_t").alias("tot_t"), F.sum("n_r").alias("tot_r")
    )
    # llr in integer micro-units (1e-6): per-doc SUMs of doubles are
    # accumulation-order-dependent across engines and partitionings;
    # integer sums are exact, so scores are byte-stable everywhere.
    model = stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            (
                F.log((F.col("n_t") + 1).cast("double") / (F.col("tot_t") + buckets))
                - F.log((F.col("n_r") + 1).cast("double") / (F.col("tot_r") + buckets))
            )
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("llr_micro"),
    )
    per_doc = (
        gb.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("llr_micro").alias("__s"))
        .select(
            id_col,
            "n_grams",
            F.round(F.col("__s") / 1000000.0 / F.col("n_grams"), 6).alias("dsir_score"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("dsir_score", F.lit(0.0)).alias("dsir_score"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    budget_frac: float = 0.3,
) -> DataFrame:
    """Materialize a mixed corpus: temperature weights -> per-domain
    keep fractions -> deterministic md5 sampling, in one composition.

    Domain g's fraction is min(1, budget_frac * weight(g) * N / n_g) —
    the sample targets ``budget_frac`` of the corpus distributed by the
    temperature weights, clamped when a small domain cannot supply its
    share.  The keep decision is the same md5 projection
    ``stratified_sample`` uses, so re-runs at any cluster size emit the
    byte-identical corpus.  The weights table is a <=|domains|-row
    broadcast; the corpus side stays a scan + filter (no shuffle of
    docs at all).
    """
    mix = domain_mixture(docs, group_col, text_col, alpha)
    # N = sum of the per-domain doc counts the mixture already carries —
    # never a third scan of the corpus just to count rows
    n1 = mix.select(F.sum("n_docs").alias("__n"))
    frac = mix.crossJoin(F.broadcast(n1)).select(
        group_col,
        F.least(
            F.lit(1.0),
            F.lit(budget_frac) * F.col("weight") * F.col("__n") / F.col("n_docs"),
        ).alias("__frac"),
    )
    # explicit floor: DuckDB's double->bigint CAST rounds while Spark's
    # truncates — floor() first makes the threshold engine-identical
    return (
        docs.join(F.broadcast(frac), group_col)
        .filter(md5_bucket(id_col) < F.floor(F.col("__frac") * 10000))
        .drop("__frac")
    )


def vocab_induce(
    docs: DataFrame,
    text_col: str = "text",
    size: int = 1000,
    min_count: int = 2,
) -> DataFrame:
    """Frequency-induced vocabulary: the top-``size`` whitespace tokens
    by corpus count (ties broken by token ascending), ids assigned in
    rank order — the deterministic seed vocabulary a tokenizer trainer
    (BPE/unigram) starts from, and the lookup table OOV-rate reports
    are computed against.

    Output: (token_id, token, n) with token_id = 1..size.

    Plan: explode -> ONE partial-agg groupBy(token) (Zipf skew absorbed
    map-side: "the" enters the exchange once per partition) -> global
    top-``size`` via orderBy().limit() — Catalyst compiles that to
    TakeOrderedAndProject (each partition keeps its local top-``size``,
    the driver merges), so the web-scale distinct-token table (typos,
    URLs — billions of rows at 100 TB) is never globally sorted and
    never funnels through one partition.  Only the ``size`` survivors
    enter the id-assignment window.
    """
    counts = (
        _doc_terms(docs.select(F.lit(1).alias("__one"), text_col), "__one", text_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    top = counts.orderBy(F.col("n").desc(), F.col("term")).limit(size)
    w = Window.orderBy(F.col("n").desc(), F.col("term"))  # over <= size rows
    return top.select(
        F.row_number().over(w).alias("token_id"), F.col("term").alias("token"), "n"
    )
