"""Hashed n-gram log-odds quality classifier (fastText / CCNet-style).

The standard webtext quality gate (CCNet, GPT-3's reported filtering,
RefinedWeb's fastText stage) is a LINEAR model over hashed bag-of-words
features: cheap enough to score every document of a 100 TB crawl, and
trainable from label proxies the pipeline already has (reference-corpus
membership, language, upstream heuristic gates).  This module is that
model, Spark-shaped and engine-deterministic:

- ``train_log_odds``: Naive-Bayes log-odds per hashed feature bucket,
  Laplace-smoothed — the closed-form linear classifier, trained in ONE
  partial-agg groupBy over the token stream (no gradient loop: a 100 TB
  training pass is a single shuffle of at most ``buckets`` rows per
  partition, Zipf skew absorbed map-side).
- ``classifier_score``: per-document mean log-odds via a broadcast join
  of the (closed, <= ``buckets``-row) weight table onto the token
  stream, then one partial-agg groupBy(doc).  Text never enters a
  shuffle; the exchanged rows are (id, int) partials.
- ``classifier_score_map``: ZERO-shuffle inference — the weight table
  folded into an array literal, scoring as a pure projection
  (aggregate over the in-row token array).  The shape for "score while
  scanning": survives any corpus size because nothing leaves the scan
  stage; weights must fit a plan literal (buckets <= ~64k), which the
  hashing trick guarantees by construction.

Determinism discipline (same as weighting.py): feature hashing is
md5-derived (packing.md5_bucket), weights are 6-dp integer micro-units,
per-doc sums are integer — so scores are byte-stable across engines,
partitionings, and cluster sizes, and every operator has an exact
ANSI-SQL oracle twin.

Reference analog: the crawler's keyword-weight page/link scoring
(pagefinder/expressions.js) is a hand-written linear text classifier;
this is the trained generalization the LLM-curation tier needs
(SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripwire_spark.operators.packing import md5_bucket
from tripwire_spark.operators.textstats import tokens

MICRO = 1_000_000


def _token_stream(docs: DataFrame, cols: list, text_col: str) -> DataFrame:
    """(*cols, tok) — one row per token instance, empties dropped."""
    return docs.select(
        *cols, F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")


def train_log_odds(
    docs: DataFrame,
    label_col,
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Train: bucket -> Laplace-smoothed log-odds weight, 6-dp micro-units.

    ``label_col`` is a boolean column (or name): True = positive class.
    w(b) = ln((pos_b+1)/(pos_tot+B)) - ln((neg_b+1)/(neg_tot+B)),
    returned as (bucket, pos_n, neg_n, w6) with w6 = round(w * 1e6).

    Plan: explode -> md5 bucket -> ONE groupBy(bucket) with map-side
    partials (the exchange carries <= buckets rows per partition no
    matter the corpus size); class totals are a 1-row broadcast.
    """
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast("boolean")
    ex = _token_stream(docs, [y.alias("__y")], text_col)
    per = ex.select("__y", md5_bucket(F.col("tok"), buckets).alias("bucket")).groupBy(
        "bucket"
    ).agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("pos_n"),
        F.sum(F.when(~F.col("__y"), 1).otherwise(0)).alias("neg_n"),
    )
    tot = per.agg(
        F.sum("pos_n").alias("__pt"), F.sum("neg_n").alias("__nt")
    )
    lr = F.log((F.col("pos_n") + 1).cast("double") / (F.col("__pt") + buckets)) - F.log(
        (F.col("neg_n") + 1).cast("double") / (F.col("__nt") + buckets)
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "pos_n",
        "neg_n",
        F.round(lr * MICRO, 0).cast("bigint").alias("w6"),
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    carry: list[str] | None = None,
) -> DataFrame:
    """Score every document: mean per-token log-odds + thresholded label.

    Output: (id, *carry, n_toks, quality_score, keep) with
    quality_score = round(sum w6 / 1e6 / n_toks, 6) and keep = total
    log-odds > 0.  Unseen buckets contribute 0 (left join); empty
    documents score 0.0 / keep=False.

    Plan: the weight table is a closed <= ``buckets``-row broadcast;
    the only shuffle over corpus-derived data carries (id, int)
    partial sums — text stays in the scan stage.
    """
    ex = _token_stream(docs, [id_col], text_col).select(
        id_col, md5_bucket(F.col("tok"), buckets).alias("bucket")
    )
    per_doc = (
        ex.join(F.broadcast(weights.select("bucket", "w6")), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("w6", F.lit(0))).alias("__s6"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    keep_cols = [id_col] + list(carry or [])
    return docs.select(*keep_cols).join(per_doc, id_col, "left").select(
        *keep_cols,
        F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
        F.coalesce(
            F.round(F.col("__s6") / MICRO / F.col("n_toks"), 6), F.lit(0.0)
        ).alias("quality_score"),
        (F.coalesce("__s6", F.lit(0)) > 0).alias("keep"),
    )


def collect_weights(weights: DataFrame, buckets: int) -> list[int]:
    """Densify a ``train_log_odds`` table into the length-``buckets``
    array ``classifier_score_map`` needs.  train_log_odds only emits
    rows for buckets SEEN in training, so a naive collect yields a
    short array — and a short array silently changes the hash modulus,
    scoring every token with a scrambled weight.  Unseen buckets get
    weight 0 (same contract as classifier_score's left join)."""
    w6 = [0] * buckets
    for r in weights.select("bucket", "w6").collect():  # <= buckets rows
        if not 0 <= r.bucket < buckets:
            raise ValueError(f"bucket {r.bucket} outside [0, {buckets})")
        w6[r.bucket] = r.w6
    return w6


def classifier_score_map(
    docs: DataFrame,
    w6_by_bucket: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zero-shuffle inference: weights as a plan-literal array, the
    score an ``aggregate`` over the in-row token array — a pure
    projection that rides the scan (same output contract as
    ``classifier_score``).  ``len(w6_by_bucket)`` IS the hash modulus,
    so it must equal the ``buckets`` the model was trained with — build
    the array with ``collect_weights(train_log_odds(...), buckets)``,
    never by collecting the (sparse) weights table directly."""
    buckets = len(w6_by_bucket)
    arr = F.lit(w6_by_bucket)
    toks = F.filter(tokens(F.col(text_col)), lambda x: x != "")
    s6 = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(arr, (md5_bucket(t, buckets) + 1).cast("int")),
    )
    n = F.size(toks)
    return docs.select(
        id_col,
        n.cast("long").alias("n_toks"),
        F.when(n > 0, F.round(s6 / MICRO / n, 6)).otherwise(F.lit(0.0)).alias(
            "quality_score"
        ),
        F.when(n > 0, s6 > 0).otherwise(F.lit(False)).alias("keep"),
    )
