"""Confirmation-mail dataflow (SURVEY.md §3.3): parse -> subject filter
-> URL extraction -> scoring -> repeat-bonus dedup -> top-1 per mail.

Spark shape: ``emails -> pandas UDF (decode/extract) -> explode urls ->
pure-column scoring (C11) -> groupBy repeat combine (D1) -> ranking
window top-1 (W5) -> optional visibility gate (F7/T3)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tripwire_spark.functions.mail import decode_subject, extract_urls
from tripwire_spark.functions.scoring import (
    REPEAT_BONUS,
    email_url_weight,
    subject_interesting,
)


def visible(emails: DataFrame, now: Column) -> DataFrame:
    """F7/T3: ignore_until <= now AND NOT disabled
    (handle_email.py:676-688; schema.sql:2216)."""
    out = emails.filter(F.col("ignore_until") <= now)
    if "disabled" in emails.columns:
        out = out.filter(~F.col("disabled"))
    return out


def best_confirmation_urls(emails: DataFrame, id_col: str = "umid", body_col: str = "body") -> DataFrame:
    """Per mail: the clicked URL = highest-weight candidate, weight >= 0
    (handle_email.py:366-371,423,559-569).

    Repeat semantics (D1, handle_email.py:413-420): a repeated URL adds
    +REPEAT_BONUS to the FIRST occurrence's weight instead of a new
    candidate.  Sort is weight desc with ties broken by first
    occurrence order (Python 2's stable sort on insertion order).
    """
    subj_ok = emails.withColumn("subject_decoded", decode_subject("subject")).filter(
        subject_interesting(F.col("subject_decoded"))
    )
    urls = subj_ok.select(
        F.col(id_col), F.explode(extract_urls(body_col)).alias("u")
    ).select(
        id_col,
        F.col("u.url").alias("url"),
        F.col("u.domain").alias("domain"),
        F.col("u.path").alias("path"),
        F.col("u.pos").alias("pos"),
    )
    scored = urls.withColumn("w0", email_url_weight(F.col("domain"), F.col("path")))
    combined = scored.groupBy(id_col, "url").agg(
        (F.min_by("w0", "pos") + REPEAT_BONUS * (F.count("*") - 1)).alias("weight"),
        F.min("pos").alias("first_pos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("weight").desc(), F.col("first_pos"))
    return (
        combined.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("weight") >= 0))
        .select(id_col, "url", F.col("weight").cast("double").alias("weight"))
    )
