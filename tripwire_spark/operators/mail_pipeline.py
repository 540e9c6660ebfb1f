"""Confirmation-mail dataflow (SURVEY.md §3.3): parse -> subject filter
-> URL extraction -> scoring -> repeat-bonus dedup -> top-1 per mail.

Spark shape: ``emails -> pandas UDF (decode/extract) -> explode urls ->
pure-column scoring (C11) -> groupBy repeat combine (D1) -> ranking
window top-1 (W5) -> optional visibility gate (F7/T3)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tripwire_spark.functions.mail import decode_subject, extract_urls, parse_message_once
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
    return top_url(subj_ok, id_col, body_col)


def top_url(
    emails: DataFrame,
    id_col: str = "umid",
    body_col: str = "body",
    carry: list[str] | None = None,
) -> DataFrame:
    """C10 extract -> C11 score -> D1 repeat combine -> W5 top-1, from
    an already-subject-filtered frame.

    ``carry``: per-mail metadata columns threaded through the explode /
    group / rank pipeline (they are functionally dependent on the id, so
    ``first()`` inside the combine is exact).  Carrying them here is
    what keeps ``accept_mail`` at ONE parse per message — the
    alternative join back to the parsed frame would put the parse UDF on
    both sides of the join."""
    carry = carry or []
    urls = emails.select(
        F.col(id_col), *carry, F.explode(extract_urls(body_col)).alias("u")
    ).select(
        id_col,
        *carry,
        F.col("u.url").alias("url"),
        F.col("u.domain").alias("domain"),
        F.col("u.path").alias("path"),
        F.col("u.pos").alias("pos"),
    )
    scored = urls.withColumn("w0", email_url_weight(F.col("domain"), F.col("path")))
    combined = scored.groupBy(id_col, "url").agg(
        (F.min_by("w0", "pos") + REPEAT_BONUS * (F.count("*") - 1)).alias("weight"),
        F.min("pos").alias("first_pos"),
        *[F.first(c).alias(c) for c in carry],
    )
    w = Window.partitionBy(id_col).orderBy(F.col("weight").desc(), F.col("first_pos"))
    return (
        combined.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("weight") >= 0))
        .select(id_col, *carry, "url", F.col("weight").cast("double").alias("weight"))
    )


def accept_mail(raw_messages: DataFrame, id_col: str = "umid", raw_col: str = "raw") -> DataFrame:
    """The full accept_mail dataflow over RAW RFC-822 bytes
    (handle_email.py:496-573): ONE parse per message (C14 to-address +
    C12 subject + C13 payload selection), subject interestingness gate
    (F9), then C10 extraction + C11 scoring + D1 repeat combine + W5
    top-1 over the SELECTED payload — the composition the reference
    actually runs, not pre-split columns.

    Returns (id, to_addr, subject_decoded, url, weight): one row per
    interesting mail with a non-negative best URL.
    """
    parsed = raw_messages.select(
        F.col(id_col), parse_message_once(F.col(raw_col)).alias("m")
    ).select(
        id_col,
        F.col("m.to_addr").alias("to_addr"),
        decode_subject(F.col("m.subject_raw")).alias("subject_decoded"),
        F.col("m.payload").alias("body"),
    )
    interesting = parsed.filter(subject_interesting(F.col("subject_decoded")))
    # to_addr/subject ride THROUGH the url pipeline (no join back to
    # `interesting`), so the physical plan parses each raw message once.
    best = top_url(interesting, id_col, "body", carry=["to_addr", "subject_decoded"])
    return best.select(id_col, "to_addr", "subject_decoded", "url", "weight")
