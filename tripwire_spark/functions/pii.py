"""PII redaction for web-text corpora: emails, phone numbers, IPv4.

Pure ``regexp_replace`` column expressions — JVM-side, codegen'd, zero
Python in the row path, so the redaction pass rides the same scan that
computes quality features (textstats.py) and costs no extra shuffle.

The patterns deliberately stay inside the regex subset that Java
(Spark) and RE2 (DuckDB/Go scrubbers) treat identically — no
backrefs, no lookaround — so the oracle twin and any downstream
re-validation scrubber reproduce byte-identical output.  This mirrors
how production pipelines (e.g. BigScience ROOTS, RefinedWeb) run PII
scrubbing: conservative patterns, tag-style replacement tokens that
tokenizers can learn to ignore.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

EMAIL_TAG = "<EMAIL>"
IP_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence counts per PII class (before redaction)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
    }


def redact_pii(text: Column) -> Column:
    """Replace every email / IPv4 / phone occurrence with its tag.

    Email runs FIRST: an address's domain can contain digit runs that
    the IP pattern would otherwise split (user@1.2.3.4.host.test), and
    a redacted <EMAIL> token can no longer half-match as a phone.
    """
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TAG)
    out = F.regexp_replace(out, IPV4_RE, IP_TAG)
    return F.regexp_replace(out, PHONE_RE, PHONE_TAG)
