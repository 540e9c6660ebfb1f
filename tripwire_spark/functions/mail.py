"""Confirmation-mail parsing UDFs (SURVEY.md §2.8 C10, C12-C14).

Reference parity (mail/mailhandler/handle_email.py):
- C10 URL extraction: the exact ``URL_PATTERN`` with its negative
  lookbehinds (``:148-150``) — lookbehind is unsupported by
  regexp_extract_all's RE2-style engines, so this stays a Python ``re``
  inside a vectorized pandas UDF; group 3 = url, 4 = domain, 5 = path,
  exactly as consumed at ``:373-388``.
- C12 subject decode: RFC-2047 via ``email.header`` with utf-8
  fallback (``:133-144``).
- C13 payload selection: prefer text/plain (w=1) over text/html (w=5),
  recursing into multiparts taking the min weight (``:303-327``).
- C14 to-address: to -> x-original-to -> delivered-to precedence with
  "undisclosed recipients" skip and ``Name <a@b>`` unwrap
  (``:47,110-130``).
"""

from __future__ import annotations

import email
import email.header
import email.parser
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# handle_email.py:148-150, applied with re.IGNORECASE (":373").
URL_PATTERN = re.compile(
    r"(?<!(src)=(\"|'))(https?://([a-z0-9.-]+)/"
    r"([a-z0-9./?!@#$%^&*_=+-;:]+)(?<!\.(gif|jpg|png)))"
    r"(\s|$|\"|'|<)",
    flags=re.IGNORECASE,
)

ADDRESS_PATTERN = re.compile(r".*<(.*@.*)>$")  # handle_email.py:47

URLS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("domain", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


def extract_urls_py(body: str | None) -> list[dict]:
    if body is None:
        return []
    out = []
    for i, m in enumerate(URL_PATTERN.findall(body)):
        out.append({"url": m[2], "domain": m[3], "path": m[4], "pos": i})
    return out


def decode_subject_py(subject: str | None) -> str | None:
    """RFC-2047 decode with utf-8 fallback (handle_email.py:133-144)."""
    if subject is None:
        return None
    try:
        parts = email.header.decode_header(subject)
    except email.header.HeaderParseError:
        parts = [(subject, "utf-8")]
    decoded = []
    for text, enc in parts:
        if isinstance(text, bytes):
            try:
                decoded.append(text.decode(enc or "utf-8", errors="replace"))
            except LookupError:
                decoded.append(text.decode("utf-8", errors="replace"))
        else:
            decoded.append(text)
    return "".join(decoded)


def _to_from_msg(msg) -> str | None:
    """C14 precedence over a parsed message (handle_email.py:110-130)."""
    if "to" in msg and "undisclosed recipients" not in msg["to"].lower():
        to_addr = msg["to"]
    elif "x-original-to" in msg:
        to_addr = msg["x-original-to"]
    elif "delivered-to" in msg:
        to_addr = msg["delivered-to"]
    else:
        return None
    m = ADDRESS_PATTERN.match(to_addr)
    return m.group(1) if m else to_addr


def extract_to_py(raw_headers: str | None) -> str | None:
    """C14 precedence over a raw RFC-822 header block."""
    if raw_headers is None:
        return None
    return _to_from_msg(email.parser.Parser().parsestr(raw_headers, headersonly=True))


def _payload_of(msg) -> tuple[int, str]:
    """C13 walk over a parsed message (handle_email.py:303-327)."""

    def walk(m) -> tuple[int, str]:
        ct = m.get_content_type()
        if ct == "text/plain":
            p = m.get_payload(decode=True)
            return (1, p.decode("utf-8", errors="replace") if isinstance(p, bytes) else str(p))
        if ct == "text/html":
            p = m.get_payload(decode=True)
            return (5, p.decode("utf-8", errors="replace") if isinstance(p, bytes) else str(p))
        if m.is_multipart():
            best = (100, "")
            for part in m.get_payload():
                w, p = walk(part)
                if w < best[0]:
                    best = (w, p)
            return best
        return (100, "")

    return walk(msg)


def payload_weight_py(raw_message: str | None) -> tuple[int, str]:
    """C13: (weight, payload) with multipart min-weight recursion."""
    if raw_message is None:
        return (100, "")
    return _payload_of(email.parser.Parser().parsestr(raw_message))


MESSAGE_TYPE = T.StructType(
    [
        T.StructField("to_addr", T.StringType()),
        T.StructField("subject_raw", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("payload_weight", T.IntegerType()),
    ]
)


def parse_message_py(raw_message: str | None) -> dict:
    """ONE parse of a raw RFC-822 message -> to-address precedence
    (C14), raw subject header (for C12 decode), and the selected
    payload + its weight (C13) — the accept_mail front half
    (handle_email.py:496-573) without re-reading the bytes per stage."""
    if raw_message is None:
        return {"to_addr": None, "subject_raw": None, "payload": None, "payload_weight": 100}
    msg = email.parser.Parser().parsestr(raw_message)
    w, p = _payload_of(msg)
    return {
        "to_addr": _to_from_msg(msg),
        "subject_raw": msg.get("subject"),
        "payload": p,
        "payload_weight": w,
    }


@F.pandas_udf(URLS_TYPE)
def extract_urls(body: pd.Series) -> pd.Series:
    return body.map(extract_urls_py)


@F.pandas_udf(T.StringType())
def decode_subject(subject: pd.Series) -> pd.Series:
    return subject.map(decode_subject_py)


@F.pandas_udf(T.StringType())
def extract_to(raw_headers: pd.Series) -> pd.Series:
    return raw_headers.map(extract_to_py)


@F.pandas_udf(T.StringType())
def select_payload(raw_message: pd.Series) -> pd.Series:
    return raw_message.map(lambda r: payload_weight_py(r)[1])


@F.pandas_udf(MESSAGE_TYPE)
def parse_message(raw_message: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(list(raw_message.map(parse_message_py)))


# Evaluate-once variant for pipelines that FILTER on a column derived
# from the parsed struct (accept_mail's subject gate): Catalyst's
# predicate-pushdown-through-project substitutes the filter's column
# references with their defining expressions, which would clone the
# parse UDF below the projection and parse every message twice.  The
# nondeterministic marking (the parse IS deterministic; the flag is an
# optimizer fence, a standard Spark idiom) pins exactly one evaluation.
parse_message_once = parse_message.asNondeterministic()
