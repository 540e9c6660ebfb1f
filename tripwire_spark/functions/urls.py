"""RFC-3986 URL canonicalization, registrable-domain (PSL) extraction,
and URL hashing.

Reference parity:
- ``norm_url`` C UDF (reference: schema.sql:902-907) — RFC-3986
  canonicalization; the hash key of the URL-seen set.
- ``url_host/scheme/path/port`` extractors (schema.sql:982-1032) — we use
  Spark's built-in ``parse_url`` where exact, and the canonicalizer's
  parse otherwise.
- ``norm_dns_name``/``dns_name_valid`` (schema.sql:893-898, 27-32).
- ``dns_pub_suffix``/``dns_reg_domain`` (schema.sql:296-319) — politeness
  grouping key; here a deterministic PSL-snapshot-lite (public-suffix
  semantics; extendable to the full list via a broadcast snapshot).

Design: the canonicalizer is a **vectorized pandas UDF** (Arrow batches,
no per-row Python UDF serde).  The hash is JVM-side ``xxhash64`` on the
canonical string, so the seen-set key never round-trips through Python.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- pure-python core (unit-testable without Spark) ---------------------

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}

# RFC 3986 unreserved = ALPHA / DIGIT / "-" / "." / "_" / "~"
_SUB_DELIMS = "!$&'()*+,;="
_PATH_SAFE = _SUB_DELIMS + ":@/"
_QUERY_SAFE = _SUB_DELIMS + ":@/?"

_HOST_RE = re.compile(r"^[a-z0-9]([a-z0-9\-_]{0,61}[a-z0-9])?(\.[a-z0-9]([a-z0-9\-_]{0,61}[a-z0-9])?)*\.?$")

# PSL snapshot (public-suffix semantics, deterministic subset: common ICANN
# suffixes + the reserved .test/.example/.invalid/.localhost TLDs used by
# fixtures).  Two-label suffixes checked before one-label.
_PSL_2 = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "co.in", "net.in", "org.in", "gen.in", "firm.in",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "co.nz", "net.nz", "org.nz",
        "co.za", "net.za", "org.za", "web.za",
        "com.mx", "org.mx", "net.mx",
        "com.ar", "com.tr", "com.tw", "com.sg", "com.hk", "com.my",
        "co.kr", "or.kr", "co.th", "co.id",
    }
)
_PSL_1 = frozenset(
    {
        "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
        "name", "pro", "mobi", "app", "dev", "io", "ai", "co", "me",
        "tv", "cc", "us", "uk", "de", "fr", "it", "es", "nl", "pl",
        "ru", "jp", "cn", "in", "br", "au", "ca", "ch", "se", "no",
        "fi", "dk", "be", "at", "cz", "pt", "gr", "hu", "ro", "ie",
        "kr", "tw", "hk", "sg", "my", "th", "id", "mx", "ar", "cl",
        "za", "tr", "ua", "il", "nz", "xyz", "site", "online", "top",
        "club", "test", "example", "invalid", "localhost",
    }
)


def _pct_normalize(s: str, safe: str) -> str:
    """Percent-normalize: decode unreserved chars, uppercase remaining
    escapes, re-encode anything that must be escaped (RFC 3986 §6.2.2)."""
    try:
        return quote(unquote(s), safe=safe)
    except Exception:  # malformed escapes: keep as-is
        return s


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # collapse the leading marker: path always starts with "/"
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    # trailing "." / ".." leave a trailing slash per the RFC algorithm
    if path.endswith(("/.", "/..")) and not res.endswith("/"):
        res += "/"
    return res


def canonicalize_url_py(url: str | None) -> str | None:
    """RFC-3986-canonicalize one URL; None if unparseable/invalid.

    Rules (norm_url parity, schema.sql:902-907):
    scheme+host lowercased; default port stripped; percent-encoding
    normalized (decode unreserved, uppercase hex); dot-segments removed;
    empty path -> "/"; fragment dropped; query preserved byte-for-byte
    order; scheme-less input gets "http://" (reference queues bare
    domains, runners/queue_sites:101-109).
    """
    if url is None:
        return None
    u = url.strip()
    if not u:
        return None
    if "://" not in u:
        u = "http://" + u
    try:
        parts = urlsplit(u)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    if not host or not _HOST_RE.match(host):
        return None
    port = None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if parts.username:
        netloc = parts.username + (":" + parts.password if parts.password else "") + "@" + netloc
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc += f":{port}"
    path = _pct_normalize(parts.path or "/", _PATH_SAFE)
    path = _remove_dot_segments(path if path.startswith("/") else "/" + path)
    out = f"{scheme}://{netloc}{path}"
    if parts.query:
        out += "?" + _pct_normalize(parts.query, _QUERY_SAFE)
    return out  # fragment intentionally dropped


def reg_domain_py(host: str | None) -> str | None:
    """Registrable domain = public suffix + one label (dns_reg_domain,
    schema.sql:305-310).  The politeness grouping key."""
    if not host:
        return None
    h = host.lower().rstrip(".")
    labels = h.split(".")
    if len(labels) < 2:
        return h
    if len(labels) >= 3 and ".".join(labels[-2:]) in _PSL_2:
        return ".".join(labels[-3:])
    # one-label suffix (listed or unknown TLD treated as a suffix)
    return ".".join(labels[-2:])


def host_of_py(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        return (urlsplit(url if "://" in url else "http://" + url).hostname or "").lower() or None
    except ValueError:
        return None


# --- Spark column API ----------------------------------------------------


@F.pandas_udf(T.StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """Vectorized RFC-3986 canonicalizer (Arrow-batched)."""
    return urls.map(canonicalize_url_py)


@F.pandas_udf(T.StringType())
def reg_domain(hosts: pd.Series) -> pd.Series:
    """Vectorized registrable-domain extraction (politeness key)."""
    return hosts.map(reg_domain_py)


@F.pandas_udf(T.StringType())
def resolve_canonicalize(base: pd.Series, href: pd.Series) -> pd.Series:
    """Resolve a (possibly relative) href against its page URL, then
    canonicalize (RFC 3986 §5 reference resolution)."""
    from urllib.parse import urljoin

    def one(b, h):
        if h is None:
            return None
        try:
            absolute = urljoin(b, h) if b else h
        except ValueError:
            return None
        return canonicalize_url_py(absolute)

    return pd.Series([one(b, h) for b, h in zip(base, href)])


def url_hash(col: Column | str) -> Column:
    """Seen-set key: JVM-side xxhash64 of the canonical URL (no Python)."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)


def url_host(col: Column | str) -> Column:
    """Built-in host extractor (url_host parity, schema.sql:982-1032)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.parse_url(c, F.lit("HOST")))


def url_path(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_url(c, F.lit("PATH"))


def url_scheme(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))


def url_query(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_url(c, F.lit("QUERY"))
