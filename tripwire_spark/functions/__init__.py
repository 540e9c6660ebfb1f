"""Column-level building blocks (scalar function layer, SURVEY.md §2.8)."""

from tripwire_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    canonicalize_url_py,
    reg_domain,
    reg_domain_py,
    url_hash,
)
