"""Boilerplate removal: block-level main-content extraction.

Webtext pipelines don't train on nav bars, footers, and link farms —
the standard cure (jusText, Readability, trafilatura; Kohlschütter et
al. 2010 "Boilerplate Detection using Shallow Text Features") segments
a page into BLOCKS at block-level tag boundaries and classifies each
block by two shallow features that need no model:

- length: boilerplate blocks are short ("Home", "© 2026 ...");
- link density: chars inside <a> / total chars — navigation is ~1.0,
  prose ~0.

This module is the deterministic core of that family:

- ``extract_blocks``: Arrow-batched pandas UDF, html -> array of
  (text, n_chars, link_chars) structs in document order, one stdlib
  HTMLParser walk per page (script/style/head/noscript/template
  invisible, same visibility rules as functions.html).
- ``main_content``: the curation operator — block classification and
  reassembly are JVM-side array exprs over the UDF's output
  (``F.filter``/``transform``/``array_join``), so the only Python cost
  is the one parse; thresholds are plain literals pushed into codegen.

Scale shape: one html -> one UDF call -> one array; classification
never leaves the scan stage (zero shuffles, plan-tested).  At 100 TB
this is the same single-parse discipline as the crawl's fused
extraction (crawl.py): bytes are touched exactly once.

Reference analog: the reference renders pages in a real browser and
reads the DOM (casperjs/pagefinder.js); batch curation can't afford a
browser per page, hence the shallow-feature classifier over the same
block structure.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INVISIBLE = {"script", "style", "head", "noscript", "template"}
_BLOCK_TAGS = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
    "article", "section", "blockquote", "pre", "nav", "footer", "header",
    "aside", "ul", "ol", "table", "tr", "form", "body",
}


class _BlockWalker(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        # raw (data, in_anchor) runs; whitespace-normalized only at
        # flush, over the CONCATENATION — an inline tag boundary
        # ('over<b>due</b>') must not inject a space mid-word
        self._runs: list[tuple[str, bool]] = []
        self._invisible = 0
        self._anchor = 0

    def _flush(self) -> None:
        raw = "".join(d for d, _ in self._runs)
        text = " ".join(raw.split())
        if text:
            link_raw = "".join(d for d, a in self._runs if a)
            link_chars = len(" ".join(link_raw.split()))
            self.blocks.append((text, len(text), link_chars))
        self._runs = []

    def handle_starttag(self, tag, attrs):
        if tag in _INVISIBLE:
            self._invisible += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._anchor += 1

    def handle_endtag(self, tag):
        if tag in _INVISIBLE:
            self._invisible = max(0, self._invisible - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._anchor = max(0, self._anchor - 1)

    def handle_data(self, data):
        if not self._invisible and data:
            self._runs.append((data, self._anchor > 0))


def extract_blocks_py(html: bytes | str | None) -> list[dict]:
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", "replace")
    w = _BlockWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:
        pass  # truncated/hostile html: keep whatever blocks parsed
    w._flush()
    return [
        {"text": t, "n_chars": n, "link_chars": lc} for t, n, lc in w.blocks
    ]


BLOCKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("link_chars", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(BLOCKS_TYPE)
def extract_blocks(html: pd.Series) -> pd.Series:
    return html.map(extract_blocks_py)


def _keep(min_block_chars: int, max_link_density: float):
    return lambda b: (b["n_chars"] >= min_block_chars) & (
        b["link_chars"] <= b["n_chars"] * max_link_density
    )


def main_content(
    pages: DataFrame,
    html_col: str = "html",
    min_block_chars: int = 40,
    max_link_density: float = 0.34,
) -> DataFrame:
    """Add (main_text, n_blocks_kept, n_blocks_total): good blocks —
    long enough AND link-sparse — rejoined with newlines in document
    order.  One parse per page; classification is a JVM array filter
    that rides the scan (no shuffle)."""
    blocks = extract_blocks(F.col(html_col))
    return (
        pages.withColumn("__blocks", blocks)
        .withColumn(
            "main_text",
            F.array_join(
                F.transform(
                    F.filter(F.col("__blocks"), _keep(min_block_chars, max_link_density)),
                    lambda b: b["text"],
                ),
                "\n",
            ),
        )
        .withColumn(
            "n_blocks_kept",
            F.size(F.filter(F.col("__blocks"), _keep(min_block_chars, max_link_density)))
            .cast("long"),
        )
        .withColumn("n_blocks_total", F.size("__blocks").cast("long"))
        .drop("__blocks")
    )
