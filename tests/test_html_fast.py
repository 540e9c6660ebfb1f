"""Event-stream parity: the fast tokenizer (html._scan) must emit the
exact handle_starttag/handle_endtag/handle_data sequence the stdlib
HTMLParser would, or refuse the input (return False) so _parse falls
back.  Output parity of _parse itself (fast vs forced-stdlib) is also
checked over fixtures, the synthetic pages generator, and a fuzz
corpus that covers every construct branch in the scanner."""

from __future__ import annotations

import random
from html.parser import HTMLParser

import pytest

from tripwire_spark.functions import html as H


class _Recorder(HTMLParser):
    """Stdlib-driven event recorder (the oracle)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.events: list = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag, list(attrs)))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))

    def handle_data(self, data):
        self.events.append(("data", data))


class _FastRecorder:
    """Duck-typed handler for H._scan recording the same events.

    _scan passes attrs=() for tags outside H._ATTR_TAGS — the recorder
    normalizes that to "attrs not compared" for those tags, mirroring
    the production handler which never reads them."""

    def __init__(self):
        self.events: list = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag, list(attrs)))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))

    def handle_data(self, data):
        self.events.append(("data", data))


def _norm(events):
    """Drop attr payloads for tags the scanner intentionally skips and
    merge nothing else — chunking itself must match."""
    out = []
    for e in events:
        if e[0] == "start" and e[1] not in H._ATTR_TAGS:
            out.append(("start", e[1]))
        else:
            out.append(e)
    return out


def _assert_stream_parity(doc: str):
    fast = _FastRecorder()
    ok = H._scan(doc, fast)
    if not ok:
        return  # refused: _parse falls back to stdlib, parity trivial
    ref = _Recorder()
    ref.feed(doc)
    ref.close()
    assert _norm(fast.events) == _norm(ref.events), doc


def _assert_output_parity(doc):
    fast = H._parse(doc)
    slow = H._TextAndLinks()
    if isinstance(doc, (bytes, bytearray)):
        doc = doc.decode("utf-8", errors="replace")
    slow.feed(doc)
    slow.close()
    assert fast.title_parts == slow.title_parts
    assert fast.body_parts == slow.body_parts
    assert fast.links == slow.links
    assert fast.forms == slow.forms


CASES = [
    "",
    "plain text only",
    "<html><head><title>T</title></head><body><p>hello world</p></body></html>",
    '<body><a href="/x">link</a><a href="/y" value="v"><img alt="A"></a></body>',
    "<body><form action='/r' id=f1><input type=text name=u>"
    "<input type=password name=p><button name=go>Go</button></form></body>",
    # charrefs in text and attrs
    "<body>fish &amp; chips &lt;3 &#65;</body>",
    '<body><a href="/a?x=1&amp;y=2">q &gt; p</a></body>',
    # comments, doctype, PI, bogus comments
    "<!DOCTYPE html><body>x<!-- hidden -->y</body>",
    "<body>a<!-- unclosed-comment-tolerance -- >b</body>",
    "<?php echo 1 ?><body>x</body>",
    "<!weird decl><body>x</body>",
    # CDATA elements
    "<body>a<script>var x = '<b>not a tag</b>';</script>b</body>",
    "<body>a<style>p > a { color: red }</style>b</body>",
    "<body>a<script>never closed",
    "<title>t<script>in title</script>u</title>",
    # self-closing / void / XHTML
    "<body><br/><input type=text/><a href=x />y</body>",
    "<body><br /><hr  /></body>",
    # malformed tags -> data or tolerant parses
    "<body>a < b and a <1 and x<=y</body>",
    "<body><a =x>weird</a></body>",
    "<body></ a>text</body>",
    "<body></>empty endtag</body>",
    "<body></1>bogus endtag</body>",
    "<body><a href='mixed\"quotes'>t</a></body>",
    '<body><a href="x>y">t</a></body>',
    "<body><a href=\"x\"id=y>t</a></body>",
    "<body><a href==x>t</a></body>",
    "<body><div class='irrelevant attrs' data-x=1>t</div></body>",
    # mismatched nesting (stack pop-until-match semantics)
    "<body><b><i>x</b>y</i>z</body>",
    "<body><form><p></form>after</body>",
    # unclosed at EOF
    "<body><a href='x",
    "<body>text &am",
    "<body>text &amp",
    "<body>trailing <",
    "<body><![CDATA[raw]]>after</body>",
    "<body></tag attr='>'>x</body>",
    "<body><A HREF='/UP'>Case</A></body>",
    # duplicate attrs (last wins in dict())
    "<body><a href='1' href='2'>t</a></body>",
    # label/select/textarea inside forms
    "<body><form><label for=u>User</label><input id=u name=user>"
    "<select name=s><option>1</option></select><textarea name=t></textarea>"
    "</form></body>",
]


@pytest.mark.parametrize("doc", CASES)
def test_stream_parity_cases(doc):
    _assert_stream_parity(doc)


@pytest.mark.parametrize("doc", CASES)
def test_output_parity_cases(doc):
    _assert_output_parity(doc)


def test_output_parity_bytes_and_none():
    _assert_output_parity(b"<body><a href='/x'>bytes</a></body>")
    p = H._parse(None)
    assert p.links == [] and p.body_parts == []


_TOKENS = [
    "<body>", "</body>", "<p>", "</p>", "<a href='/l'>", "</a>", "x y ",
    "&amp;", "&bogus;", "&#65;", "<", ">", "&", "<!-- c -->", "<!— odd",
    "<script>", "</script>", "'", '"', "<img alt=i>", "<br/>", "<a ",
    "href=", "'v'", "<form>", "</form>", "<input type=t>", "=", "/>", " ",
    "<![CDATA[", "]]>", "<?pi?>", "</ b>", "</>", "<1", "\n", "\t",
    "<div class=", "<title>", "</title>", "<style>", "</style>", "w<3",
]


def test_stream_parity_fuzz():
    rng = random.Random(0xC0FFEE)
    for _ in range(3000):
        doc = "".join(rng.choice(_TOKENS) for _ in range(rng.randint(1, 40)))
        _assert_stream_parity(doc)


def test_output_parity_fuzz():
    rng = random.Random(0xBEEF)
    for _ in range(1000):
        doc = "".join(rng.choice(_TOKENS) for _ in range(rng.randint(1, 40)))
        _assert_output_parity(doc)


def test_parity_on_synth_pages(spark):
    """Every page the bench generator emits takes the fast path and
    produces stdlib-identical extraction output."""
    from tripwire_spark.sources.synth import synth_pages

    rows = (
        synth_pages(spark, n_hosts=40, n_pages=4, n_links=8, n_words=60)
        .select("html")
        .collect()
    )
    assert rows
    for row in rows:
        doc = row.html.decode("utf-8", errors="replace") if isinstance(row.html, (bytes, bytearray)) else row.html
        fast = _FastRecorder()
        assert H._scan(doc, fast), "synth pages must take the fast path"
        _assert_output_parity(row.html)
