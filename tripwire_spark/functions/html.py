"""HTML feature extraction: visible text, outlinks, form candidates.

Reference parity:
- Text extraction = ``title + " " + page.plainText``
  (casperjs/iframe/utils/pageUtils.js:58-61) — the byte-identical
  invariant.  ``plainText`` is the visible body text with text nodes
  joined by single spaces (whitespace-collapsed), matching a browser's
  ``document.body.plainText`` for whitespace-free markup.
- Link candidates = anchors with text fallback text→value→alt trimmed
  (pagefinder.js:131-156), length filter 1..30 (pagefinder.js:6,98-100).
- Form features = per-form attrs + input/button inventory feeding the
  C17 scoring expression (formfinder.js:27-167).

All three are **vectorized pandas UDFs over Arrow batches** (one Python
call per ~10k rows, stdlib ``html.parser`` inside — no per-row UDF
serde, no external parser dependency).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INVISIBLE = {"script", "style", "head", "noscript", "template"}


class _TextAndLinks(HTMLParser):
    """Single-pass extractor: title, visible body text, anchors, forms,
    and — only when ``collect_fields`` — per-field attrs (formfiller C19
    inputs) and label[for] text.  Field/label bookkeeping costs ~10% of
    parse CPU, so the crawl hot path (extract_page: text+links only)
    leaves it off; extract_form_fields turns it on."""

    def __init__(self, collect_fields: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self._collect_fields = collect_fields
        # visibility state as depth counters so handle_data is O(1)
        # instead of scanning the open-tag stack per text node; kept in
        # lockstep with _stack by handle_starttag / handle_endtag
        self._title_d = 0
        self._invis_d = 0
        self._body_d = 0
        self.title_parts: list[str] = []
        self.body_parts: list[str] = []
        self.links: list[tuple[str, str]] = []  # (href, text)
        self.forms: list[dict] = []
        self.fields: list[dict] = []  # per input/select/button element
        self.labels: dict[str, str] = {}  # label[for] -> first label text
        self._stack: list[str] = []
        self._cur_link: list[str] | None = None
        self._cur_href: str | None = None
        self._cur_link_val: str | None = None
        self._cur_link_alt: str | None = None
        self._cur_form: dict | None = None
        self._cur_button: list[str] | None = None
        self._cur_label_for: str | None = None
        self._cur_label: list[str] | None = None
        self._last_text: str = ""  # nearest preceding visible text run

    def _push_field(self, tag: str, a: dict) -> None:
        # near_text approximates cliGetNearbyText's parent-walk
        # (formfiller.js:256-279): the nearest text run before the
        # element, accepted only within the same [3, 26] length gate.
        near = self._last_text.strip()
        if not (3 <= len(near) <= 26):
            near = ""
        self.fields.append(
            {
                "form_pos": len(self.forms),
                "pos": len(self.fields),
                "id": a.get("id"),
                "name": a.get("name"),
                "value": a.get("value"),
                "type": a.get("type"),
                "tag": tag,
                "placeholder": a.get("placeholder"),
                "near_text": near,
            }
        )

    # -- tag handling ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._stack.append(tag)
        if tag == "title":
            self._title_d += 1
        elif tag in _INVISIBLE:
            self._invis_d += 1
        elif tag == "body":
            self._body_d += 1
        a = dict(attrs)
        if tag == "a":
            self._cur_link = []
            self._cur_href = a.get("href")
            # C15 fallback sources (pagefinder.js:131-156 linkText):
            # text -> val -> alt.  For an anchor, "val" is its value
            # attr; "alt" is its own alt or the first wrapped img's.
            self._cur_link_val = a.get("value")
            self._cur_link_alt = a.get("alt")
        elif tag == "img" and self._cur_link is not None:
            if not self._cur_link_alt and a.get("alt"):
                self._cur_link_alt = a.get("alt")
        elif tag == "form":
            self._cur_form = {
                "action": a.get("action") or "",
                "form_id": a.get("id") or "",
                "name": a.get("name") or "",
                "n_inputs": 0,
                "n_password": 0,
                "n_visible": 0,
                "buttons": [],
            }
        elif tag == "label" and self._collect_fields:
            self._cur_label_for = a.get("for")
            self._cur_label = []
        elif tag in ("select", "textarea") and self._cur_form is not None:
            if self._collect_fields:
                self._push_field(tag, a)
        elif tag == "input" and self._cur_form is not None:
            if self._collect_fields:
                self._push_field(tag, a)
            self._cur_form["n_inputs"] += 1
            typ = (a.get("type") or "text").lower()
            if typ == "password":
                self._cur_form["n_password"] += 1
            if typ not in ("hidden",):
                self._cur_form["n_visible"] += 1
            if typ in ("submit", "button"):
                # scored attrs are name/id/value/class ONLY
                # (formfinder.js:75 cliGetButtonScore) — never text
                self._cur_form["buttons"].append(
                    " ".join(x for x in (a.get("name"), a.get("id"), a.get("value"), a.get("class")) if x)
                )
        elif tag == "button":
            self._cur_button = []
            if self._cur_form is not None:
                if self._collect_fields:
                    self._push_field(tag, a)
                self._cur_form["buttons"].append(
                    " ".join(x for x in (a.get("name"), a.get("id"), a.get("value"), a.get("class")) if x)
                )

    def handle_endtag(self, tag):
        while self._stack:
            t = self._stack.pop()
            if t == "title":
                self._title_d -= 1
            elif t in _INVISIBLE:
                self._invis_d -= 1
            elif t == "body":
                self._body_d -= 1
            if t == tag:
                break
        if tag == "a" and self._cur_link is not None:
            # C15: text -> val -> alt, each trimmed; first non-empty wins
            # (pagefinder.js:131-156) — image links score by alt text
            # instead of being dropped by the length gate.
            txt = " ".join(" ".join(self._cur_link).split())
            if not txt and self._cur_link_val:
                txt = self._cur_link_val.strip()
            if not txt and self._cur_link_alt:
                txt = self._cur_link_alt.strip()
            if self._cur_href:
                self.links.append((self._cur_href, txt))
            self._cur_link = None
            self._cur_href = None
            self._cur_link_val = None
            self._cur_link_alt = None
        elif tag == "form" and self._cur_form is not None:
            self.forms.append(self._cur_form)
            self._cur_form = None
        elif tag == "button" and self._cur_button is not None:
            self._cur_button = None  # button text is visible text, not a scored attr
        elif tag == "label" and self._cur_label is not None:
            if self._cur_label_for and self._cur_label_for not in self.labels:
                # labels.first() semantics (formfiller.js:221-235)
                self.labels[self._cur_label_for] = " ".join(" ".join(self._cur_label).split())
            self._cur_label = None
            self._cur_label_for = None

    def resolve_field_labels(self) -> None:
        """label = label[for=id] first, else label[for=name], else ''
        (formfiller.js:221-235 getLabelText)."""
        for f in self.fields:
            f["label"] = (
                self.labels.get(f["id"] or "")
                or self.labels.get(f["name"] or "")
                or ""
            )

    def handle_data(self, data):
        if not data:
            return
        if self._title_d:
            self.title_parts.append(data)
            return
        if self._invis_d:
            return
        if self._body_d:
            d = " ".join(data.split())
            if d:
                self.body_parts.append(d)
                if self._cur_link is not None:
                    self._cur_link.append(d)
                if self._cur_button is not None:
                    self._cur_button.append(d)
                if self._collect_fields:
                    self._last_text = d
                    if self._cur_label is not None:
                        self._cur_label.append(d)


# ---------------------------------------------------------------------------
# Fast tokenizer.  stdlib HTMLParser spends ~60% of parse CPU in its own
# Python-level machinery (goahead's per-construct dispatch, updatepos
# bookkeeping, check_for_whole_start_tag) before our handlers ever run.
# _scan() below drives the SAME handler object with the SAME event
# stream (it reuses HTMLParser's own compiled grammar regexes, so tag /
# attr / comment boundaries are decided by identical patterns) but in
# one flat loop with no position bookkeeping and no attr parsing for
# tags the handler never inspects.  Any construct whose stdlib handling
# is stateful-at-EOF or otherwise awkward to mirror exactly (unclosed
# tags at end of input, `<![` marked sections, bogus end tags with no
# closing '>') returns False and the caller re-parses from scratch with
# the stdlib tokenizer — the fast path is an optimization, never a
# semantics change.  Parity is pinned by tests/test_html_fast.py, which
# fuzz-compares the two event streams token by token.
# ---------------------------------------------------------------------------
import html.parser as _hp
from html import unescape as _unescape

_LOCATE_START = _hp.locatestarttagend_tolerant
_ATTRFIND = _hp.attrfind_tolerant
_TAGFIND = _hp.tagfind_tolerant
_ENDTAGFIND = _hp.endtagfind
_COMMENTCLOSE = _hp.commentclose
_CDATA_CLOSE = {
    elem: re.compile(r"</\s*%s\s*>" % elem, re.I) for elem in ("script", "style")
}
_LETTERS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
# html.parser's check_for_whole_start_tag "end of input in or before
# attribute value" character class
_AMBIG_AFTER_TAG = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")
# Tags whose attrs the handler actually reads (dict(attrs) consulted in
# handle_starttag) — every other tag gets an empty attr tuple.
_ATTR_TAGS = frozenset(
    ("a", "img", "form", "label", "select", "textarea", "input", "button")
)


def _scan(s: str, h: _TextAndLinks) -> bool:
    """Emit HTMLParser's exact event stream for ``s`` into handler ``h``.

    Returns False when the input contains a construct the fast path
    does not mirror (the caller then re-parses with the stdlib
    tokenizer on a FRESH handler); True when the full document was
    consumed with stdlib-identical events."""
    n = len(s)
    i = 0
    find = s.find
    startswith = s.startswith
    hd = h.handle_data
    hst = h.handle_starttag
    het = h.handle_endtag
    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if i < j:
            chunk = s[i:j]
            hd(_unescape(chunk) if "&" in chunk else chunk)
        if j == n:
            break
        c = s[j + 1 : j + 2]
        if c in _LETTERS:
            # -- start tag (mirrors parse_starttag + check_for_whole_start_tag)
            m = _LOCATE_START.match(s, j)
            e = m.end()
            nxt = s[e : e + 1]
            if nxt == ">":
                endpos = e + 1
            elif nxt == "/" and startswith("/>", e):
                endpos = e + 2
            elif nxt == "" or nxt in _AMBIG_AFTER_TAG:
                return False  # incomplete at EOF — stdlib's close() path
            else:
                return False  # "bogus input" branch — rare, stdlib handles
            tm = _TAGFIND.match(s, j + 1)
            tag = tm.group(1).lower()
            k = tm.end()
            attrs: list | tuple = ()
            if k < endpos - 1 and s[k:endpos].strip() not in (">", "/>"):
                collect = tag in _ATTR_TAGS
                if collect:
                    attrs = []
                while k < endpos:
                    am = _ATTRFIND.match(s, k)
                    if not am:
                        break
                    if collect:
                        attrname, rest, attrvalue = am.group(1, 2, 3)
                        if not rest:
                            attrvalue = None
                        elif (
                            attrvalue[:1] == "'" == attrvalue[-1:]
                            or attrvalue[:1] == '"' == attrvalue[-1:]
                        ):
                            attrvalue = attrvalue[1:-1]
                        if attrvalue:
                            attrvalue = _unescape(attrvalue)
                        attrs.append((attrname.lower(), attrvalue))
                    k = am.end()
                end = s[k:endpos].strip()
                if end not in (">", "/>"):
                    # stdlib: a start tag whose attrs don't parse cleanly
                    # is emitted as raw data, NOT unescaped
                    hd(s[j:endpos])
                    i = endpos
                    continue
                if end == "/>":
                    # handle_startendtag default: starttag then endtag,
                    # never CDATA mode
                    hst(tag, attrs)
                    het(tag)
                    i = endpos
                    continue
            elif startswith("/>", endpos - 2):
                hst(tag, attrs)
                het(tag)
                i = endpos
                continue
            hst(tag, attrs)
            i = endpos
            if tag in _CDATA_CLOSE:
                m2 = _CDATA_CLOSE[tag].search(s, i)
                if not m2:
                    # stdlib at EOF in cdata mode: the unterminated
                    # content is silently dropped (goahead breaks before
                    # its flush tail), no endtag event
                    return True
                if i < m2.start():
                    hd(s[i : m2.start()])  # cdata content: never unescaped
                het(tag)
                i = m2.end()
        elif c == "/":
            # -- end tag (mirrors parse_endtag)
            em = _ENDTAGFIND.match(s, j)
            if em:
                het(em.group(1).lower())
                i = em.end()
                continue
            nm = _TAGFIND.match(s, j + 2)
            if nm:
                gtpos = find(">", nm.end())
                if gtpos < 0:
                    return False
                het(nm.group(1).lower())
                i = gtpos + 1
            elif startswith("</>", j):
                i = j + 3
            else:
                # bogus comment: skip to '>'
                pos = find(">", j + 2)
                if pos < 0:
                    return False
                i = pos + 1
        elif startswith("<!--", j):
            cm = _COMMENTCLOSE.search(s, j + 4)
            if not cm:
                return False
            i = cm.end()
        elif c == "?":
            pos = find(">", j + 2)
            if pos < 0:
                return False
            i = pos + 1
        elif c == "!":
            if startswith("<![", j):
                return False  # marked section — stdlib-only
            if s[j : j + 9].lower() == "<!doctype":
                pos = find(">", j + 9)
            else:
                pos = find(">", j + 2)
            if pos < 0:
                return False
            i = pos + 1
        elif j + 1 < n:
            hd("<")
            i = j + 1
        else:
            hd("<")  # stdlib close(): trailing '<' flushes as data
            break
    return True


def _parse(html: bytes | str | None, collect_fields: bool = False) -> _TextAndLinks:
    p = _TextAndLinks(collect_fields)
    if html is None:
        return p
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    try:
        if _scan(html, p):
            return p
    except Exception:
        pass
    p = _TextAndLinks(collect_fields)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p


def extract_text_py(html: bytes | str | None) -> str | None:
    """``title + " " + plainText`` (pageUtils.js:58-61)."""
    if html is None:
        return None
    p = _parse(html)
    title = " ".join(" ".join(p.title_parts).split())
    plain = " ".join(p.body_parts)
    return f"{title} {plain}"


def extract_text_mail_py(html: bytes | str | None) -> str | None:
    """Pagegrab variant: ``title + "\\n" + plainText + "\\n"``
    (mail/scripts/pagegrab.js:88-90)."""
    if html is None:
        return None
    p = _parse(html)
    title = " ".join(" ".join(p.title_parts).split())
    plain = " ".join(p.body_parts)
    return f"{title}\n{plain}\n"


LINKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)

FORMS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("action", T.StringType()),
            T.StructField("form_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("n_inputs", T.IntegerType()),
            T.StructField("n_password", T.IntegerType()),
            T.StructField("n_visible", T.IntegerType()),
            T.StructField("buttons", T.ArrayType(T.StringType())),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


@F.pandas_udf(T.StringType())
def extract_text_mail(html: pd.Series) -> pd.Series:
    return html.map(extract_text_mail_py)


@F.pandas_udf(LINKS_TYPE)
def extract_links(html: pd.Series) -> pd.Series:
    """Anchor candidates with position (deterministic document order).

    Applies the reference's text-length gate 1..30
    (pagefinder.js:6,98-100) so downstream scoring sees the same
    candidate set the reference would."""

    def one(h):
        if h is None:
            return []
        p = _parse(h)
        return [
            {"href": href, "text": txt, "pos": i}
            for i, (href, txt) in enumerate(p.links)
            if 1 <= len(txt) <= 30
        ]

    return html.map(one)


@F.pandas_udf(FORMS_TYPE)
def extract_forms(html: pd.Series) -> pd.Series:
    """Form feature rows feeding the C17 scoring expression."""

    def one(h):
        if h is None:
            return []
        p = _parse(h)
        return [
            {
                "action": f["action"],
                "form_id": f["form_id"],
                "name": f["name"],
                "n_inputs": f["n_inputs"],
                "n_password": f["n_password"],
                "n_visible": f["n_visible"],
                "buttons": [b for b in f["buttons"] if b],
                "pos": i,
            }
            for i, f in enumerate(p.forms)
        ]

    return html.map(one)


FIELDS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("form_pos", T.IntegerType()),
            T.StructField("pos", T.IntegerType()),
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("label", T.StringType()),
            T.StructField("placeholder", T.StringType()),
            T.StructField("near_text", T.StringType()),
        ]
    )
)


@F.pandas_udf(FIELDS_TYPE)
def extract_form_fields(html: pd.Series) -> pd.Series:
    """C19 inputs: per-field attr rows, the batch analog of
    getFormElementInfo + findApplicablePatterns' field collection
    (formfiller.js:296-311).  NULL attr = undefined (skipped by the
    matcher); label/near_text are '' when absent, matching
    getLabelText/cliGetNearbyText returning empty strings."""

    def one(h):
        if h is None:
            return []
        p = _parse(h, collect_fields=True)
        p.resolve_field_labels()
        return p.fields

    return html.map(one)


PAGE_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", LINKS_TYPE),
    ]
)


@F.pandas_udf(PAGE_TYPE)
def extract_page(html: pd.Series) -> pd.DataFrame:
    """Single-parse page extraction: byte-identical text
    (pageUtils.js:58-61) AND gated anchor candidates
    (pagefinder.js:6,98-100) from ONE pass over the html.

    The crawl loop uses this instead of extract_text + extract_links so
    each fetched page is parsed exactly once and the (large, immutable)
    html column never needs to be cached — only the skinny parsed
    output is."""

    def one(h):
        if h is None:
            return {"text": None, "links": []}
        p = _parse(h)
        title = " ".join(" ".join(p.title_parts).split())
        plain = " ".join(p.body_parts)
        return {
            "text": f"{title} {plain}",
            "links": [
                {"href": href, "text": txt, "pos": i}
                for i, (href, txt) in enumerate(p.links)
                if 1 <= len(txt) <= 30
            ],
        }

    return pd.DataFrame(list(html.map(one)))
