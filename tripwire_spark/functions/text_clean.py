"""Encoding repair and whitespace normalization for scraped text —
the ftfy-lite pass every webtext pipeline runs before quality gating.

Scope is the ONE mojibake class that dominates real crawls: UTF-8
bytes decoded as cp1252/Latin-1 ("Ã©" for "é", "â€™" for "'"), fixed by
a literal replacement table, plus C0/C1 control-character stripping and
whitespace normalization.  Everything is a chain of literal ``replace``
/ anchored ``regexp_replace`` column expressions — scan-side, zero
shuffles, whole-stage codegen — and the SQL twins below are generated
from the SAME tables, so an ANSI oracle reproduces the cleaned text
byte-for-byte.

The table is DERIVED, not transcribed: each repaired character's
mojibake form is computed as ``good.encode('utf-8').decode('cp1252')``
(cp1252's five undefined bytes fall back to their Latin-1 C1 controls,
matching how lenient decoders leak them through) — so no entry can be
silently corrupted by an invisible character in source code, and the
order (3-char punctuation sequences before 2-char letters, so "â€¦"
fixes before any bare "â€" prefix could) is enforced by construction.
The repaired set is conservative on purpose: only sequences essentially
impossible in intentional text.

Reference analog: the crawler gates pages on lang_class text heuristics
(schema.sql:241-247) but never repairs text; repair belongs upstream of
every gate that counts words or sentences.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# cp1252's undefined bytes: lenient decoders pass the Latin-1 C1
# control through, so the mojibake form does too
_CP1252_HOLES = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _moji(good: str) -> str:
    """What ``good`` looks like after its UTF-8 bytes are mis-decoded
    as cp1252 (Latin-1 fallback for cp1252's holes)."""
    out = []
    for x in good.encode("utf-8"):
        out.append(chr(x) if x in _CP1252_HOLES else bytes([x]).decode("cp1252"))
    return "".join(out)


# Repaired characters, 3-byte (General Punctuation) before 2-byte
# (Latin-1 Supplement) so no later entry's mojibake is a prefix of an
# earlier one's leftovers.  Last entry is nbsp (normalize_ws spaces it).
_REPAIR = (
    "’‘“”–—…•"
    "éèáàâäãåæçêëíîïñóôõöøùûü"
    "ÉÄÖÜß«»°·©®" "\u00a0"
)

MOJIBAKE: list[tuple[str, str]] = [(_moji(g), g) for g in _REPAIR]

# C0 (minus \t \n \r) and C1 control characters plus DEL — never
# legitimate in page text; the class literal is shared with the SQL
# twin.  Runs AFTER mojibake repair: some mojibake forms contain C1
# chars the repair still needs to see.
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x80-\\x9f]"


def fix_mojibake(col: Column) -> Column:
    """Repair UTF-8-decoded-as-cp1252 sequences by the derived table."""
    out = col
    for bad, good in MOJIBAKE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def strip_control(col: Column) -> Column:
    """Remove C0/C1 control characters (tab/newline/CR survive)."""
    return F.regexp_replace(col, _CTRL_RE, "")


def normalize_ws(col: Column) -> Column:
    """Line endings -> \\n, nbsp -> space, collapse space/tab runs,
    strip spaces hugging newlines, trim the ends.  Newlines themselves survive — the C4 line
    gates and sentence segmenter are line-based."""
    c = F.replace(col, F.lit("\r\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\n"))
    c = F.replace(c, F.lit("\u00a0"), F.lit(" "))
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    return F.trim(c)


def clean_text(col: Column) -> Column:
    """The full repair pass: mojibake -> control strip -> whitespace."""
    return normalize_ws(strip_control(fix_mojibake(col)))


def _sql_lit(s: str) -> str:
    """A DuckDB string literal for ``s``; control/C1 chars go through
    chr() so the SQL text stays printable."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        if ord(ch) < 32 or 127 <= ord(ch) <= 159:
            if buf:
                parts.append("'" + buf.replace("'", "''") + "'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
        else:
            buf += ch
    if buf or not parts:
        parts.append("'" + buf.replace("'", "''") + "'")
    return " || ".join(parts)


def clean_text_sql(expr: str) -> str:
    """The DuckDB twin of ``clean_text`` generated from the same
    tables — term-for-term, so cleaned text hashes identically."""
    out = expr
    for bad, good in MOJIBAKE:
        out = f"replace({out}, {_sql_lit(bad)}, {_sql_lit(good)})"
    out = f"regexp_replace({out}, '{_CTRL_RE}', '', 'g')"
    out = f"replace({out}, {_sql_lit(chr(13) + chr(10))}, {_sql_lit(chr(10))})"
    out = f"replace({out}, {_sql_lit(chr(13))}, {_sql_lit(chr(10))})"
    out = f"replace({out}, {_sql_lit(chr(0xA0))}, ' ')"
    out = f"regexp_replace({out}, '[ \\t]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', {_sql_lit(chr(10))}, 'g')"
    return f"trim({out})"
