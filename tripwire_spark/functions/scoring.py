"""Link / form / e-mail-URL scoring — pure column expressions.

All scoring is JVM-side (whole-stage-codegen'd regex + arithmetic); the
only Python in the path is the one-time HTML feature extraction UDF.

Reference parity:
- C18 link weights: casperjs/iframe/pagefinder/expressions.js:3-17,
  applied in declaration order with the pairwise reweight rule of
  pagefinder.js:79-93 (D3): first match sets the weight; a later
  matching expr e: both >= 0 -> max(cur, w)+1; otherwise cur = w.
  Negatives stripped after combine (pagefinder.js:116-121), sort by
  weight desc (pagefinder.js:122), tie-break pinned to document order
  (the reference inherits JS engine sort order on ties; we pin `pos`).
- C17 form score: formfinder.js:27-167 + formexpressions.js:4-25;
  constants NO_PASS_PENALTY=50, DOUBLE_PASS_BONUS=6, BASE_PENALTY=-3,
  MAX_ELEMENTS_BONUS=5 (formfinder.js:2-5).  FORM_ATTRS match at most
  once per expr over (action,id,name); BUTTON_ATTRS match once per
  button per expr over the button's attr string.
- C11 e-mail URL weight: handle_email.py:180-211,389-411 — path-length
  ramp min(max(len(path)-20,0),60), -100000 if len(path)<9 or blacklisted
  domain, keyword bonuses, +20 per repeat (D1, handle_email.py:413-420).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (java-regex, weight) in declaration order — expressions.js:3-17.
LINK_EXPRS: list[tuple[str, float]] = [
    (r"account", 3.5),
    (r"sign *in[^g]", 3.0),
    (r"sign *in$", 3.0),
    (r"log *in", 3.0),
    (r"join[^t]", 4.0),
    (r"join$", 4.0),
    (r"forum", 2.0),
    (r"community", 1.0),
    (r"regist", 5.0),
    (r"sign[ -]*up", 6.0),
    (r"create.*account", 11.0),
    (r"facebook", -8.0),
    (r"google", -8.0),
]

# formexpressions.js:4-25
FORM_ATTR_EXPRS: list[tuple[str, int]] = [
    (r"register", 6),
    (r"join", 5),
    (r"create", 4),
    (r"sign.*up", 3),
    (r"account", 1),
    (r"sign.*in", -2),
    (r"log.*in", -2),
]
BUTTON_ATTR_EXPRS: list[tuple[str, int]] = [
    (r"register", 4),
    (r"join", 4),
    (r"create", 3),
    (r"sign.*up", 2),
    (r"sign.*in", -2),
    (r"log.*in", -2),
]

NO_PASS_PENALTY = 50
DOUBLE_PASS_BONUS = 6
BASE_PENALTY = -3
MAX_ELEMENTS_BONUS = 5
MIN_FORM_SCORE = 2  # formfinder.js:220 acceptance threshold

# handle_email.py:165-194
EMAIL_DOMAIN_BLACKLIST = [
    r"w3\.org",
    r"facebook\.com",
    r"linkedin\.com",
    r"twitter\.com",
    r"youtube\.com",
    r"schema\.org",
    r"google\.com",
]
EMAIL_URL_BONUSES: list[tuple[str, int]] = [
    (r"confirm", 200),
    (r"verify", 200),
    (r"activate", 200),
    (r"validate", 100),
    (r"account", 30),
    (r"signup", 20),
    (r"setup", 20),
    (r"subscribe", 80),
    (r"delete", -100),
    (r"unsubscribe", -200),
    (r"spam", -200),
    (r"close", -100),
    (r"account/?$", -35),
]
REPEAT_BONUS = 20
PATH_OFFSET = 20
MAX_PATH_BONUS = 60
MIN_PATH_LENGTH = 9
SUBJECT_PATTERNS = [
    "activate",
    "confirm",
    "verif",
    "regist",
    "account",
    "complete",
    "join",
    "setup",
    "welcome",
]


def _ci(pat: str) -> str:
    return "(?i)" + pat


def link_weight(text_col: Column | str) -> Column:
    """Combined link weight for one anchor-text column.

    Replays the reference's iterated fold over LINK_EXPRS in declaration
    order (pagefinder.js:68-114): NULL until the first matching expr,
    then pairwise combine.  Expressed as a single fold over a literal
    array of (matched?, weight) — entirely JVM-side.

    Hot-path shape (this runs once per EXPLODED LINK — ~10^7 rows/round
    locally, ~10^11 at 100 TB): case-insensitivity is ONE ``lower()``
    instead of 13 ``(?i)`` regexes (Java's CASE_INSENSITIVE folds case
    per character per backtrack — measurably slower than matching
    lowercase literals on a lowered string), and the 13-pattern fold is
    GATED behind a single combined alternation, so the common row (an
    anchor text matching nothing) pays exactly one regex execution.
    ``find(p1) OR find(p2) ... == find(p1|p2|...)``, so the gate is
    exact, and all LINK_EXPRS are lowercase (pinned by a test) so the
    lowered rewrite is byte-equivalent to the (?i) original.
    """
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    lt = F.lower(t)
    gate = lt.rlike("(" + "|".join(p for p, _ in LINK_EXPRS) + ")")
    pairs = F.array(
        *[
            F.struct(lt.rlike(p).alias("m"), F.lit(w).alias("w"))
            for p, w in LINK_EXPRS
        ]
    )
    # fold: acc double (NULL = no match yet); evaluated only when the
    # gate matched (CaseWhen evaluates branch values lazily)
    fold = F.aggregate(
        pairs,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(~x["m"], acc)
        .when(acc.isNull(), x["w"])
        .when((x["w"] >= 0) & (acc >= 0), F.greatest(acc, x["w"]) + 1)
        .otherwise(x["w"]),
    )
    return F.when(gate, fold).otherwise(F.lit(None).cast("double"))


def score_links(links: DataFrame, text_col: str = "text", keep_negative: bool = False) -> DataFrame:
    """Add ``weight`` to exploded link rows; drop non-matching and
    (by default) negative-weight links (pagefinder.js:116-121)."""
    out = links.withColumn("weight", link_weight(text_col)).filter(F.col("weight").isNotNull())
    if not keep_negative:
        out = out.filter(F.col("weight") >= 0)
    return out


def form_score(
    action: Column,
    form_id: Column,
    name: Column,
    buttons: Column,
    n_password: Column,
    n_visible: Column,
) -> Column:
    """C17 form score as one column expression (formfinder.js:27-167)."""
    score = F.lit(0).cast("double")
    # FORM_ATTRS: first matching attr of (action,id,name) per expr → +w once.
    for pat, w in FORM_ATTR_EXPRS:
        m = action.rlike(_ci(pat)) | form_id.rlike(_ci(pat)) | name.rlike(_ci(pat))
        score = score + F.when(m, F.lit(w)).otherwise(F.lit(0))
    # BUTTON_ATTRS: per button per expr.
    for pat, w in BUTTON_ATTR_EXPRS:
        per_btn = F.aggregate(
            buttons,
            F.lit(0),
            lambda acc, b: acc + F.when(b.rlike(_ci(pat)), F.lit(w)).otherwise(F.lit(0)),
        )
        score = score + F.coalesce(per_btn, F.lit(0))
    score = score + F.when(n_password == 0, F.lit(-NO_PASS_PENALTY)).when(
        n_password == 2, F.lit(DOUBLE_PASS_BONUS)
    ).otherwise(F.lit(0))
    score = score + F.lit(BASE_PENALTY) + F.greatest(n_visible, F.lit(MAX_ELEMENTS_BONUS))
    return score


def email_url_weight(domain_col: Column, path_col: Column) -> Column:
    """C11 (handle_email.py:373-411), exact accumulation order:
    base = min(max(len(path)-20,0),60); -100000 if len(path)<9; -100000
    per DOMAIN-blacklist match (searched on the domain, not the url);
    each bonus regex searched on the PATH."""
    path_len = F.coalesce(F.length(path_col), F.lit(0))
    w = F.least(F.greatest(path_len - PATH_OFFSET, F.lit(0)), F.lit(MAX_PATH_BONUS)).cast("double")
    w = w + F.when(path_len < MIN_PATH_LENGTH, F.lit(-100000.0)).otherwise(F.lit(0.0))
    for pat in EMAIL_DOMAIN_BLACKLIST:
        w = w + F.when(domain_col.rlike(_ci(pat)), F.lit(-100000.0)).otherwise(F.lit(0.0))
    for pat, bonus in EMAIL_URL_BONUSES:
        w = w + F.when(path_col.rlike(_ci(pat)), F.lit(bonus).cast("double")).otherwise(F.lit(0.0))
    return w


def subject_interesting(subject_col: Column) -> Column:
    """F9: decoded subject matches any SUBJECT_PATTERN
    (handle_email.py:198-208,332-351; KILL_PATTERNS is empty)."""
    return subject_col.rlike(_ci("|".join(SUBJECT_PATTERNS)))
