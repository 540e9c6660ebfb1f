"""Formfiller field-pattern subsystem (C19 + W6) — pure column algebra.

Reference parity (semantics, not code):
- Pattern table: casperjs/iframe/formfiller/expressions.js:1-224 — per
  field type (firstname, email, password, ...) an ordered list of
  case-insensitive regexes with weights (default 0) and an optional
  die_on_fail flag.
- Matching: casperjs/iframe/formfiller/formfiller.js:296-377
  (findApplicablePatterns) — each pattern is tested against the
  element attributes named by its ``attr`` spec.  ``attr: "all"``
  means the SIX attrs [id, name, value, label, placeholder,
  near_text] — explicitly NOT type and NOT tag (formfiller.js:333-335).
  Undefined attrs are skipped; every matching (pattern, attr) pair
  yields one result row.
- Ranking: formfiller.js:703-710 — patterns sorted by weight desc
  (undefined weight -> 0) and tried in order.  JS sort stability is
  engine-dependent; we pin ties to declaration order (``ord``).
- Fill walk: formfiller.js:714-742 — walk sorted patterns; a type
  with no configured value is skipped ("No values defined"); the
  first type with a value fills the field.  Buttons are trivially
  successful (formfiller.js:693-697).
- Values + required set: identities/make_conf/conf_template.txt —
  values exist for every type except ``captcha`` and ``maidenname``;
  requiredSet = {email, password}.
- Verification: tripwire.js:269-287 — unfilled required types kill
  the form (exit 33); fill percentage below MIN_PERCENT_COMPLETE=55
  kills it too (exit 32, tripwire.js:1,282-287).

Everything below is JVM-side: the pattern table is expanded into a
literal array of (compile-once rlike, struct) expressions — the same
design as the C18 link scorer — so matching is whole-stage-codegen'd
with zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# The six attrs "all" expands to (formfiller.js:333-335) — order pinned.
ALL_ATTRS = ["id", "name", "value", "label", "placeholder", "near_text"]
# The full attr set a pattern may name (formfiller.js:299-311).
FIELD_ATTRS = ["id", "name", "value", "type", "tag", "label", "placeholder", "near_text"]

# (ptype, attr_spec, regex, weight, die_on_fail) in declaration order —
# transcription of formfiller/expressions.js:1-224 (weights default 0).
FIELD_PATTERNS: list[tuple[str, str, str, float, bool]] = [
    ("firstname", "all", r".*first.*name.*", 3.0, False),
    ("firstname", "all", r".*first.*n.*", 1.0, False),
    ("firstname", "all", r".*f.*name.*", -1.0, False),
    ("firstname", "all", r".*given.*n.*", 1.0, False),
    ("lastname", "all", r".*(last|sur).*n", 1.0, False),
    ("lastname", "all", r".*(l(ast)?|s(ur)?)[^a-zA-Z]*name", 1.0, False),
    ("lastname", "all", r".*last.*name.*", 3.0, False),
    ("name", "all", r"name", 0.0, False),
    ("name", "all", r"full.*name", 5.0, False),
    ("name", "all", r"first.*last.*name", 5.0, False),
    ("name", "all", r"last.*first.*name", 5.0, False),
    ("name", "all", r"first.*last", 4.0, False),
    ("name", "all", r"last.*first", 4.0, False),
    ("email", "all", r".*e-?mail.*", 7.0, True),
    ("email", "all", r".*mail.*", 1.0, True),
    ("email", "type", r"email", 10.0, True),
    ("username", "all", r"user.*name", 2.0, False),
    ("username", "all", r"uname", 2.0, False),
    ("username", "all", r"member.*name", 2.0, False),
    ("username", "all", r"userid", 2.0, False),
    ("username", "all", r"user.*login", 2.0, False),
    ("username", "all", r"login.*name", 2.0, False),
    ("username", "all", r"displayname", 2.0, False),
    ("username", "all", r"screen.*name", 3.0, False),
    ("username", "all", r"login", -1.0, False),
    ("password", "type", r"password", 5.0, True),
    ("password", "all", r"password", 5.0, True),
    ("phone", "all", r"phone", 3.0, False),
    ("phone", "all", r"mobile", 3.0, False),
    ("phone", "all", r"cell", 3.0, False),
    ("areacode", "all", r"phone.*areacode", 4.0, False),
    ("areacode", "all", r"mobile.*areacode", 4.0, False),
    ("areacode", "all", r"cell.*areacode", 4.0, False),
    ("areacode", "all", r"phone.*area", 3.5, False),
    ("areacode", "all", r"mobile.*area", 3.5, False),
    ("areacode", "all", r"cell.*area", 3.5, False),
    ("dob", "all", r".*dob.*", 0.0, False),
    ("dob", "all", r".*birthda(te|y).*", 0.0, False),
    ("dob", "all", r".*bd.*", 0.0, False),
    ("dob", "type", r"date", 5.0, False),
    ("month", "all", r".*mm", 2.0, False),
    ("month", "all", r".*month.*", 2.0, False),
    ("month", "type", r"month", 5.0, False),
    ("year", "all", r".*yy", 2.0, False),
    ("year", "all", r".*year.*", 2.0, False),
    ("day", "all", r".*day.*", 1.0, False),
    ("day", "all", r".*dd.*", 1.0, False),
    ("radiobuttons", "type", r"radio", -1.0, False),
    ("checkboxes", "type", r"checkbox", 8.0, False),
    ("selects", "tag", r"select", -1.0, False),
    ("age", "all", r"^age", 0.0, False),
    ("age", "all", r"[^m]age", 0.0, False),
    ("country", "all", r".*country.*", 0.0, False),
    ("country", "all", r".*nation.*", 0.0, False),
    ("address", "all", r".*address.*", 6.0, False),
    ("address", "all", r".*street.*", 6.0, False),
    ("city", "all", r"city", 2.0, False),
    ("city", "all", r"town", 2.0, False),
    ("city", "all", r"location", 0.0, False),
    ("state", "all", r"state", 0.0, False),
    ("state", "all", r"region", 0.0, False),
    ("zip", "all", r"(zip|(post.*code))", 0.0, False),
    ("sex", "all", r"(sex|gender)", 0.0, False),
    ("maidenname", "all", r"maiden", 6.0, False),
    ("captcha", "all", r"captcha", 5.0, False),
    ("captcha", "all", r"turing", 4.0, False),
    ("captcha", "all", r"human", 3.0, False),
    ("captcha", "all", r"security", 2.0, False),
    ("captcha", "all", r"code", -1.0, False),
    ("answer", "all", r"secret.*answer", 2.0, False),
    ("answer", "all", r"answer", 0.0, False),
]

# Field types with configured fill values (conf_template.txt exports.fields)
# — note: captcha and maidenname have NO values, so matching them never
# fills a field ("No values defined", formfiller.js:718-721).
VALUE_TYPES = frozenset(
    [
        "month", "day", "year", "dob", "username", "email", "firstname",
        "lastname", "name", "password", "phone", "areacode", "sex",
        "country", "zip", "state", "city", "age", "address", "answer",
        "checkboxes", "selects", "radiobuttons",
    ]
)

# conf_template.txt:34
REQUIRED_SET = frozenset(["email", "password"])

# tripwire.js:1
MIN_PERCENT_COMPLETE = 55.0


def expanded_patterns() -> list[tuple[int, str, int, str, str, float, bool]]:
    """The attr-expanded pattern table: (ord, ptype, pidx, attr, regex,
    weight, die_on_fail).  ``ord`` is the global declaration order the
    rank tie-break pins (ptype order, pattern index, attr order)."""
    out = []
    ord_ = 0
    pidx = 0
    prev = None
    for ptype, attr_spec, regex, weight, die in FIELD_PATTERNS:
        pidx = pidx + 1 if ptype == prev else 0
        prev = ptype
        attrs = ALL_ATTRS if attr_spec == "all" else [attr_spec]
        for attr in attrs:
            out.append((ord_, ptype, pidx, attr, regex, weight, die))
            ord_ += 1
    return out


EXPANDED_PATTERNS = expanded_patterns()


def match_array(attr_cols: dict[str, Column]) -> Column:
    """Array of match structs for one field row.

    ``attr_cols`` maps each of FIELD_ATTRS to a Column (NULL =
    undefined attr -> skipped, formfiller.js:349-357).  Each regex is a
    literal, so it compiles once per task and runs inside codegen."""
    items = []
    for ord_, ptype, pidx, attr, regex, weight, die in EXPANDED_PATTERNS:
        c = attr_cols[attr]
        hit = c.isNotNull() & c.rlike("(?i)" + regex)
        items.append(
            F.when(
                hit,
                F.struct(
                    F.lit(ord_).alias("ord"),
                    F.lit(ptype).alias("ptype"),
                    F.lit(attr).alias("attr"),
                    F.lit(regex).alias("pattern"),
                    F.lit(weight).alias("weight"),
                    F.lit(die).alias("die_on_fail"),
                ),
            )
        )
    return F.filter(F.array(*items), lambda x: x.isNotNull())


def _attr_cols(df: DataFrame) -> dict[str, Column]:
    return {a: F.col(a) for a in FIELD_ATTRS}


def field_pattern_matches(df: DataFrame, id_cols: list[str]) -> DataFrame:
    """C19: one row per (field, matching pattern, attr) — the batch
    analog of findApplicablePatterns (formfiller.js:296-377)."""
    m = df.select(*id_cols, F.explode(match_array(_attr_cols(df))).alias("pm"))
    return m.select(
        *id_cols,
        F.col("pm.ord").alias("ord"),
        F.col("pm.ptype").alias("ptype"),
        F.col("pm.attr").alias("attr"),
        F.col("pm.pattern").alias("pattern"),
        F.col("pm.weight").alias("weight"),
        F.col("pm.die_on_fail").alias("die_on_fail"),
    )


def best_field_pattern(matches: DataFrame, id_cols: list[str]) -> DataFrame:
    """W6: the pattern tried first per field — weight desc, declaration
    order on ties (formfiller.js:703-710, stability pinned)."""
    w = Window.partitionBy(*id_cols).orderBy(F.col("weight").desc(), F.col("ord"))
    return (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _is_button(type_col: Column, tag_col: Column) -> Column:
    """Trivially-successful fields (formfiller.js:693-697)."""
    return (F.coalesce(tag_col, F.lit("")) == "button") | (
        (F.coalesce(tag_col, F.lit("")) == "input")
        & F.coalesce(type_col, F.lit("")).isin("submit", "reset")
    )


def fill_plan(fields: DataFrame, id_cols: list[str]) -> DataFrame:
    """The fill walk per field (formfiller.js:714-742), batch form.

    Matched patterns are walked in (weight desc, ord) order; types
    without configured values are skipped; the first valued type fills
    the field.  Buttons succeed trivially with no fill type.

    Returns one row per input field:
      fill_type (string|NULL), filled (bool), is_button (bool).
    Implemented as an array sort + find over the per-row match array —
    no join, no shuffle; the field table streams through one stage.
    """
    arr = F.array_sort(
        match_array(_attr_cols(fields)),
        # weight desc, then declaration order asc
        lambda a, b: F.when(a["weight"] > b["weight"], -1)
        .when(a["weight"] < b["weight"], 1)
        .otherwise(F.when(a["ord"] < b["ord"], -1).when(a["ord"] > b["ord"], 1).otherwise(0)),
    )
    valued = F.filter(arr, lambda x: x["ptype"].isin(*sorted(VALUE_TYPES)))
    first = F.get(valued, 0)  # NULL when no valued pattern matched (never throws)
    is_btn = _is_button(F.col("type"), F.col("tag"))
    return fields.select(
        *id_cols,
        F.when(is_btn, F.lit(None).cast("string")).otherwise(first["ptype"]).alias("fill_type"),
        (is_btn | first.isNotNull()).alias("filled"),
        is_btn.alias("is_button"),
    )


def form_fill_report(plan: DataFrame, form_cols: list[str]) -> DataFrame:
    """Per-form outcome: fill percentage (A5, pageUtils.js:126-132 /
    tripwire.js:185-206) + required-set verification (tripwire.js:269-287)
    + the 55% threshold (tripwire.js:1,282-287).

    Status: 'ok' | 'missing_required' (exit 33) | 'below_threshold'
    (exit 32)."""
    agg = plan.groupBy(*form_cols).agg(
        F.count("*").alias("n_fields"),
        F.sum(F.col("filled").cast("int")).alias("n_filled"),
        F.round(F.sum(F.col("filled").cast("int")) * 100.0 / F.count("*"), 1).alias("fill_pct"),
        *[
            F.max((F.col("fill_type") == t).cast("boolean")).alias(f"has_{t}")
            for t in sorted(REQUIRED_SET)
        ],
    )
    missing = ~F.coalesce(F.col("has_email"), F.lit(False)) | ~F.coalesce(
        F.col("has_password"), F.lit(False)
    )
    return agg.select(
        *form_cols,
        "n_fields",
        "n_filled",
        "fill_pct",
        F.when(missing, F.lit("missing_required"))
        .when(F.col("fill_pct") < MIN_PERCENT_COMPLETE, F.lit("below_threshold"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def recaptcha_gate(df: DataFrame, html_col: str = "html") -> DataFrame:
    """F11: the recaptcha kill-switch (tripwire.js:122-134) — drop pages
    whose raw HTML contains 'recaptcha' (exit 57) before the fill stage."""
    h = F.col(html_col).cast("string")
    return df.filter(~F.coalesce(h.contains("recaptcha"), F.lit(False)))
