"""Formfiller (C19/W6) parity tests.

Semantics traced from casperjs/iframe/formfiller/expressions.js:1-224
and formfiller.js:296-377,693-742; values/required set from
identities/make_conf/conf_template.txt.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tripwire_spark.functions.formfill import (
    ALL_ATTRS,
    EXPANDED_PATTERNS,
    FIELD_ATTRS,
    FIELD_PATTERNS,
    REQUIRED_SET,
    VALUE_TYPES,
    best_field_pattern,
    field_pattern_matches,
    fill_plan,
    form_fill_report,
    recaptcha_gate,
)


_ATTR_SCHEMA = ", ".join(f"`{a}` string" for a in FIELD_ATTRS)


def _fields_df(spark, rows):
    return spark.createDataFrame(
        [tuple([k] + [r.get(a) for a in FIELD_ATTRS]) for k, r in rows],
        f"fkey long, {_ATTR_SCHEMA}",
    )


def test_pattern_table_shape():
    # 71 declared patterns (expressions.js:1-224); "all" = 6 attrs, not 8
    assert len(FIELD_PATTERNS) == 71
    assert ALL_ATTRS == ["id", "name", "value", "label", "placeholder", "near_text"]
    n_all = sum(1 for _, a, _r, _w, _d in FIELD_PATTERNS if a == "all")
    assert len(EXPANDED_PATTERNS) == n_all * 6 + (len(FIELD_PATTERNS) - n_all)
    # declaration order is strictly increasing and dense
    assert [e[0] for e in EXPANDED_PATTERNS] == list(range(len(EXPANDED_PATTERNS)))
    # captcha/maidenname have no configured values (conf_template.txt)
    assert "captcha" not in VALUE_TYPES and "maidenname" not in VALUE_TYPES
    assert REQUIRED_SET == {"email", "password"}


def test_email_type_beats_all(spark):
    # type="email" w10 outranks .*e-?mail.* w7 (expressions.js:63-81)
    df = _fields_df(spark, [(1, {"id": "email", "name": "email", "type": "email", "tag": "input"})])
    best = best_field_pattern(field_pattern_matches(df, ["fkey"]), ["fkey"]).collect()[0]
    assert (best["ptype"], best["attr"], best["weight"], best["die_on_fail"]) == (
        "email", "type", 10.0, True,
    )


def test_undefined_attrs_skipped(spark):
    # NULL attr = undefined -> never tested (formfiller.js:349-357)
    df = _fields_df(spark, [(1, {"name": "password", "tag": "input"})])
    m = field_pattern_matches(df, ["fkey"]).collect()
    # only the all-attr password pattern on name; the type-pattern can't fire
    assert {(r["ptype"], r["attr"]) for r in m} == {("password", "name")}


def test_stable_tiebreak_declaration_order(spark):
    # 'bday_year': year w2 via placeholder YYYY (pattern .*yy, earlier
    # pidx) beats year w2 via id (.*year.*) on the ord tie-break
    df = _fields_df(
        spark,
        [(1, {"id": "bday_year", "name": "year", "type": "text", "tag": "input", "placeholder": "YYYY"})],
    )
    best = best_field_pattern(field_pattern_matches(df, ["fkey"]), ["fkey"]).collect()[0]
    assert (best["ptype"], best["pattern"], best["attr"]) == ("year", ".*yy", "placeholder")


def test_fill_walk_skips_unvalued_types(spark):
    # captcha matches but has no value -> unfilled (formfiller.js:718-721);
    # buttons are trivially successful (formfiller.js:693-697)
    df = _fields_df(
        spark,
        [
            (1, {"id": "captcha_input", "name": "captcha", "type": "text", "tag": "input"}),
            (2, {"id": "submit_btn", "type": "submit", "tag": "input", "value": "Go!"}),
            (3, {"id": "user_name", "name": "username", "type": "text", "tag": "input"}),
        ],
    )
    plan = {r["fkey"]: r for r in fill_plan(df, ["fkey"]).collect()}
    assert plan[1]["filled"] is False and plan[1]["fill_type"] is None
    assert plan[2]["filled"] is True and plan[2]["is_button"] is True and plan[2]["fill_type"] is None
    assert plan[3]["filled"] is True and plan[3]["fill_type"] == "username"


def test_form_report_required_and_threshold(spark):
    # form 1: no email field -> missing_required (tripwire.js:269-280)
    # form 2: email+password filled, >=55% -> ok
    # form 3: only captchas filled below 55% -> below_threshold is
    #   unreachable without required fields, so plant email+password plus
    #   many captcha fields to drive pct below 55 (tripwire.js:282-287)
    rows = [
        ((1, 1), {"id": "pass", "type": "password", "tag": "input"}),
        ((1, 2), {"id": "user_name", "tag": "input"}),
        ((2, 1), {"id": "email", "type": "email", "tag": "input"}),
        ((2, 2), {"id": "pass", "type": "password", "tag": "input"}),
    ] + [((3, 1), {"id": "email", "type": "email", "tag": "input"}),
         ((3, 2), {"id": "pass", "type": "password", "tag": "input"})] + [
        ((3, i), {"id": f"captcha_{i}", "name": "captcha", "tag": "input"}) for i in range(3, 8)
    ]
    df = spark.createDataFrame(
        [tuple([fk, i] + [r.get(a) for a in FIELD_ATTRS]) for (fk, i), r in rows],
        f"form long, fpos long, {_ATTR_SCHEMA}",
    )
    plan = fill_plan(df, ["form", "fpos"])
    rep = {r["form"]: r for r in form_fill_report(plan, ["form"]).collect()}
    assert rep[1]["status"] == "missing_required"
    assert rep[2]["status"] == "ok" and rep[2]["fill_pct"] == 100.0
    assert rep[3]["status"] == "below_threshold"
    assert rep[3]["n_filled"] == 2 and rep[3]["n_fields"] == 7


def test_extract_form_fields_plumbing(spark):
    from tripwire_spark.functions.html import extract_form_fields

    html = """
    <html><body>
    <p>Make an account today</p>
    <form action="/register" id="signup">
      <label for="em">E-mail address</label>
      <input id="em" name="email" type="email">
      Choose a password
      <input name="password" type="password" placeholder="Password">
      <select name="state"></select>
      <input type="submit" value="Sign up">
    </form>
    </body></html>
    """
    df = spark.createDataFrame([(html,)], ["html"])
    fields = (
        df.select(F.explode(extract_form_fields("html")).alias("f"))
        .select("f.*")
        .collect()
    )
    by_name = {r["name"]: r for r in fields}
    assert by_name["email"]["label"] == "E-mail address"
    assert by_name["email"]["type"] == "email"
    # near_text gate 3..26 chars (formfiller.js:262-277)
    assert by_name["password"]["near_text"] == "Choose a password"
    assert by_name["state"]["tag"] == "select"
    assert by_name[None]["value"] == "Sign up"  # the submit button row
    # end-to-end: the matcher consumes extracted fields directly
    fdf = df.select(F.explode(extract_form_fields("html")).alias("f")).select("f.*")
    plan = {r["pos"]: r for r in fill_plan(fdf, ["pos"]).collect()}
    assert plan[0]["fill_type"] == "email"
    assert plan[1]["fill_type"] == "password"
    assert plan[3]["is_button"] is True


def test_recaptcha_gate(spark):
    # F11: tripwire.js:122-134 — page dies before fill on 'recaptcha'
    df = spark.createDataFrame(
        [(1, "<form>ok</form>"), (2, "<div class='g-recaptcha'></div>")], ["k", "html"]
    )
    assert [r["k"] for r in recaptcha_gate(df).collect()] == [1]
