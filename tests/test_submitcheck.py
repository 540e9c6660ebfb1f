"""Submitcheck decision table, hand-traced against
submitcheck.js:144-264 (pre/post keyword delta, retry-once fold,
ec 70/71 mapping)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _attempts(spark, rows):
    cols = [
        "page_id", "pre_url", "pre_text", "post_url", "post_text",
        "post_form_exists", "post_is_reg", "retry_url", "retry_text",
        "retry_form_exists", "retry_is_reg",
    ]
    return spark.createDataFrame(rows, cols)


def test_submit_check_decision_table(spark):
    from tripwire_spark.operators.submitcheck import submit_check

    reg, done = "http://a.test/register", "http://a.test/done"
    rows = [
        # 1: clean pass — form gone, not reg, no new keywords, url moved
        (1, reg, "Register sign up", done, "welcome", False, False, done, "welcome", False, False),
        # 2: form survives first click, retry succeeds -> retried + pass
        (2, reg, "Register", reg, "Register error", True, True, done, "thanks", False, False),
        # 3: form survives the retry too -> ec 70
        (3, reg, "Register", reg, "Register", True, True, reg, "Register", True, True),
        # 4: form gone but still a registration page -> ec 71
        (4, reg, "Register", done, "sign up here", False, True, done, "sign up here", False, True),
        # 5: ERROR keywords increased (pre has 1 'error', post has 2+warning)
        (5, reg, "one error", done, "error error warning", False, False, done, "x", False, False),
        # 6: COMEON keywords increased post-submit
        (6, reg, "plain page", done, "please registe-- regist again regist", False, False, done, "x", False, False),
        # 7: url unchanged -> warn-fail, ec 0
        (7, reg, "Register", reg, "welcome", False, False, reg, "welcome", False, False),
    ]
    out = {r.page_id: r for r in submit_check(_attempts(spark, rows)).collect()}

    assert out[1].passed and out[1].ec == 0 and not out[1].retried
    assert out[2].passed and out[2].ec == 0 and out[2].retried
    # retry row: the FINAL page (post-retry) is what gets tested — the
    # intermediate 'Register error' text never counts
    assert out[2].n_err_post == 0 and out[2].errors_ok

    assert not out[3].passed and out[3].ec == 70 and out[3].retried
    assert not out[4].passed and out[4].ec == 71 and out[4].form_gone

    assert not out[5].passed and out[5].ec == 0
    assert not out[5].errors_ok and out[5].n_err_pre == 1 and out[5].n_err_post == 3

    assert not out[6].passed and not out[6].comeons_ok and out[6].n_comeon_post == 3

    assert not out[7].passed and out[7].ec == 0 and not out[7].url_changed
    assert out[7].form_gone and out[7].not_reg_page and out[7].errors_ok


def test_count_keywords_per_pattern_not_alternation(spark):
    """countKeywords sums PER-PATTERN global match counts
    (submitcheck.js:130-141): 'sign in ... sign up' scores 2 (one per
    pattern) even though a single consuming alternation pass could
    score differently; '.' must not cross newlines (JS /g semantics)."""
    from tripwire_spark.operators.submitcheck import COMEON_KEYWORDS, count_keywords

    df = spark.createDataFrame(
        [("sign in and then sign up",), ("sign\nup",), ("registration sign-up",)], ["t"]
    )
    got = [r.n for r in df.select(count_keywords("t", COMEON_KEYWORDS).alias("n")).collect()]
    # row 1: sign.*in matches once, sign.*up matches once -> 2
    # row 2: newline blocks sign.*up -> 0
    # row 3: regist once + sign.*up ('sign-up') once -> 2
    assert got == [2, 0, 2]


def test_submit_check_plan_is_single_stage(spark):
    """The verdict is a pure scan-side projection: zero joins, zero
    exchanges — the 100 TB shape (attempts stream through one codegen
    stage, same discipline as the formfiller walk)."""
    from tripwire_spark.operators.submitcheck import submit_check

    rows = [(1, "a", "b", "c", "d", False, False, "e", "f", False, False)]
    plan = (
        submit_check(_attempts(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
