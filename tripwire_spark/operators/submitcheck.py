"""Post-submit verification state machine (submitcheck).

Reference parity: ``casperjs/iframe/submitcheck/submitcheck.js``.
The live flow is: sleep, record (url, ERROR-keyword count,
COMEON-keyword count) on the pre-submit page (submitcheck.js:144-158),
click the best submit candidate (:163-192), and if the registration
form STILL exists re-click once (reClick, :199-223); then run the
verdict tests on the final page (scTests, :225-264):

- form still present        -> exit code 70 ("Registration still exists!")
- still a registration page -> exit code 71 ("Still on a registration page!")
- ERROR keywords increased  -> warn, all_passed = false  (:246-251)
- COMEON keywords increased -> warn, all_passed = false  (:253-257)
- URL unchanged             -> warn, all_passed = false  (:259-263)

The batch restatement: the DOM probes the browser performs
(``page.exists(form_selector)``, ``formfind.isRegPage``) arrive as
boolean columns on the attempts table — they belong to the fetch layer,
exactly like the html bytes themselves.  This operator owns the
*decision*: the pre/post keyword **delta**, the retry-once fold, and
the exit-code mapping, all as one codegen'd projection — zero joins,
zero shuffles, the fields stream through a single stage (the same
100 TB shape as the formfiller walk).

Keyword counting matches ``countKeywords`` (submitcheck.js:130-141):
each pattern is matched globally and the PER-PATTERN match counts are
summed — NOT one alternation pass, which consumes overlapping spans
differently (e.g. "sign in … sign up" scores 2 with per-pattern /g
counts but can score 1 with an alternation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# submitcheck.js:6-9 — /warning/ig, /error/ig, /invalid/ig
ERROR_KEYWORDS = ["warning", "error", "invalid"]
# submitcheck.js:11-14 — /regist/ig, /sign.*in/ig, /sign.*up/ig
COMEON_KEYWORDS = ["regist", "sign.*in", "sign.*up"]

EC_FORM_STILL_EXISTS = 70  # submitcheck.js:230
EC_STILL_REG_PAGE = 71  # submitcheck.js:236


def count_keywords(text, patterns: list[str]) -> Column:
    """Sum of per-pattern global match counts over ``text``
    (countKeywords, submitcheck.js:130-141).  Case-insensitive like the
    /ig flags; ``.`` does not cross newlines in JS, Java, or RE2, so
    the three engines agree."""
    t = F.col(text) if isinstance(text, str) else text
    n = F.lit(0)
    for p in patterns:
        n = n + F.size(F.regexp_extract_all(t, F.lit(f"(?i){p}"), 0))
    return n.cast("long")


def submit_check(attempts: DataFrame) -> DataFrame:
    """Per-attempt submit verdict (scTests, submitcheck.js:225-264) with
    the retry-once fold (reClick, :199-223).

    Expected columns on ``attempts``:
      page_id, pre_url, pre_text,
      post_url, post_text, post_form_exists, post_is_reg,
      retry_url, retry_text, retry_form_exists, retry_is_reg
    The retry_* columns describe the page after the second click; they
    are only consulted when the form survived the first submit (the
    reference re-clicks exactly once, then tests whatever it got).
    """
    retried = F.col("post_form_exists")
    final_url = F.when(retried, F.col("retry_url")).otherwise(F.col("post_url"))
    final_text = F.when(retried, F.col("retry_text")).otherwise(F.col("post_text"))
    final_form = F.when(retried, F.col("retry_form_exists")).otherwise(F.col("post_form_exists"))
    final_reg = F.when(retried, F.col("retry_is_reg")).otherwise(F.col("post_is_reg"))

    n_err_pre = count_keywords("pre_text", ERROR_KEYWORDS)
    n_err_post = count_keywords(final_text, ERROR_KEYWORDS)
    n_come_pre = count_keywords("pre_text", COMEON_KEYWORDS)
    n_come_post = count_keywords(final_text, COMEON_KEYWORDS)

    form_gone = ~final_form
    not_reg_page = ~final_reg
    errors_ok = n_err_post <= n_err_pre
    comeons_ok = n_come_post <= n_come_pre
    url_changed = final_url != F.col("pre_url")
    passed = form_gone & not_reg_page & errors_ok & comeons_ok & url_changed

    return attempts.select(
        "page_id",
        retried.alias("retried"),
        n_err_pre.alias("n_err_pre"),
        n_err_post.alias("n_err_post"),
        n_come_pre.alias("n_comeon_pre"),
        n_come_post.alias("n_comeon_post"),
        form_gone.alias("form_gone"),
        not_reg_page.alias("not_reg_page"),
        errors_ok.alias("errors_ok"),
        comeons_ok.alias("comeons_ok"),
        url_changed.alias("url_changed"),
        passed.alias("passed"),
        # tw_die exit codes; warn-only failures exit 0 like the reference
        F.when(final_form, F.lit(EC_FORM_STILL_EXISTS))
        .when(final_reg, F.lit(EC_STILL_REG_PAGE))
        .otherwise(F.lit(0))
        .alias("ec"),
    )
