"""Corpus weighting operators (operators/weighting.py): tf-idf top-k,
temperature-scaled domain mixture, DSIR importance scores."""

import math

import pyspark.sql.functions as F

from tripwire_spark.operators.weighting import (
    domain_mixture,
    dsir_importance,
    tfidf_top_terms,
)


def _docs(spark):
    rows = [
        # (doc_id, text, lang, source): two "en"-ish sources, one "noise"
        (1, "the cat sat on the mat the cat cat", "en", "web"),
        (2, "the dog sat on the log", "en", "web"),
        (3, "quantum flux capacitor drives the warp core", "en", "books"),
        (4, "zzz qqq zzz qqq zzz", "und", "spam"),
        (5, "", "und", "spam"),  # empty doc: no terms, no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_tfidf_ranks_distinctive_terms_first(spark):
    out = tfidf_top_terms(_docs(spark), "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc with terms got <= k rows, ranked 1..k, scores non-increasing
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i].tfidf >= rs[i + 1].tfidf for i in range(len(rs) - 1))
    # "cat" appears twice in doc 1 and nowhere else -> it must outrank
    # the corpus-wide "the" for doc 1
    assert by_doc[1][0].term == "cat"
    # empty doc contributes no rows
    assert 5 not in by_doc


def test_tfidf_idf_formula(spark):
    # "the" occurs in docs 1,2,3 (df=3, N=5): idf = ln(6/4)+1
    out = {(r.doc_id, r.term): r for r in tfidf_top_terms(_docs(spark), k=10).collect()}
    r = out[(2, "the")]
    idf = round(math.log(6 / 4) + 1, 6)
    assert abs(r.tfidf - round(2 / 6 * idf, 6)) < 1e-9  # 2 of 6 tokens


def test_domain_mixture_weights(spark):
    out = {r.source: r for r in domain_mixture(_docs(spark), alpha=0.5).collect()}
    assert set(out) == {"web", "books", "spam"}
    # weights sum to ~1 and follow sqrt(token count) ordering
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-5
    assert out["web"].n_tokens == 15 and out["books"].n_tokens == 7
    assert out["spam"].n_tokens == 5  # empty doc adds 0 tokens
    assert out["web"].weight > out["books"].weight > out["spam"].weight
    # alpha=0 is uniform
    uni = {r.source: r.weight for r in domain_mixture(_docs(spark), alpha=0.0).collect()}
    assert all(abs(w - round(1 / 3, 6)) < 1e-5 for w in uni.values())


def test_dsir_scores_target_like_docs_higher(spark):
    d = _docs(spark)
    out = {r.doc_id: r for r in dsir_importance(d, F.col("lang") == "en").collect()}
    # every doc present exactly once; gramless doc scores 0 with 0 grams
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[5].n_grams == 0 and out[5].dsir_score == 0.0
    # en-doc bigrams dominate the target slice: en docs score above the
    # spam doc whose grams only ever appear in the rest slice
    assert min(out[i].dsir_score for i in (1, 2, 3)) > out[4].dsir_score
    assert out[1].n_grams == 8  # 9 tokens -> 8 bigrams


def test_dsir_deterministic_across_partitionings(spark):
    d = _docs(spark)
    a = dsir_importance(d.repartition(1), F.col("lang") == "en").collect()
    b = dsir_importance(d.repartition(7), F.col("lang") == "en").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_curation_verdicts_precedence_and_dedup(spark):
    """First failed gate wins: quality beats repetition beats language
    beats duplicate; exact dups keep the lowest id."""
    from tripwire_spark.operators.textstats import curation_verdicts

    good = ("the quick brown fox jumps over a lazy dog and it runs to "
            "the old stone bridge of this quiet town in early morning light")
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good),                      # exact dup of 1 -> 'duplicate'
            (3, "tiny doc"),                # < 20 tokens -> 'quality'
            (4, ("der alte mann und die junge frau gehen mit ein kleines kind "
                 "durch das stille dorf es ist nicht weit ich sehe du kommst heute")),
            (5, "spam " * 40),              # one token repeated -> repetition? mtl/token gates?
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation_verdicts(docs, langs=("en",)).collect()}
    assert out[1].verdict == "keep" and out[1].keep
    assert out[2].verdict == "duplicate" and not out[2].keep
    assert out[3].verdict == "quality"
    assert out[4].verdict == "language" and out[4].pred_lang == "de"
    assert out[5].verdict == "repetition"  # dup-2gram fraction ~1


def test_mixture_sample_budget_and_determinism(spark):
    from tripwire_spark.operators.weighting import mixture_sample

    rows = [(i, "tok " * 50, "en", "big" if i < 400 else "small") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = mixture_sample(docs, budget_frac=0.3).collect()
    n = len(got)
    assert 0.2 * 500 < n < 0.45 * 500  # ~30% of the corpus (md5 binomial spread)
    # temperature up-weights the small domain relative to its size
    frac_small = len([r for r in got if r.source == "small"]) / 100
    frac_big = len([r for r in got if r.source == "big"]) / 400
    assert frac_small > frac_big
    # byte-identical at any partitioning
    again = mixture_sample(docs.repartition(11), budget_frac=0.3).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in got)


def test_domain_scorecard_consistent_with_verdicts(spark):
    from tripwire_spark.operators.textstats import curation_verdicts, domain_scorecard

    good = "the of is " + " ".join(f"word{i}" for i in range(20))
    rows = [
        (0, good + " alpha", "s1"),
        (1, good + " beta", "s1"),
        (2, "short", "s1"),                      # quality fail
        (3, good + " gamma", "s2"),              # distinct content -> keep
        (4, good + " gamma", "s2"),              # exact dup of doc 3 -> duplicate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    card = {r.source: r for r in domain_scorecard(docs, group_col="source").collect()}
    v = curation_verdicts(docs, carry=("source",)).collect()
    # the rollup is exactly the verdict histogram per source
    from collections import Counter
    hist = {s: Counter() for s in ("s1", "s2")}
    for r in v:
        hist[r.source][r.verdict] += 1
    for s in ("s1", "s2"):
        c = card[s]
        assert c.n_docs == sum(hist[s].values())
        assert c.n_keep == hist[s]["keep"]
        assert c.n_quality == hist[s]["quality"]
        assert c.n_duplicate == hist[s]["duplicate"]
        assert c.keep_rate6 == round(c.n_keep * 1e6 / c.n_docs)
    assert card["s2"].n_duplicate == 1

    # carry rides the projection: no join back onto the corpus
    plan = (
        domain_scorecard(docs, group_col="source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan


def test_bpe_tokens_shape(spark):
    import pyspark.sql.functions as F

    from tripwire_spark.operators.textstats import bpe_token_count, bpe_tokens

    df = spark.createDataFrame(
        [("Hello world, it's 2026! don't stop... x9y",), ("",), ("   ",)], "t string"
    )
    rows = df.select(
        bpe_tokens(F.col("t")).alias("toks"), bpe_token_count(F.col("t")).alias("n")
    ).collect()
    assert rows[0].toks == [
        "Hello", " world", ",", " it", "'s", " 2026", "!", " don", "'t",
        " stop", "...", " x", "9", "y",
    ]
    assert rows[0].n == 14
    assert rows[1].n == 0          # empty text
    assert rows[2].toks == ["   "]  # whitespace run is one pre-token
    # splits are lossless: concatenation reproduces the input
    assert "".join(rows[0].toks) == "Hello world, it's 2026! don't stop... x9y"


def test_sentence_segmentation(spark):
    import pyspark.sql.functions as F

    from tripwire_spark.operators.textstats import sentences

    cases = {
        "One sentence. Two! Three? And a tail": ["One sentence.", "Two!", "Three?", "And a tail"],
        "": [],
        "   ": [],
        "No terminator at all": ["No terminator at all"],
        "Dots... everywhere!! ok?": ["Dots...", "everywhere!!", "ok?"],
    }
    df = spark.createDataFrame([(t,) for t in cases], "t string")
    got = {r.t: r.s for r in df.select("t", sentences(F.col("t")).alias("s")).collect()}
    for t, want in cases.items():
        assert got[t] == want, (t, got[t])


def test_vocab_induce_rank_and_bounds(spark):
    from tripwire_spark.operators.weighting import vocab_induce

    d = _docs(spark)
    v = vocab_induce(d, "text", size=5, min_count=2).collect()
    assert [r.token_id for r in v] == list(range(1, len(v) + 1))
    assert len(v) <= 5
    # "the" dominates the fixture corpus
    assert v[0].token == "the"
    # ranks strictly by (n desc, token asc)
    pairs = [(-r.n, r.token) for r in v]
    assert pairs == sorted(pairs)
    # min_count respected
    assert all(r.n >= 2 for r in v)


def test_vocab_induce_plan_is_topk_not_global_sort(spark):
    from tripwire_spark.operators.weighting import vocab_induce

    d = _docs(spark)
    plan = vocab_induce(d, "text", size=5)._jdf.queryExecution().executedPlan().toString()
    # the web-scale token table must go through distributed top-k, never
    # a global Sort of all distinct tokens
    assert "TakeOrderedAndProject" in plan, plan
