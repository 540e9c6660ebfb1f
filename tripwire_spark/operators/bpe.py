"""Distributed BPE merge training — learn a byte-pair-encoding merge
list from the corpus itself (Sennrich et al. 2016; the GPT-2 tokenizer
family), the step between ``weighting.vocab_induce`` (word-level) and
an actual subword tokenizer.

Scale design, the part that matters at 100 TB: merges operate on the
WORD VOCABULARY, not the corpus.  One pass pre-tokenizes and collapses
the corpus to (word, count) — bounded by distinct-word count, millions
of rows at web scale, i.e. tiny next to the corpus — and every merge
iteration touches only that table.  Per iteration: a zip-shifted
adjacent-pair explode (narrow), ONE partial-agg groupBy(pair) whose
map-side combine absorbs the Zipf skew, a 1-row argmax collect (the
same driver-loop discipline as graph.pagerank), and a map-only rewrite.

The symbol-sequence representation is a DOUBLE-fenced string — chr(31)
PAIRS separate symbols ('ab' seeds as '<SS>a<SS>b<SS>') — because the
BPE merge rewrite is then exactly ``replace(syms, S+l+SS+r+S,
S+lr+S)``: the pattern consumes only the INNER fence of each boundary
pair, so after a match the scan resumes on a string that still starts
with a full fence, and left-to-right non-overlapping replace becomes
EXACTLY greedy BPE merge order.  (Single fences fail precisely here:
the match eats the trailing fence, so a run [a,a,a,a] merges to
[aa,a,a] instead of [aa,aa].)  A pattern can never match inside a
symbol: symbols contain no fences, so 'fence+l' aligns only at symbol
starts.  The rewrite is pure whole-stage-codegen string work; no HOF
recapture, no UDF.

Tie-break: highest count, then lexicographically smallest (left,
right) — total and engine-portable, so a trained merge list is
byte-stable across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tripwire_spark.operators.textstats import bpe_tokens

SEP = "\x1f"


def _seed_syms(word: Column) -> Column:
    """'ab' -> '<SS>a<SS>b<SS>': every character its own double-fenced
    symbol.  DOTALL is load-bearing: Java '.' excludes line terminators
    (\\r, \\u2028, ...) so a bare ``(.)`` would leave such characters
    unfenced — producing a fence-less string whose interior slice has
    negative length (crash) or silently dropped characters; (?s) also
    restores parity with the RE2 oracle, whose '.' matches \\r."""
    return F.concat(
        F.lit(SEP), F.regexp_replace(word, "(?s)(.)", SEP + "$1" + SEP), F.lit(SEP)
    )


def word_vocab(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over the GPT-2-style pre-token stream — the one
    corpus-sized pass; everything downstream works on this table.
    Words containing the fence char are dropped (unrepresentable; never
    occur in real text); words containing newlines are dropped as a
    SEMANTIC choice mirrored by the oracle — merges spanning a line
    break are worthless to a tokenizer."""
    w = docs.select(F.explode(bpe_tokens(F.col(text_col))).alias("word"))
    return (
        w.filter(~F.col("word").contains(SEP) & ~F.col("word").contains("\n"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the fenced vocab, weighted by
    word count.  Zip-shifted slices (the dedup.word_ngrams discipline —
    no HOF recapture): splitting on the fence PAIR gives
    ['', s1..sm, ''], symbols are the interior slice."""
    a = F.split(F.col("syms"), SEP + SEP)
    syms = F.slice(a, 2, F.size(a) - 2)
    lefts = F.slice(syms, 1, F.size(syms) - 1)
    rights = F.slice(syms, 2, F.size(syms) - 1)
    z = state.select(
        "cnt", F.explode(F.arrays_zip(lefts.alias("l"), rights.alias("r"))).alias("p")
    )
    return z.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("cnt").alias("pair_cnt"))


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merges; returns [(left, right,
    pair_count)] in rank order.  Stops early when the best pair falls
    under ``min_count``.  ``checkpoint_every`` truncates the rewrite
    chain's lineage (the graph.pagerank discipline) — each rewrite adds
    one replace() to the plan, and m stacked string ops are cheap to
    RUN but quadratic to re-ANALYZE."""
    vocab = word_vocab(docs, id_col, text_col)
    state = vocab.select(_seed_syms(F.col("word")).alias("syms"), "cnt")
    state = state.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        best = (
            _pair_counts(state)
            .orderBy(F.col("pair_cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_cnt"] < min_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["pair_cnt"])
        merges.append((left, right, cnt))
        pat = SEP + left + SEP + SEP + right + SEP
        rep = SEP + left + right + SEP
        state = state.withColumn("syms", F.replace("syms", F.lit(pat), F.lit(rep)))
        if (r + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return merges


def bpe_apply(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Segment a pre-token by a learned merge list: seed to characters,
    replay every merge in rank order (the exact replace() chain
    training ran), return the symbol ARRAY.  A bounded-m expression
    chain — for production-sized merge lists (32k+), export the merges
    and run a real tokenizer; this column form is for in-pipeline
    segmentation and oracle checking."""
    s = _seed_syms(word)
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(SEP + left + SEP + SEP + right + SEP),
            F.lit(SEP + left + right + SEP),
        )
    a = F.split(s, SEP + SEP)
    return F.slice(a, 2, F.size(a) - 2)


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_pieces, pieces) per document under a merge list: the
    pre-token stream re-segmented subword-wise and re-flattened.
    Zero shuffles — explode + segment + partial-agg groupBy(id)."""
    seg = (
        docs.select(
            F.col(id_col), F.posexplode(bpe_tokens(F.col(text_col))).alias("pos", "word")
        )
        # fence chars are unrepresentable (the SEP guard shared with
        # word_vocab; the newline drop is a training-only word_vocab
        # choice NOT applied here — segmentation keeps such words, see
        # test_bpe_survives_line_terminators); dropped pre-tokens mean
        # reconstruction equals the FILTERED token stream
        .filter(~F.col("word").contains(SEP))
        .select(id_col, "pos", bpe_apply(F.col("word"), merges).alias("pieces"))
    )
    # collect_list order is partition-dependent; the sort on the carried
    # position restores document order deterministically
    ordered = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
            lambda s: s["pieces"],
        )
    )
    return seg.groupBy(id_col).agg(
        F.sum(F.size("pieces")).cast("long").alias("n_pieces"),
        ordered.alias("pieces"),
    )
