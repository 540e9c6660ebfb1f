"""Deduplication family for web-scale corpora: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Everything below is pure DataFrame algebra (explode / groupBy / join /
bit ops) — no Python in the row path.  Scale notes per operator:

- exact:       one hash-groupBy; content hash is computed in the scan
               projection so the shuffle carries 16 bytes, not bodies.
- ngram exact: shingle self-join — quadratic in the worst case; used
               as the *verifier* behind LSH candidates, never alone at
               scale.
- minhash+lsh: signature = K min-hashes from ONE shingle pass (K
               aggregates, one shuffle); banding turns all-pairs into
               |bucket|-local joins.  Band width/count chosen for
               recall ~1 at the target threshold.
- simhash:     64-bit sign-vote fingerprint; candidate pairs via the
               4x16-bit pigeonhole chunk join (hamming<=3 implies an
               identical chunk), then exact bit_count verify.
- embedding:   cosine >= tau pairs; brute force is the correctness
               baseline, sign-LSH bucketing is the scale path
               (similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- shingling -----------------------------------------------------------


def word_ngrams(toks, n: int):
    """Word n-gram array by zipping n shifted slices of the token
    array.  NEVER built as transform-over-index with F.slice(toks, i,
    n) inside the lambda: a lambda capturing an outer array expression
    re-evaluates it per ELEMENT (measured 18x slower at sf0.1 in
    textstats.repetition_features before the same fix).  Also correct
    for docs shorter than n tokens (empty array; the sequence form
    emitted a descending [1,0] index and a slice-from-0 error path)."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, length)
    for j in range(1, n):
        out = F.zip_with(
            out, F.slice(toks, 1 + j, length), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return out


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (pure exprs)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(word_ngrams(toks, n)).alias("shingle"))
        .distinct()
    )


def exact_jaccard_pairs(sh: DataFrame, threshold: float = 0.8) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= threshold.

    sh: output of ``shingles``.  Returns (doc_a, doc_b, jaccard).
    """
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --- MinHash + LSH -------------------------------------------------------


def minhash_signatures(sh: DataFrame, k: int = 64) -> DataFrame:
    """K min-hash values per doc from one grouped pass.

    Permutation i is xxhash64(shingle, i) — deterministic, JVM-side.
    Returns (doc, sig array<long>).
    """
    aggs = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"m{i}") for i in range(k)]
    g = sh.groupBy("doc").agg(*aggs)
    return g.select("doc", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"))


def band_buckets(sigs: DataFrame, bands: int = 32, rows: int = 2) -> DataFrame:
    """(doc, band, bkey) bucket rows — the LSH join key material.  Split
    out of ``lsh_candidates`` so an INDEX of these rows can be persisted
    and new batches joined against it incrementally."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)]).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select("doc", F.explode(band_structs).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )


def lsh_candidates(sigs: DataFrame, bands: int = 32, rows: int = 2) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    P(candidate | jaccard j) = 1 - (1 - j^rows)^bands; at (32,2) a
    j=0.8 pair is missed with p ~ 4e-14.
    """
    buckets = band_buckets(sigs, bands, rows)
    a = buckets.select(F.col("doc").alias("doc_a"), "band", "bkey")
    b = buckets.select(F.col("doc").alias("doc_b"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def candidate_jaccard(cands: DataFrame, sh: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact Jaccard for CANDIDATE pairs only — the sub-quadratic verify.

    The shingle table is joined to the candidate pairs on each side
    (doc_a, then (doc_b, shingle)), so intersections are computed only
    where LSH proposed a pair.  Both joins are linear in
    |candidate-pair shingles|; the all-pairs shingle self-join of
    ``exact_jaccard_pairs`` never happens.
    """
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 64,
    bands: int = 32,
    rows: int = 2,
    threshold: float = 0.8,
    materialize: bool = False,
) -> DataFrame:
    """Full pipeline: shingle -> minhash -> band join -> verify
    candidates only.

    Output pairs carry exact Jaccard (candidates are verified, so false
    positives from banding never escape; recall is 1-(1-t^r)^b).  The
    verification step intersects shingle sets ONLY for LSH candidate
    pairs (``candidate_jaccard``) — this is what makes MinHash-LSH
    sub-quadratic; tests/test_plans.py pins that no bare-shingle-key
    self-join remains in the plan.
    """
    sh = shingles(df, id_col, text_col, n)
    if materialize:
        # OPT-IN: the shingle table feeds THREE consumers (signatures +
        # both verify sides); without materialization each one re-scans
        # and re-shingles the corpus (measured 8.7 s -> 3.6 s at
        # sf0.1).  Off by default because (a) it makes DataFrame
        # CONSTRUCTION run a job, and (b) localCheckpoint truncates
        # lineage — on a cluster that loses an executor the checkpointed
        # blocks are unrecoverable and the job fails instead of
        # recomputing.  Turn on for single-box batch runs (the bench
        # does); on a real cluster prefer persisting `shingles(...)`
        # to reliable storage and passing the pieces yourself.
        sh = sh.localCheckpoint(eager=True)
    cands = lsh_candidates(minhash_signatures(sh, k), bands, rows)
    return candidate_jaccard(cands, sh, threshold)


# --- SimHash -------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: bit i = sign of token votes on bit i of
    xxhash64(token).  One explode + one grouped agg (64 sums)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig + F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63))).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select("doc", sig.alias("simhash"))


def simhash_pairs(sim: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Near-dup pairs by hamming distance via the pigeonhole chunk join:
    hamming <= 7 over 64 bits => at least one of the 8 8-bit chunks is
    identical, so candidates come from 8 equi-joins, never all-pairs."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * 8).bitwiseAND(F.lit(0xFF)).alias("ckey"),
            )
            for c in range(8)
        ]
    )
    b = sim.select("doc", "simhash", F.explode(chunks).alias("cc")).select(
        "doc", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.ckey").alias("ckey")
    )
    lhs = b.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk", "ckey")
    rhs = b.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk", "ckey")
    return (
        lhs.join(rhs, ["chunk", "ckey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding cosine near-dup -------------------------------------------


def cosine(a, b):  # Column helper
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def embedding_dup_pairs_brute(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """All-pairs cosine >= threshold — the quadratic VERIFIER used by
    tests to check the bucketed path's recall; never the scale path."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Sign-LSH-bucketed near-dup pair mining + exact cosine verify.

    Candidates = pairs sharing >=1 of ``n_tables`` sign-LSH bucket keys
    (deterministic hyperplanes — similarity.lsh_table_keys), then exact
    cosine on candidates only.  Miss probability per pair is
    (1 - (1 - acos(cos)/pi)^bits)^n_tables — ~4e-6 at cos=0.9 with
    (16, 4) — vs the crossJoin's O(n^2) row blow-up.  The bucket join
    shuffles only (key, id); vectors are joined back by id for the
    verify, so the wide embedding column is never part of the
    candidate-pair shuffle.
    """
    from tripwire_spark.operators.similarity import lsh_table_keys  # local: avoids import cycle

    keys = lsh_table_keys(dim, n_tables, bits)
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    bucketed = v.select("id", F.explode(keys(F.col("v"))).alias("key"))
    cands = (
        bucketed.alias("x")
        .join(bucketed.alias("y"), "key")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    return (
        cands.join(v.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


# --- benchmark decontamination -------------------------------------------


def decontaminate(
    docs: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    eval_id_col: str,
    eval_text_col: str,
    n: int = 3,
    max_overlap: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-gram shingle set overlaps an eval/benchmark corpus (GPT-3 app. C
    style, expressed as a tunable overlap fraction instead of 13-gram
    any-hit so the same operator covers both the hard-hit and the
    fuzzy-overlap policy; any-hit = ``max_overlap=0``).

    Scale shape: the eval corpus is tiny relative to the training side
    (MBs of benchmarks vs 100 TB of web text), so its distinct shingle
    set is **broadcast** — the training shingle stream is filtered
    map-side with no shuffle against eval, and the only shuffles are
    the partially-aggregated per-doc rollups, which carry (doc, count)
    pairs, not shingles.

    Returns (doc, n_shingles, n_hits, overlap, contaminated).
    """
    doc_sh = shingles(docs, id_col, text_col, n)
    eval_sh = (
        shingles(eval_set, eval_id_col, eval_text_col, n)
        .select("shingle")
        .distinct()
    )
    totals = doc_sh.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    hits = (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        totals.join(hits, "doc", "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn(
            "overlap", F.round(F.col("n_hits") / F.col("n_shingles"), 6)
        )
        .withColumn(
            "contaminated",
            (F.col("n_hits") / F.col("n_shingles")) > F.lit(max_overlap),
        )
        .select("doc", "n_shingles", "n_hits", "overlap", "contaminated")
    )


# --- repeated-line (paragraph) dedup --------------------------------------


def dedup_lines(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    words_per_line: int = 12,
    sep: str = r"\s+",
) -> DataFrame:
    """C4-style repeated-paragraph removal: keep only the globally FIRST
    occurrence of every distinct line, rebuild each document from its
    surviving lines in original order.

    C4 (Raffel et al. 2020, app. 2.2) dropped every non-first occurrence
    of any three-sentence span corpus-wide; this is the line-granular
    version.  "Line" is a run of ``words_per_line`` tokens (the corpus
    tables carry no newlines; real crawl text would pass
    ``words_per_line=None``-style pre-split lines instead — the dedup
    core below is identical either way).

    Scale shape: ONE shuffle on the line hash (the window partitions by
    the line value; bodies travel once, as their own lines), first
    occurrence picked by the deterministic total order (doc id, line
    position), then one partial-agg rollup back to doc granularity.
    Nothing is quadratic and no state accumulates: this is the
    streaming-friendly restatement of C4's "global hash set" that a
    1000-executor corpus pass can actually run.

    Returns (doc_id, clean_text, n_lines, n_kept).
    """
    from pyspark.sql import Window

    # slice AFTER the explode, against the row's materialized token
    # column — not transform-over-starts with F.slice(toks, i, ...)
    # inside the lambda, which re-evaluates the captured split per
    # element (the word_ngrams recapture pitfall; same fix)
    toks = F.split(F.trim(F.col(text_col)), sep)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(words_per_line))
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__t"),
        F.posexplode(starts).alias("pos", "__start"),
    ).select(
        "doc_id",
        "pos",
        F.concat_ws(" ", F.slice("__t", F.col("__start"), words_per_line)).alias("line"),
    )
    w = Window.partitionBy("line").orderBy("doc_id", "pos")
    ranked = lines.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") == 1, F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_lines"),
            F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        )
        .select("doc_id", "clean_text", "n_lines", "n_kept")
    )


# --- repeated-span removal (ExactSubstr-style) -----------------------------


def remove_repeated_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    span: int = 8,
    stride: int = 1,
) -> DataFrame:
    """ExactSubstr-style dedup (Lee et al. 2022): remove every token
    covered by a ``span``-token window whose content occurs anywhere
    else in the corpus EARLIER in the total order (doc id, position) —
    the first occurrence survives intact, later copies lose the
    repeated tokens, including self-repetitions within one document.

    The published method builds a corpus suffix array offline; this is
    the Spark-native restatement over fixed-length windows: every
    ``stride``-th window is keyed by a 48-bit md5-derived hash
    (engine-portable; a cross-span collision merges two groups the
    same way in every engine — probability ~n²/2⁴⁹, negligible below
    ~10⁷ distinct spans per partition-group and harmless to the oracle
    because both sides share the hash), first occurrence is picked by
    a window over that key, and each document drops the union of its
    duplicated [p, p+span) intervals.  ``stride > 1`` trades removal
    granularity for an s-fold smaller shuffle — the knob the 100 TB
    run turns.

    Scale shape: shuffle 1 keys (hash, doc, p) triples — ~24 bytes per
    window, token text never ships; shuffle 2 is a partial-agg groupBy
    of ONLY the duplicated positions back to doc granularity, joined
    to the docs table on id.  Nothing quadratic, no driver state.

    Returns (doc_id, clean_text, n_tokens, n_removed).
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.when(
        F.size(toks) >= span,
        F.sequence(F.lit(1), F.size(toks) - span + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    wins = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__t"),
        F.explode(starts).alias("p"),
    ).select(
        "doc_id",
        "p",
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(F.col("__t"), F.col("p"), span))), 1, 12),
            16,
            10,
        )
        .cast("long")
        .alias("whash"),
    )
    w = Window.partitionBy("whash").orderBy("doc_id", "p")
    rem = (
        wins.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("p")).alias("ps"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__t"))
    joined = base.join(rem, "doc_id", "left").withColumn(
        "ps", F.coalesce(F.col("ps"), F.array().cast("array<int>"))
    )
    idx = F.sequence(F.lit(1), F.size(F.col("__t")))
    kept = F.filter(
        idx,
        lambda i: ~F.exists(F.col("ps"), lambda p: (i >= p) & (i < p + span)),
    )
    return joined.select(
        "doc_id",
        F.array_join(
            F.transform(kept, lambda i: F.element_at(F.col("__t"), i)), " "
        ).alias("clean_text"),
        F.size(F.col("__t")).cast("long").alias("n_tokens"),
        (F.size(F.col("__t")) - F.size(kept)).cast("long").alias("n_removed"),
    )


# --- incremental dedup against a persisted corpus index --------------------


def incremental_dedup_pairs(
    new_sh: DataFrame,
    index_sh: DataFrame,
    index_buckets: DataFrame,
    k: int = 64,
    bands: int = 32,
    rows: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs of a NEW batch vs an already-indexed corpus (plus
    within-batch pairs) — the production shape: today's crawl dedupes
    against all history without ever re-scanning history's text.

    Only the batch is shingled/minhashed (``new_sh``); the corpus side
    contributes its persisted (doc, band, bkey) bucket rows to the
    candidate join and its shingle rows to the exact verify, both
    joined ON CANDIDATE KEYS only — history is touched proportionally
    to how much of it collides with the batch, never in full.  Output
    = verified exact-Jaccard pairs (doc_a < doc_b), so recall follows
    the banding bound (1-(1-t^r)^b) and false positives never escape.

    Precondition: doc ids are globally unique across index and batch
    (re-ingesting an id would double-count its shingles in the verify
    union) — the same contract every keyed table in this engine keeps.
    """
    new_sigs = minhash_signatures(new_sh, k)
    new_buckets = band_buckets(new_sigs, bands, rows)
    cross = new_buckets.join(
        index_buckets.select(
            F.col("doc").alias("__odoc"), "band", "bkey"
        ),
        ["band", "bkey"],
    ).select("doc", "__odoc")
    within = new_buckets.join(
        new_buckets.select(F.col("doc").alias("__odoc"), "band", "bkey"),
        ["band", "bkey"],
    ).select("doc", "__odoc")
    cands = (
        cross.unionByName(within)
        .filter(F.col("doc") != F.col("__odoc"))
        .select(
            F.least("doc", "__odoc").alias("doc_a"),
            F.greatest("doc", "__odoc").alias("doc_b"),
        )
        .distinct()
    )
    return candidate_jaccard(cands, index_sh.unionByName(new_sh), threshold)


class MinHashCorpusIndex:
    """Snapshot-backed MinHash-LSH dedup index.

    Two SnapshotTables: ``buckets`` (doc, band, bkey — the LSH join
    keys, 3 longs/band/doc) and ``shingles`` (doc, shingle — the exact-
    verify material).  ``dedup_batch`` joins a new batch against the
    CURRENT snapshots; ``append`` fast-appends the batch's own rows
    (O(batch) bytes — prior index files are never rewritten, same
    delta-segment discipline as the URL seen-state), so the index
    grows with the corpus while every round's cost stays O(batch +
    collisions).  Time travel and resume come from the snapshot
    manifests for free.
    """

    def __init__(
        self,
        buckets_table,
        shingles_table,
        n: int = 3,
        k: int = 64,
        bands: int = 32,
        rows: int = 2,
    ) -> None:
        self.buckets, self.shingles = buckets_table, shingles_table
        self.n, self.k, self.bands, self.rows = n, k, bands, rows

    def _prep(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        return shingles(docs, id_col, text_col, self.n)

    def bootstrap(self, docs: DataFrame, id_col: str, text_col: str) -> None:
        """Index an initial corpus (full commit, snapshot 1)."""
        sh = self._prep(docs, id_col, text_col)
        self.shingles.commit(sh, {"op": "bootstrap"})
        self.buckets.commit(
            band_buckets(minhash_signatures(sh, self.k), self.bands, self.rows),
            {"op": "bootstrap"},
        )

    def dedup_batch(
        self, docs: DataFrame, id_col: str, text_col: str, threshold: float = 0.8
    ) -> DataFrame:
        return incremental_dedup_pairs(
            self._prep(docs, id_col, text_col),
            self.shingles.read(),
            self.buckets.read(),
            self.k,
            self.bands,
            self.rows,
            threshold,
        )

    def append(self, docs: DataFrame, id_col: str, text_col: str) -> None:
        """Fast-append the batch's rows; prior files untouched."""
        sh = self._prep(docs, id_col, text_col)
        self.shingles.commit_append(sh, {"op": "append"})
        self.buckets.commit_append(
            band_buckets(minhash_signatures(sh, self.k), self.bands, self.rows),
            {"op": "append"},
        )
