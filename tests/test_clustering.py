"""Connected-components clustering + repeated-line dedup + PII
redaction (LLM-data family, SURVEY.md "beyond the reference")."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _union_find_components(edges):
    """Driver-side oracle: classic union-find, min id as the label."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_cc_random_graph_matches_union_find(spark):
    from tripwire_spark.operators.clustering import connected_components

    rng = random.Random(42)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
    edges = [(u, v) for u, v in edges if u != v]
    want = _union_find_components(edges)
    got = {
        r.node: r.component
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == want


def test_cc_long_chain_converges_logarithmically(spark):
    # a 400-node path is the worst case for naive label propagation
    # (O(diameter) rounds); the star algorithm must still finish inside
    # its max_iter=25 = O(log n) budget and label everything with node 0.
    from tripwire_spark.operators.clustering import connected_components

    chain = [(i, i + 1) for i in range(400)]
    out = connected_components(spark.createDataFrame(chain, "src long, dst long"))
    rows = out.collect()
    assert len(rows) == 401
    assert {r.component for r in rows} == {0}


def test_dedup_keep_list_covers_singletons(spark):
    from tripwire_spark.operators.clustering import dedup_keep_list

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    got = {r.doc_id: (r.component, r.keep) for r in dedup_keep_list(pairs, ids).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
        99: (99, True),  # no dups -> kept, own component
    }


def test_cc_on_minhash_pairs_clusters_planted_dups(spark):
    # end-to-end: near-dup PAIRS from the LSH pipeline -> keep/drop
    # verdicts; every planted copy drops, every original survives.
    from tripwire_spark.operators.clustering import dedup_keep_list
    from tripwire_spark.operators.dedup import minhash_dedup_pairs

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("doc"), "text"
    )
    dups = d.filter(F.pmod("doc", F.lit(25)) == 0).select(
        (F.col("doc") + 100000).alias("doc"), F.concat("text", F.lit(" zzz end")).alias("text")
    )
    docs = d.unionAll(dups)
    pairs = minhash_dedup_pairs(docs, "doc", "text")
    verdict = dedup_keep_list(pairs, docs.select(F.col("doc").alias("doc_id")))
    rows = {r.doc_id: r for r in verdict.collect()}
    planted = {r[0] for r in dups.select("doc").collect()}
    # every planted copy drops (its original has the smaller id, and the
    # word-soup originals may even near-dup each other — either way the
    # component min is never the +100000 copy) ...
    assert all(not rows[p].keep for p in planted)
    # ... and lands in the SAME component as its original (the LSH pair
    # linked them; components only merge from there)
    assert all(rows[p].component == rows[p - 100000].component for p in planted)
    # exactly one survivor per component
    comps = {}
    for r in rows.values():
        comps.setdefault(r.component, []).append(r.keep)
    assert all(sum(ks) == 1 for ks in comps.values())


def test_dedup_lines_drops_repeats_keeps_first(spark):
    from tripwire_spark.operators.dedup import dedup_lines

    a = "alpha beta gamma"  # one 3-word line
    b = "delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{a} {b}"),  # doc 1 owns both lines
            (2, f"{b} {a}"),  # doc 2: both lines already seen -> empty
            (3, f"{a} eta theta iota"),  # repeat + one fresh line
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup_lines(docs, "doc_id", "text", words_per_line=3).collect()}
    assert got[1].clean_text == f"{a} {b}" and got[1].n_kept == 2
    assert got[2].clean_text == "" and got[2].n_kept == 0 and got[2].n_lines == 2
    assert got[3].clean_text == "eta theta iota" and got[3].n_kept == 1


def test_redact_pii_patterns(spark):
    from tripwire_spark.functions.pii import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            ("mail me at bob.smith+x@sub.example.co.uk today", "<EMAIL>", 1, 0, 0),
            ("server 192.168.1.254 then 10.0.0.1", "<IP>", 0, 2, 0),
            ("call 555-123-4567 or 555 987 6543", "<PHONE>", 0, 0, 2),
            ("no pii here at all", "", 0, 0, 0),
        ],
        "text string, tag string, ne int, ni int, np int",
    )
    c = pii_counts(F.col("text"))
    rows = df.select(
        "text", "tag", "ne", "ni", "np",
        redact_pii(F.col("text")).alias("clean"),
        c["n_emails"].alias("ge"), c["n_ips"].alias("gi"), c["n_phones"].alias("gp"),
    ).collect()
    for r in rows:
        assert (r.ge, r.gi, r.gp) == (r.ne, r.ni, r.np), r.text
        if r.tag:
            assert r.tag in r.clean, r.clean
        # nothing that looks like raw PII survives
        assert "@" not in r.clean.replace("<EMAIL>", "")
