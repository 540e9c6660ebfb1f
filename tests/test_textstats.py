"""Character-entropy quality signals (textstats.entropy_features).

Hand-traced Shannon entropies over the 38-bucket alphabet; the
DuckDB-twin parity is pinned by the `doc_entropy` oracle row.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tripwire_spark.operators.textstats import entropy_features


def _entropies(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    feats = entropy_features(F.col("text"))
    rows = (
        df.select("id", *(feats[k].alias(k) for k in ("n_chars", "char_entropy", "alnum_ratio")))
        .orderBy("id")
        .collect()
    )
    return rows


def test_char_entropy_hand_traced(spark):
    rows = _entropies(
        spark,
        [
            "aabb",        # two equiprobable buckets -> exactly 1 bit
            "aaaa",        # single bucket -> 0 bits
            "a!",          # 'a' + OTHER bucket, equiprobable -> 1 bit
            "",            # empty -> 0 by definition, no NaN/null
            "AaBb",        # lowercased first: same as "aabb"
        ],
    )
    assert [r.n_chars for r in rows] == [4, 4, 2, 0, 4]
    ents = [r.char_entropy for r in rows]
    assert abs(ents[0] - 1.0) < 1e-12
    assert ents[1] == 0.0
    assert abs(ents[2] - 1.0) < 1e-12
    assert ents[3] == 0.0
    assert abs(ents[4] - 1.0) < 1e-12
    # alnum ratio: "a!" is half alnum; space is NOT alnum
    assert abs(rows[2].alnum_ratio - 0.5) < 1e-12


def test_char_entropy_mixed_distribution(spark):
    # "aab" -> p(a)=2/3, p(b)=1/3
    (row,) = _entropies(spark, ["aab"])
    expect = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(row.char_entropy - expect) < 1e-12
    assert row.alnum_ratio == 1.0


def test_space_counts_in_alphabet_not_alnum(spark):
    (row,) = _entropies(spark, ["a a"])  # a:2/3, space:1/3
    expect = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(row.char_entropy - expect) < 1e-12
    assert abs(row.alnum_ratio - 2 / 3) < 1e-12
