"""Bloom seen-set properties: zero false negatives, FP rate within
bound, filter_unseen exactness (SURVEY.md §5.4)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _urls(spark, start, n):
    return spark.range(start, start + n).select(
        F.format_string("http://h%d.test/p%d", F.pmod("id", F.lit(97)), F.col("id")).alias("url"),
        F.xxhash64(F.format_string("http://h%d.test/p%d", F.pmod("id", F.lit(97)), F.col("id"))).alias(
            "url_hash"
        ),
    )


def test_bloom_no_false_negatives(spark):
    from tripwire_spark.operators.seen import BloomSeenSet

    bloom = BloomSeenSet(n_buckets=8, bits_per_key=10)
    seen = _urls(spark, 0, 5000)
    sketch = bloom.build(seen).persist()
    flagged = bloom.probe(seen, sketch).persist()
    assert flagged.filter(F.col("maybe_seen").isNull()).count() == 0  # every row flagged
    assert flagged.filter(~F.col("maybe_seen")).count() == 0  # NEVER miss a seen url


def test_bloom_fp_rate(spark):
    from tripwire_spark.operators.seen import BloomSeenSet

    bloom = BloomSeenSet(n_buckets=8, bits_per_key=10)
    sketch = bloom.build(_urls(spark, 0, 5000)).persist()
    unseen = _urls(spark, 1_000_000, 5000)
    fp = bloom.probe(unseen, sketch).filter(F.col("maybe_seen")).count()
    assert fp / 5000 < 0.03  # theoretical ~1% at 10 bits/key; 3x slack


def test_filter_unseen_exact(spark):
    from tripwire_spark.operators.seen import BloomSeenSet, filter_unseen

    bloom = BloomSeenSet(n_buckets=8, bits_per_key=10)
    seen = _urls(spark, 0, 3000).persist()
    sketch = bloom.build(seen).persist()
    # candidates: half overlap the seen set, half are new
    cands = _urls(spark, 1500, 3000)
    out = filter_unseen(cands, seen, sketch, bloom)
    got = sorted(r.url for r in out.collect())
    want = sorted(r.url for r in _urls(spark, 3000, 1500).collect())
    assert got == want  # bloom+backstop == exact anti-join result


def test_incremental_merge_equals_full_build(spark):
    from tripwire_spark.operators.seen import BloomSeenSet

    bloom = BloomSeenSet(n_buckets=8, bits_per_key=10, capacity=100_000)
    a, b = _urls(spark, 0, 2000), _urls(spark, 2000, 2000)
    merged = bloom.merge(bloom.build(a), b).persist()
    # merged sketch must contain every url from both halves
    flagged = bloom.probe(_urls(spark, 0, 4000), merged)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    assert flagged.filter(F.col("maybe_seen").isNull()).count() == 0
    # and byte-identical to a one-shot build over the union
    full = {r.bucket: r.bits for r in bloom.build(a.unionByName(b)).collect()}
    inc = {r.bucket: r.bits for r in merged.collect()}
    assert full == inc


def test_sketch_snapshot_roundtrip(spark, tmp_path):
    from tripwire_spark.operators.seen import BloomSeenSet
    from tripwire_spark.sources.snapshots import SnapshotTable

    bloom = BloomSeenSet(n_buckets=4, bits_per_key=10)
    sk = bloom.build(_urls(spark, 0, 1000))
    t = SnapshotTable(spark, str(tmp_path), "seen_sketch")
    t.commit(sk, {"round": 1})
    restored = t.read()
    flagged = bloom.probe(_urls(spark, 0, 1000), restored).persist()
    assert flagged.filter(F.col("maybe_seen").isNull()).count() == 0
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_no_false_negatives_and_fp(spark):
    from tripwire_spark.operators.seen import CuckooSeenSet

    ck = CuckooSeenSet(n_buckets=8, capacity=50_000)
    seen = _urls(spark, 0, 5000)
    state = ck.build(seen).persist()
    flagged = ck.probe(seen, state).persist()
    assert flagged.filter(~F.col("maybe_seen")).count() == 0  # no false negatives
    unseen = _urls(spark, 1_000_000, 5000)
    fp = ck.probe(unseen, state).filter(F.col("maybe_seen")).count()
    assert fp / 5000 < 0.01  # 16-bit fingerprints: ~1.2e-4 expected


def test_cuckoo_delete_readmits(spark):
    from tripwire_spark.operators.seen import CuckooSeenSet

    ck = CuckooSeenSet(n_buckets=8, capacity=50_000)
    a, b = _urls(spark, 0, 2000).persist(), _urls(spark, 2000, 2000).persist()
    state = ck.build(a.unionByName(b)).persist()
    # delete half -> those urls probe as unseen again, the rest stay seen
    state2 = ck.delete(state, b).persist()
    still = ck.probe(a, state2).filter(~F.col("maybe_seen")).count()
    gone = ck.probe(b, state2).filter(F.col("maybe_seen")).count()
    assert still == 0  # a fully present (fp collisions with b possible but 0 expected)
    assert gone == 0   # b fully removed
    # and re-insert works
    state3 = ck.insert(state2, b).persist()
    assert ck.probe(b, state3).filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_high_load_no_false_negatives(spark):
    """Regression: the primary index must not be derived from the same
    low bits as the shard key (both mod powers of two), or each shard
    collapses to n_entries/n_buckets usable entries and silently drops
    items well below nominal load."""
    from tripwire_spark.operators.seen import CuckooSeenSet

    ck = CuckooSeenSet(n_buckets=64, capacity=60_000)  # ~76% shard load below
    seen = _urls(spark, 0, 50_000)
    state = ck.build(seen).persist()
    # every inserted item must be reported stored...
    assert sum(r.n_items for r in state.collect()) == seen.select("url_hash").distinct().count()
    # ...and must probe as seen
    assert ck.probe(seen, state).filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_reinsert_is_idempotent(spark):
    """Insert of already-present hashes must not store duplicate
    fingerprints: one delete then removes the item completely."""
    from tripwire_spark.operators.seen import CuckooSeenSet

    ck = CuckooSeenSet(n_buckets=8, capacity=50_000)
    b = _urls(spark, 0, 1000).persist()
    state = ck.insert(ck.build(b), b).persist()  # second insert is a no-op
    assert sum(r.n_items for r in state.collect()) == 1000
    gone = ck.delete(state, b)
    assert ck.probe(b, gone).filter(F.col("maybe_seen")).count() == 0


def test_cuckoo_incremental_matches_full_build(spark):
    from tripwire_spark.operators.seen import CuckooSeenSet

    ck = CuckooSeenSet(n_buckets=8, capacity=50_000)
    a, b = _urls(spark, 0, 2000), _urls(spark, 2000, 2000)
    merged = ck.insert(ck.build(a), b).persist()
    assert ck.probe(_urls(spark, 0, 4000), merged).filter(~F.col("maybe_seen")).count() == 0
