"""Partitioned Bloom-filter URL-seen set (with counting/cuckoo-style
deletion fallback), plus the exact anti-join backstop.

Scale math (SURVEY.md §7 hard part 6): 10^10 URLs x ~10 bits = ~12 GB
of bloom bits — far too big for one driver-side filter
(``df.stat.bloomFilter`` collects to the driver).  So the seen set is
sharded by ``bucket = url_hash % n_buckets``: each bucket owns an
independent bloom sized for its share, stored as one binary row in a
snapshot table.  Probing co-partitions candidates with sketches on the
bucket key, so each task touches exactly one bloom blob (a
zipPartitions-style join, never a broadcast of all bits).

The bloom is a PRE-FILTER: "definitely new" URLs skip the exact
anti-join entirely; "maybe seen" URLs (including the ~1% false
positives) fall through to the exact check, so the seen SET stays
exact.  All membership math is numpy over int64 arrays inside
applyInPandas — no per-row Python.

Hash scheme: double hashing h_i = h1 + i*h2 (Kirsch-Mitzenmacher) over
the already-computed JVM-side xxhash64 url_hash; h2 is an odd
avalanche-mixed variant, so no string re-hashing ever happens in
Python.
"""

from __future__ import annotations

import math
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MIX = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as signed


def _h2(h1: np.ndarray) -> np.ndarray:
    """Avalanche-mix to an odd second hash (independent-ish of h1)."""
    x = h1 * MIX
    x = x ^ (x >> np.int64(29))
    return x | np.int64(1)


def _positions(h1: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing, all-numpy."""
    h2 = _h2(h1)
    i = np.arange(k, dtype=np.int64)
    pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos % np.int64(m) + np.int64(m)) % np.int64(m)


class BloomSeenSet:
    """Builder/prober/merger for the sharded bloom sketch table.

    ``capacity`` fixes each bucket's bit-array size up front
    (capacity x bits_per_key / n_buckets), which makes sketches
    **mergeable by bitwise OR**: a crawl round builds a partial sketch
    from only its NEW urls and ORs it into the persisted sketch —
    O(new) per round instead of O(frontier), the only shape that
    survives a 10^10-url frontier.  FP rate degrades gracefully if the
    true count overshoots capacity; the exact backstop keeps the seen
    SET exact regardless.
    """

    def __init__(self, n_buckets: int = 64, bits_per_key: int = 10, capacity: int = 1_000_000) -> None:
        self.n_buckets = n_buckets
        self.bits_per_key = bits_per_key
        self.k = max(1, round(bits_per_key * math.log(2)))  # optimal k
        self.m_bits = max(64, (capacity * bits_per_key) // n_buckets)

    def bucket_col(self, hash_col):
        return F.pmod(hash_col, F.lit(self.n_buckets)).cast("int")

    # -- build ------------------------------------------------------------
    def build(self, seen: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """seen(url_hash) -> sketch(bucket, bits, n_items, m_bits, k)."""
        k, m = self.k, self.m_bits

        def make(key, pdf: pd.DataFrame):
            hs = pdf["h"].to_numpy(dtype=np.int64)
            n = len(hs)
            bits = np.zeros((m + 7) // 8, dtype=np.uint8)
            if n:
                pos = _positions(hs, k, m).ravel()
                np.bitwise_or.at(bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
            return pd.DataFrame(
                {
                    "bucket": [int(key[0])],
                    "bits": [bits.tobytes()],
                    "n_items": [n],
                    "m_bits": [m],
                    "k": [k],
                }
            )

        prepared = seen.select(
            self.bucket_col(F.col(hash_col)).alias("bucket"), F.col(hash_col).alias("h")
        )
        return prepared.groupBy("bucket").applyInPandas(
            make, schema="bucket int, bits binary, n_items long, m_bits long, k int"
        )

    # -- merge ------------------------------------------------------------
    def merge(self, sketch: DataFrame, new_urls: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """OR ``new_urls`` into ``sketch`` — the incremental per-round
        update (never rebuilds from the frontier).

        One cogrouped pass: each bucket task sees (new hashes, existing
        blob) together — no intermediate partial-sketch shuffle.
        """
        k_default, m_default = self.k, self.m_bits

        def orr(key, new_pdf: pd.DataFrame, sk_pdf: pd.DataFrame):
            if len(sk_pdf):
                bits = np.frombuffer(sk_pdf["bits"].iloc[0], dtype=np.uint8).copy()
                m = int(sk_pdf["m_bits"].iloc[0])
                k = int(sk_pdf["k"].iloc[0])
                n = int(sk_pdf["n_items"].iloc[0])
            else:
                m, k, n = m_default, k_default, 0
                bits = np.zeros((m + 7) // 8, dtype=np.uint8)
            hs = new_pdf["h"].to_numpy(dtype=np.int64)
            if len(hs):
                pos = _positions(hs, k, m).ravel()
                np.bitwise_or.at(bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
            return pd.DataFrame(
                {
                    "bucket": [int(key[0])],
                    "bits": [bits.tobytes()],
                    "n_items": [n + len(hs)],
                    "m_bits": [m],
                    "k": [k],
                }
            )

        new = new_urls.select(
            self.bucket_col(F.col(hash_col)).alias("bucket"), F.col(hash_col).alias("h")
        )
        return (
            new.groupBy("bucket")
            .cogroup(sketch.groupBy("bucket"))
            .applyInPandas(orr, schema="bucket int, bits binary, n_items long, m_bits long, k int")
        )

    # -- probe ------------------------------------------------------------
    def probe(self, candidates: DataFrame, sketch: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Adds ``maybe_seen`` (bloom positive) to candidates.

        One cogrouped pass per bucket: each task sees (its candidate
        rows, its one sketch blob) and flags in numpy — candidates flow
        straight through, so there is no flag-join-back or re-dedup
        shuffle.  New buckets (no sketch yet) probe as not-seen.
        NOTE: the hash column must be non-null (pandas would upcast to
        float64 and corrupt 64-bit hashes past the 52-bit mantissa).
        """
        k_default = self.k
        out_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("maybe_seen", T.BooleanType(), True)]
        )

        def check(key, cand: pd.DataFrame, sk: pd.DataFrame):
            cand = cand.drop(columns="__bucket")
            if len(cand) == 0:
                cand["maybe_seen"] = pd.Series([], dtype=bool)
                return cand
            hs = cand[hash_col].to_numpy(dtype=np.int64)
            if len(sk):
                bits = np.frombuffer(sk["bits"].iloc[0], dtype=np.uint8)
                m = int(sk["m_bits"].iloc[0])
                k = int(sk["k"].iloc[0]) or k_default
                pos = _positions(hs, k, m)
                b = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
                cand["maybe_seen"] = b.all(axis=1)
            else:
                cand["maybe_seen"] = np.zeros(len(hs), dtype=bool)
            return cand

        cand = candidates.withColumn("__bucket", self.bucket_col(F.col(hash_col)))
        return (
            cand.groupBy("__bucket")
            .cogroup(sketch.groupBy(F.col("bucket").alias("__bucket")))
            .applyInPandas(check, schema=out_schema)
        )


def filter_unseen(
    candidates: DataFrame,
    exact_seen: DataFrame,
    sketch: DataFrame | None,
    bloom: "BloomSeenSet",
    hash_col: str = "url_hash",
    url_col: str = "url",
    caches: list | None = None,
) -> DataFrame:
    """The full unseen-filter: bloom pre-filter, exact backstop.

    definitely-new (bloom negative) rows PASS with no join; maybe-seen
    rows go through the exact anti-join, which removes true positives
    and re-admits bloom false positives.  Result is exactly the unseen
    candidates, at a fraction of the anti-join input.

    ``flagged`` is persisted (lifecycle handed to ``caches`` when
    given): the fresh/maybe split and the downstream union would
    otherwise re-run the entire candidate subtree (extraction UDFs,
    dedup window, probe) once per consumer.
    """
    if sketch is None:
        return candidates.join(exact_seen.select(url_col), url_col, "left_anti")
    flagged = bloom.probe(candidates, sketch, hash_col).persist()
    if caches is not None:
        caches.append(flagged)
    fresh = flagged.filter(~F.coalesce(F.col("maybe_seen"), F.lit(False))).drop("maybe_seen")
    maybe = flagged.filter(F.coalesce(F.col("maybe_seen"), F.lit(False))).drop("maybe_seen")
    readmitted = maybe.join(exact_seen.select(url_col), url_col, "left_anti")
    return fresh.unionByName(readmitted)


class SeenState:
    """Bucket-sharded URL-seen *state service*: one row per bucket
    holding (bloom bits, sorted int64 hash array).

    ``admit()`` performs the entire per-round seen-set interaction —
    in-round dedup, membership test, state update — as ONE cogrouped
    ``applyInPandas`` pass: candidates shuffle once (by bucket), the
    state side is n_buckets tiny blob rows, and the output carries both
    the admitted (fresh) candidates and the next round's state.  This
    replaces a dedup window + bloom probe + exact anti-join + sketch
    merge (4+ shuffles, 2 driver actions) with a single shuffle
    round-trip — the difference between a ~35-stage and a ~10-stage
    crawl round, which is what dominates wall-clock on a real cluster's
    scheduler as much as in local mode.

    Scale math: n_buckets is the sharding knob.  At 10^10 urls with
    n_buckets=4096, each bucket holds ~20 MB of hashes + ~3 MB of bloom
    bits — one comfortable Arrow blob per task.  The bloom bits ride
    along for the spill regime (state too big to load → bloom prefilter
    + exact backstop, see ``filter_unseen``); in the in-core regime the
    sorted-array ``searchsorted`` IS the exact check.  Membership is
    hash-exact (xxhash64): P[any collision] ≈ n²/2^65 ≈ 0.003 even at
    10^10 urls, and the fixture tests compare url SETS, where no
    collisions occur at test scale.

    Reference parity: the seen set is the already-queued check of
    queue_sites (runners/queue_sites:117-127) keyed on the canonical
    url (schema.sql:902-907 norm_url), per SURVEY.md §2.7 D7/F2.
    """

    STATE_SCHEMA = "bucket int, bloom binary, hashes binary, n_items long, m_bits long, k int"

    def __init__(self, n_buckets: int = 64, bits_per_key: int = 10, capacity: int = 1_000_000) -> None:
        self.n_buckets = n_buckets
        self.bits_per_key = bits_per_key
        self.k = max(1, round(bits_per_key * math.log(2)))
        self.m_bits = max(64, (capacity * bits_per_key) // n_buckets)

    def bucket_col(self, hash_col):
        return F.pmod(hash_col, F.lit(self.n_buckets)).cast("int")

    def _bloom_of(self, hs: np.ndarray) -> bytes:
        bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)
        if len(hs):
            pos = _positions(hs, self.k, self.m_bits).ravel()
            np.bitwise_or.at(bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
        return bits.tobytes()

    def init(self, urls: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Seed state from an initial url-hash set (e.g. the seeded frontier)."""
        k, m, mk_bloom = self.k, self.m_bits, self._bloom_of

        def make(key, pdf: pd.DataFrame):
            hs = np.unique(pdf["h"].to_numpy(dtype=np.int64))
            return pd.DataFrame(
                {
                    "bucket": [int(key[0])],
                    "bloom": [mk_bloom(hs)],
                    "hashes": [hs.tobytes()],
                    "n_items": [len(hs)],
                    "m_bits": [m],
                    "k": [k],
                }
            )

        prepared = urls.select(self.bucket_col(F.col(hash_col)).alias("bucket"), F.col(hash_col).alias("h"))
        return prepared.groupBy("bucket").applyInPandas(make, schema=self.STATE_SCHEMA)

    def admit(
        self,
        candidates: DataFrame,
        state: DataFrame,
        hash_col: str = "url_hash",
        order_cols: list[str] | None = None,
    ) -> DataFrame:
        """(candidates, state) -> mixed rows: kind=0 fresh candidates,
        kind=1 next-round state.

        Dedup within the batch keeps the first row per ``hash_col`` in
        ``order_cols`` ascending order (pass a total order for
        determinism).  ``hash_col`` must be non-null (pandas float64
        upcast would corrupt 64-bit hashes).
        """
        order_cols = order_cols or []
        k_d, m_d, nb = self.k, self.m_bits, self.n_buckets
        mk_bloom = self._bloom_of
        cand_fields = [
            T.StructField(f.name, f.dataType, True) for f in candidates.schema.fields
        ]
        out_schema = T.StructType(
            [T.StructField("kind", T.IntegerType(), False),
             T.StructField("bucket", T.IntegerType(), False)]
            + cand_fields
            + [
                T.StructField("bloom", T.BinaryType(), True),
                T.StructField("hashes", T.BinaryType(), True),
                T.StructField("n_items", T.LongType(), True),
                T.StructField("m_bits", T.LongType(), True),
                T.StructField("k", T.IntegerType(), True),
            ]
        )
        cand_cols = [f.name for f in cand_fields]
        state_pad = {c: None for c in ("bloom", "hashes", "n_items", "m_bits", "k")}

        def step(key, cand: pd.DataFrame, st: pd.DataFrame):
            bucket = int(key[0])
            if len(st):
                old = np.frombuffer(st["hashes"].iloc[0], dtype=np.int64)
                bloom_bits = np.frombuffer(st["bloom"].iloc[0], dtype=np.uint8).copy()
                m = int(st["m_bits"].iloc[0]); kk = int(st["k"].iloc[0])
            else:
                old = np.empty(0, dtype=np.int64)
                bloom_bits = np.zeros((m_d + 7) // 8, dtype=np.uint8)
                m, kk = m_d, k_d
            cand = cand.drop(columns="__bucket")
            if len(cand):
                if order_cols:
                    cand = cand.sort_values([hash_col, *order_cols], kind="mergesort")
                cand = cand.drop_duplicates(subset=[hash_col], keep="first")
                hs = cand[hash_col].to_numpy(dtype=np.int64)
                idx = np.searchsorted(old, hs)
                idx_c = np.clip(idx, 0, max(len(old) - 1, 0))
                seen = (old[idx_c] == hs) if len(old) else np.zeros(len(hs), dtype=bool)
                fresh = cand[~seen].copy()
                fhs = hs[~seen]
            else:
                fresh = cand
                fhs = np.empty(0, dtype=np.int64)
            merged = np.union1d(old, fhs)
            if len(fhs):
                pos = _positions(fhs, kk, m).ravel()
                np.bitwise_or.at(bloom_bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
            fresh.insert(0, "kind", 0)
            fresh.insert(1, "bucket", bucket)
            for c in state_pad:
                fresh[c] = None
            st_row = {c: [None] for c in cand_cols}
            st_row.update(
                kind=[1], bucket=[bucket], bloom=[bloom_bits.tobytes()],
                hashes=[merged.tobytes()], n_items=[len(merged)], m_bits=[m], k=[kk],
            )
            with warnings.catch_warnings():
                # all-NA padding columns are intentional (union schema)
                warnings.simplefilter("ignore", FutureWarning)
                out = pd.concat([fresh, pd.DataFrame(st_row)], ignore_index=True)
            return out[["kind", "bucket", *cand_cols, "bloom", "hashes", "n_items", "m_bits", "k"]]

        cand = candidates.withColumn("__bucket", self.bucket_col(F.col(hash_col)))
        return (
            cand.groupBy("__bucket")
            .cogroup(state.groupBy(F.col("bucket").alias("__bucket")))
            .applyInPandas(step, schema=out_schema)
        )

    @staticmethod
    def split(admitted: DataFrame, cand_cols: list[str]) -> tuple[DataFrame, DataFrame]:
        """(fresh candidates, next state) from a cached admit() result."""
        fresh = admitted.filter(F.col("kind") == 0).select(*cand_cols)
        nxt = admitted.filter(F.col("kind") == 1).select(
            "bucket", "bloom", "hashes", "n_items", "m_bits", "k"
        )
        return fresh, nxt
