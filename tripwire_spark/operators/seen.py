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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
        """OR a partial sketch of ``new_urls`` into ``sketch`` — the
        incremental per-round update (never rebuilds from the frontier)."""
        partial = self.build(new_urls, hash_col)

        def orr(key, pdf: pd.DataFrame):
            acc = None
            n = 0
            for b, ni in zip(pdf["bits"], pdf["n_items"]):
                arr = np.frombuffer(b, dtype=np.uint8)
                acc = arr.copy() if acc is None else (acc | arr)
                n += int(ni)
            return pd.DataFrame(
                {
                    "bucket": [int(key[0])],
                    "bits": [acc.tobytes()],
                    "n_items": [n],
                    "m_bits": [int(pdf["m_bits"].iloc[0])],
                    "k": [int(pdf["k"].iloc[0])],
                }
            )

        return (
            sketch.unionByName(partial)
            .groupBy("bucket")
            .applyInPandas(orr, schema="bucket int, bits binary, n_items long, m_bits long, k int")
        )

    # -- probe ------------------------------------------------------------
    def probe(self, candidates: DataFrame, sketch: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Adds ``maybe_seen`` (bloom positive) to candidates.

        Co-partitioned by bucket: each task reads one sketch row.  New
        buckets (no sketch yet) probe as not-seen.
        """
        k_default = self.k

        def check(key, pdf: pd.DataFrame):
            bits = None
            m = k = None
            sk = pdf[pdf["__side"] == 1]
            if len(sk):
                bits = np.frombuffer(sk["bits"].iloc[0], dtype=np.uint8)
                m = int(sk["m_bits"].iloc[0])
                k = int(sk["k"].iloc[0])
            cand = pdf[pdf["__side"] == 0]
            if len(cand) == 0:
                return pd.DataFrame({"h": pd.Series([], dtype="int64"), "maybe_seen": pd.Series([], dtype=bool)})
            hs = cand["h"].to_numpy(dtype=np.int64)
            if bits is None:
                seen = np.zeros(len(hs), dtype=bool)
            else:
                pos = _positions(hs, k or k_default, m)
                b = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
                seen = b.all(axis=1)
            return pd.DataFrame({"h": hs, "maybe_seen": seen})

        cand = candidates.select(
            self.bucket_col(F.col(hash_col)).alias("bucket"),
            F.col(hash_col).alias("h"),
            F.lit(0).alias("__side"),
            F.lit(None).cast("binary").alias("bits"),
            F.lit(None).cast("long").alias("m_bits"),
            F.lit(None).cast("int").alias("k"),
        )
        # NOTE: h must NOT be NULL here — a single NULL in a group turns
        # the pandas column into float64, silently rounding 64-bit
        # hashes past the 52-bit mantissa and corrupting every probe.
        sk = sketch.select(
            "bucket",
            F.lit(0).cast("long").alias("h"),
            F.lit(1).alias("__side"),
            "bits",
            "m_bits",
            "k",
        )
        flags = (
            cand.unionByName(sk)
            .groupBy("bucket")
            .applyInPandas(check, schema="h long, maybe_seen boolean")
            .dropDuplicates(["h"])
        )
        return candidates.join(flags, candidates[hash_col] == flags["h"], "left").drop("h")


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
