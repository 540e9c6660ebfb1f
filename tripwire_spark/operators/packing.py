"""Training-shard packing and deterministic stratified sampling.

Two operators a 100 TB training-data pipeline needs downstream of
dedup/quality (the reference stops at per-document scoring; these own
the corpus -> training-run handoff):

- ``pack_shards``: assign every document to a fixed-token-budget shard
  by its offset in the running token total over a deterministic global
  order — the standard sequential-fill sharding for pretraining data.
- ``stratified_sample``: per-group sampling with a content-derived
  selector (md5 of the id), so the sample is reproducible across
  engines, runs, and cluster sizes — no RNG state, no seed plumbing,
  and a DuckDB oracle can replay it exactly.

Scale design (the interesting part of ``pack_shards``): a global
running sum is inherently ordered, but ordering 100 TB through ONE
window is a single-partition sort — the classic scale-killer.  The
two-phase cumsum here keeps everything partition-parallel:

1. rows get a RANGE bucket from the order key (min/max from one
   map-side agg, broadcast as a 1-row frame — the monitor.py:90
   pattern);
2. the within-bucket exclusive cumsum runs as a window PER BUCKET
   (parallel, each bucket sorts only its slice);
3. bucket totals (one row per bucket) cumsum through a single-partition
   window over ``n_buckets`` rows — trivially small — and broadcast-join
   back as each bucket's prefix offset.

offset = bucket_prefix + within_bucket_cumsum, shard = offset / budget.
No all-data global sort, no driver collect; the only single-partition
structure holds ``n_buckets`` rows.  At 1000 executors, set
``n_buckets`` to a few x the executor count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_bucket(col, buckets: int = 10_000) -> Column:
    """Deterministic [0, buckets) selector from the md5 of a column —
    identical in Spark (conv/substr) and ANSI-ish SQL
    (('0x'||substr(md5(x),1,8))::bigint), so sampling decisions are
    engine-portable.  Uses the top 32 hex-derived bits: uniform, and
    small enough that bigint parsing agrees everywhere."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(buckets))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic ``fractions[group]`` share of each group.

    The keep decision is a pure projection on (group, md5(id)) — no
    shuffle, no RNG, pushdown-friendly — so the sampled corpus is
    byte-stable across runs and cluster sizes (a training-data
    requirement: re-running the pipeline must not silently change the
    corpus).  Groups absent from ``fractions`` fall to
    ``default_fraction``."""
    frac = F.lit(default_fraction)
    for g, f in sorted(fractions.items()):
        frac = F.when(F.col(group_col) == g, F.lit(f)).otherwise(frac)
    return docs.filter(md5_bucket(id_col) < (frac * 10_000).cast("bigint"))


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 1,
) -> DataFrame:
    """Split every document into fixed-size token windows for training
    context preparation: chunk k covers tokens [k*stride, k*stride +
    window).  ``stride < window`` gives overlapping chunks;
    ``stride == window`` (default) tiles the document.

    Returns (id, chunk_id, chunk_text, chunk_tokens).  Trailing chunks
    shorter than ``min_tokens`` are dropped (a 1-token tail is training
    noise); a document shorter than ``window`` still yields its single
    truncated chunk when it clears ``min_tokens``.

    Scale shape: tokenize -> sequence -> posexplode -> slice is all
    narrow (zero shuffles, whole-stage codegen); output row count is
    ~n_tokens/stride per doc, and the chunk text is re-materialized
    from the one tokens array per doc — the input corpus is scanned
    exactly once and never shuffled.
    """
    if stride is None:
        stride = window
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    # split on the RAW text — chunks are training data; case-folding
    # here would silently corrupt the corpus
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    d = docs.select(id_col, toks.alias("__t")).filter(F.size("__t") > 0)
    d = d.select(
        id_col,
        "__t",
        F.posexplode(F.sequence(F.lit(0), F.size("__t") - 1, F.lit(stride))).alias(
            "chunk_id", "__start"
        ),
    )
    piece = F.slice("__t", F.col("__start") + 1, window)
    return (
        d.select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("chunk_tokens"),
        )
        .filter(F.col("chunk_tokens") >= min_tokens)
    )


def pack_shards(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Sequential-fill shard assignment: in ``order_col`` order, a
    document whose running-total START offset falls in
    [k*budget, (k+1)*budget) belongs to shard k.

    Returns the input columns plus (token_offset, shard).  Contract:
    ``shard = floor(exclusive_cumsum(tokens) / budget)`` — exactly the
    single-window SQL restatement the oracle runs; the two-phase plan
    below is the distributed evaluation of that expression (see module
    docstring)."""
    rng = docs.agg(
        F.min(order_col).alias("__mn"), F.max(order_col).alias("__mx")
    )
    d = docs.crossJoin(F.broadcast(rng))
    # double-space bucketing: full-range int64 order keys must not wrap
    # (__mx - __mn); see global_rank
    width = (F.col("__mx").cast("double") - F.col("__mn").cast("double")) / n_buckets + 1
    d = d.withColumn(
        "__bkt",
        F.floor((F.col(order_col).cast("double") - F.col("__mn").cast("double")) / width),
    )

    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("__cum_in", F.coalesce(F.sum(token_col).over(w_in), F.lit(0)))
    # The windowed frame feeds BOTH the bucket-totals agg and the final
    # join; without materializing it each branch re-scans and re-shuffles
    # the whole input (verified in the physical plan — the groupBy's
    # map-side partial agg makes its exchange child differ from the
    # window's, so ReusedExchange never fires).  One eager checkpoint
    # costs one local write and halves the corpus shuffles.
    d = d.localCheckpoint(eager=True)

    totals = d.groupBy("__bkt").agg(F.sum(token_col).alias("__t"))
    w_tot = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.select(
        "__bkt", F.coalesce(F.sum("__t").over(w_tot), F.lit(0)).alias("__prefix")
    )

    out = d.join(F.broadcast(prefix), "__bkt")
    offset = (F.col("__prefix") + F.col("__cum_in")).alias("token_offset")
    return out.select(
        *docs.columns, offset, F.floor((F.col("__prefix") + F.col("__cum_in")) / budget).alias("shard")
    )


def split_corpus(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: one ``split`` column.

    ``fractions`` maps split name -> share (must sum to <= 1; any
    remainder falls into the LAST split, so the default 0.98/0.01/0.01
    is exact).  Assignment is contiguous md5-bucket ranges over the doc
    id — a pure projection: no shuffle, no RNG, and (the property that
    matters for training) STABLE under corpus growth: a document's
    split never changes when other documents are added or removed,
    because it depends only on the doc's own id hash.  Split names are
    assigned in dict order over [0, 10000) bucket ranges.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = md5_bucket(id_col)
    expr = None
    lo = 0
    names = list(fractions)
    for name in names[:-1]:
        hi = lo + int(round(fractions[name] * 10_000))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)


def global_rank(
    docs: DataFrame,
    key_col: str,
    tiebreak: tuple[str, ...] = (),
    n_buckets: int = 64,
    pos_col: str = "pos",
) -> DataFrame:
    """0-based global position of every row in (key, *tiebreak) order,
    without a single-partition sort — the same two-phase range-bucket /
    per-bucket window / n_buckets-row prefix cumsum as ``pack_shards``
    (see module docstring), generalized from token offsets to row
    ranks.  ``key_col`` must be numeric (hash string keys to int64
    first); ``tiebreak`` must make the order total or the rank is
    partitioning-dependent.

    The rank window ships EVERY column of ``docs`` through its
    exchange, so for a wide corpus pass a slim (id, key) projection and
    join ``pos`` back by id — exactly what the callers here do.

    NULL keys rank first (deterministically, by tiebreak) in their own
    bucket.  Bucketing arithmetic runs in double so full-range int64
    keys (e.g. xxhash64 output) cannot wrap (__mx - __mn) negative and
    scramble the bucket order; floor of a monotone double map keeps
    buckets monotone in key, which is all correctness needs."""
    rng = docs.agg(F.min(key_col).alias("__mn"), F.max(key_col).alias("__mx"))
    d = docs.crossJoin(F.broadcast(rng))
    kd = F.col(key_col).cast("double")
    width = (F.col("__mx").cast("double") - F.col("__mn").cast("double")) / n_buckets + 1
    d = d.withColumn(
        "__bkt",
        F.when(F.col(key_col).isNull(), F.lit(-1)).otherwise(
            F.floor((kd - F.col("__mn").cast("double")) / width)
        ),
    )
    w_in = Window.partitionBy("__bkt").orderBy(key_col, *tiebreak)
    d = d.withColumn("__rn", F.row_number().over(w_in))
    # materialize once: totals and the final join otherwise each
    # re-execute the scan + window shuffle (same reasoning as
    # pack_shards above); totals then read max(row_number) per bucket
    # off the checkpoint instead of re-aggregating the input
    d = d.localCheckpoint(eager=True)
    totals = d.groupBy("__bkt").agg(F.max("__rn").alias("__t"))
    w_tot = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.select(
        "__bkt", F.coalesce(F.sum("__t").over(w_tot), F.lit(0)).alias("__prefix")
    )
    out = d.join(F.broadcast(prefix), "__bkt")
    return out.select(
        *docs.columns,
        (F.col("__prefix") + F.col("__rn") - 1).cast("long").alias(pos_col),
    )


def shuffle_corpus(
    docs: DataFrame,
    seed: str = "",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a ``pos`` in the order of md5(seed || '|' || id) — a reproducible
    pseudo-random permutation with no RNG state, stable across engines,
    runs, and cluster sizes, re-derivable for any epoch by changing
    ``seed``.  Pretraining requires exactly this: a shuffled corpus
    whose order an auditor can replay.

    The sort key is the md5 top-32-bits (uniform, so the range buckets
    of ``global_rank`` balance); ties (hash collisions) break on the id
    itself, keeping the order total.  Cost: one narrow projection plus
    the two-phase rank — no global single-partition sort.
    """
    key = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    d = docs.withColumn("__shufkey", key)
    ranked = global_rank(
        d, "__shufkey", tiebreak=(id_col,), n_buckets=n_buckets, pos_col="pos"
    )
    return ranked.drop("__shufkey")


def exact_quantiles(
    docs: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """EXACT quantiles of a numeric column, engine- and cluster-size-
    stable — Spark ships only approx_percentile at scale; this builds
    the exact answer on ``global_rank`` (no single-partition sort).

    Semantics = percentile_disc with a deterministic id tiebreak: the
    q-quantile is the value at 0-based rank (q6 * (n-1)) div 1e6 in
    (value, id) order, with q6 = q in integer MICRO-UNITS.  The rank is
    computed in exact integer arithmetic on purpose: floor(double(q) *
    (n-1)) disagrees with decimal/SQL evaluation whenever q*(n-1) is an
    exact integer but q's binary double rounds low (q=0.7, n=91:
    decimal floor(0.7*90)=63, double floor(62.99999...)=62), so a
    double-based pick cannot be reproduced by a SQL oracle.  Cost: one
    slim (id, value) rank plus an n_buckets-row prefix — the payload
    never moves, the source is scanned once (n comes off the
    checkpointed rank, and all quantiles are picked in ONE pass).

    Output: (q, value) — one row per requested quantile, exactly
    reproducible by a row_number restatement in any engine."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(q < 0 or q > 1 for q in qs):
        raise ValueError(f"every q must be in [0, 1], got {qs}")
    slim = docs.select(id_col, value_col).filter(F.col(value_col).isNotNull())
    ranked = global_rank(slim, value_col, tiebreak=(id_col,), n_buckets=n_buckets, pos_col="__pos")
    n = ranked.agg((F.max("__pos") + 1).alias("__n"))
    r = ranked.crossJoin(F.broadcast(n))
    targets = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"),
                F.expr(f"{round(float(q) * 1000000)} * (__n - 1) div 1000000").alias("p"),
            )
            for q in qs
        ]
    )
    hit = F.filter(targets, lambda s: s["p"] == F.col("__pos"))
    return (
        r.select(F.col(value_col).alias("value"), F.explode(hit).alias("__t"))
        .select(F.col("__t.q").alias("q"), "value")
    )


def quantile_band(
    docs: DataFrame,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows whose ``value_col`` lies within the [lo, hi] exact-
    quantile band — the standard outlier trim before curation gates
    (tail lengths are boilerplate or binary junk; head lengths are
    stubs).  The two cutoffs come from ``exact_quantiles`` and join
    back as a 1-row broadcast, so the corpus is filtered scan-side.

    Output: input columns plus ``in_band``."""
    qv = exact_quantiles(docs, value_col, (lo, hi), id_col=id_col)
    cuts = qv.agg(
        F.min(F.when(F.col("q") == float(lo), F.col("value"))).alias("__lo"),
        F.max(F.when(F.col("q") == float(hi), F.col("value"))).alias("__hi"),
    )
    out = docs.crossJoin(F.broadcast(cuts))
    return out.withColumn(
        "in_band",
        (F.col(value_col) >= F.col("__lo")) & (F.col(value_col) <= F.col("__hi")),
    ).drop("__lo", "__hi")
