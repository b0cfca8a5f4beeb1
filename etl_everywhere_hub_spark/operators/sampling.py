"""Deterministic sampling / splitting / packing for training corpora.

TABLESAMPLE and `df.sample` are nondeterministic across runs and
engines, so they are excluded from the correctness contract (SURVEY
§2.B). These operators replace them with md5-derived assignment
(`functions/hashing.py`), which is reproducible bit-for-bit on any
engine and stable under repartitioning — the property a training
pipeline actually needs from its train/val/test split: a document's
split NEVER changes when the corpus grows, shrinks, or reshuffles.

Packing is block-parallel: documents are bucketed by hash into B
independent blocks and greedily packed within each block by a
cumulative-token window. No global ordering, no single-partition
window — each block packs on its own executor, so the operator scales
linearly with B at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_everywhere_hub_spark.functions.hashing import md5_long, stable_bucket


def hash_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, int] | None = None,
    out: str = "split",
) -> DataFrame:
    """Assign each row a deterministic split label by hashed key.

    ``weights`` maps label → integer share (default 8/1/1
    train/val/test). Assignment is pure function of the key: adding or
    removing other rows never moves a row between splits.
    """
    weights = weights or {"train": 8, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = F.pmod(md5_long(F.col(key) if isinstance(key, str) else key), F.lit(total))
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = bucket < F.lit(lo + w)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo += w
    return df.withColumn(out, expr)


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float, resolution: int = 1_000_000
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible and
    engine-portable, unlike df.sample."""
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(F.pmod(md5_long(k), F.lit(resolution)) < int(fraction * resolution))


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: Column,
    target_tokens: int,
    n_blocks: int = 64,
) -> DataFrame:
    """Greedy sequence packing: group documents into ~target_tokens
    packs for training-context assembly.

    Within each hash block, documents are taken in ``key`` order and a
    document opens pack ``floor(preceding_tokens / target)`` — the
    classic streaming first-fit. Output adds (block, pack_id, tokens).
    """
    # Hash on the string form (portable: CAST AS VARCHAR then md5 is
    # identical cross-engine); order on the native type.
    blocked = df.withColumn(
        "block", stable_bucket(F.col(key).cast("string"), n_blocks)
    ).withColumn("tokens", token_col)
    w = Window.partitionBy("block").orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
    preceding = F.coalesce(F.sum("tokens").over(w), F.lit(0))
    return blocked.withColumn(
        "pack_id", F.floor(preceding / F.lit(target_tokens)).cast("bigint")
    )


def global_prefix_sum(
    df: DataFrame,
    value_col: Column | str,
    order_col: str,
    tiebreak_col: str,
    out: str = "cum",
    n_buckets: int = 32,
    descending: bool = True,
    quantile_err: float = 0.01,
) -> DataFrame:
    """Exact running sum over a GLOBAL total order, without the global
    single-partition window (the classic 100 TB scale bug this module's
    docstring forbids).

    Two-phase distributed scan:
      1. bucket boundaries on ``order_col`` via approxQuantile (one
         cheap sketch pass; boundary placement affects only load
         balance, never the result — the bucket id is a monotone pure
         function of the order key, so buckets are contiguous ranges
         of the total order and ties stay within one bucket);
      2. ONE corpus shuffle on the bucket id for the per-bucket
         window cumsum; bucket totals (≤ n_buckets rows) get their own
         cumulative offsets and broadcast-join back.

    ``out`` = offset + local cumsum = the exact global prefix sum over
    (order_col ``descending``, tiebreak_col asc). Cluster sizing: set
    n_buckets ≈ shuffle parallelism; skewed order-key distributions
    still balance because boundaries come from measured quantiles.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = (
        sorted(set(df.stat.approxQuantile(order_col, probs, quantile_err)))
        if probs
        else []
    )
    key = F.col(order_col)
    bucket = F.lit(0)
    for b in bounds:
        # monotone in the order direction: earlier-ordered keys → lower id
        bucket = bucket + F.when(key < F.lit(b) if descending else key > F.lit(b), 1).otherwise(0)
    tagged = df.withColumn("__bucket", bucket.cast("int")).withColumn("__v", v)
    order = [key.desc() if descending else key.asc(), F.col(tiebreak_col).asc()]
    local_w = (
        Window.partitionBy("__bucket").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = tagged.withColumn("__local_cum", F.sum("__v").over(local_w))
    totals = tagged.groupBy("__bucket").agg(F.sum("__v").alias("__total"))
    off_w = (
        Window.orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # ≤ n_buckets rows: the single-partition window is bounded, not corpus-sized
    offsets = totals.withColumn("__offset", F.coalesce(F.sum("__total").over(off_w), F.lit(0)))
    return (
        local.join(F.broadcast(offsets.select("__bucket", "__offset")), "__bucket")
        .withColumn(out, F.col("__offset") + F.col("__local_cum"))
        .drop("__bucket", "__v", "__local_cum", "__offset")
    )


def global_prefix_min(
    df: DataFrame,
    value_col: Column | str,
    order_col: str,
    tiebreak_col: str,
    out: str = "prefix_min",
    n_buckets: int = 32,
    quantile_err: float = 0.01,
) -> DataFrame:
    """Exact running MIN over a global ascending total order on
    ``order_col``, EXCLUSIVE of the current row (null for the global
    first row) — same two-phase shape as ``global_prefix_sum``: range
    buckets from an approxQuantile sketch (placement affects load
    balance only), per-bucket window pass, ≤ n_buckets cumulative
    bucket minima broadcast back as offsets. The strictly-preceding
    frame is what dominance-style consumers (Pareto frontier q197)
    need: "best value among everything ordered before me"."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = (
        sorted(set(df.stat.approxQuantile(order_col, probs, quantile_err)))
        if probs
        else []
    )
    key = F.col(order_col)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(key > F.lit(b), 1).otherwise(0)
    tagged = df.withColumn("__bucket", bucket.cast("int")).withColumn("__v", v)
    local_w = (
        Window.partitionBy("__bucket")
        .orderBy(key.asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = tagged.withColumn("__local_min", F.min("__v").over(local_w))
    totals = tagged.groupBy("__bucket").agg(F.min("__v").alias("__total"))
    off_w = (
        Window.orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # ≤ n_buckets rows: bounded single-partition window
    offsets = totals.withColumn("__offset", F.min("__total").over(off_w))
    # least() skips nulls (null only when BOTH are null = global first)
    return (
        local.join(F.broadcast(offsets.select("__bucket", "__offset")), "__bucket")
        .withColumn(out, F.least(F.col("__offset"), F.col("__local_min")))
        .drop("__bucket", "__v", "__local_min", "__offset")
    )


def global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    out: str = "rank",
    descending: bool = True,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact 1-based global row_number over (order_col, tiebreak)
    WITHOUT a single-partition window: global_prefix_sum of the
    constant 1 (range-bucketed two-phase scan). The building block
    for distributed ntile/percent_rank: downstream arithmetic on the
    exact rank replaces the global window the naive formulation
    needs."""
    return global_prefix_sum(
        df,
        F.lit(1),
        order_col=order_col,
        tiebreak_col=tiebreak_col,
        out=out,
        n_buckets=n_buckets,
        descending=descending,
    ).withColumn(out, F.col(out).cast("long"))


def exact_ntile(rank_col: str, n_col: str, tiles: int):
    """ntile(``tiles``) as pure integer arithmetic over an exact
    1-based global rank (``global_rank``) and a total count column —
    the distributed replacement for the single-partition global ntile
    window. Implements ntile's documented sizing exactly: the first
    (n mod tiles) tiles take ceil(n/tiles) rows, the rest
    floor(n/tiles). All `div`/`%` — exact past 2^53-scale ranks
    (no float anywhere). Returns a Column; tiles must be a literal."""
    from pyspark.sql import functions as F

    big = f"({n_col} div {tiles})"
    rem = f"({n_col} % {tiles})"
    cut = f"(({big} + 1) * {rem})"
    return F.expr(
        f"CASE WHEN {rank_col} <= {cut} "
        f"THEN ({rank_col} - 1) div ({big} + 1) + 1 "
        f"ELSE {rem} + ({rank_col} - {cut} - 1) div {big} + 1 END"
    )


def grouped_global_prefix_sum(
    df: DataFrame,
    value_col: Column | str,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    out: str = "prefix_sum",
    n_buckets: int = 32,
    quantile_err: float = 0.01,
    descending: bool = True,
) -> DataFrame:
    """Exact inclusive prefix sum over a PER-GROUP total order on
    (order_col ``descending``, tiebreak asc) — the grouped
    generalization of ``global_prefix_sum`` for when each group's
    slice is itself corpus-scale (per-language vocabulary ranks, per-
    tenant orderings): a plain Window.partitionBy(group) would put one
    whole group in one task.

    Same two-phase shape, shared across groups: ONE global
    approxQuantile sketch on ``order_col`` places range-bucket
    boundaries (placement affects load balance only — the bucket id is
    a monotone pure function of the order key, so ties never straddle
    buckets); the local cumsum window partitions by (group, bucket) —
    each task holds one group's slice of one order range — and the
    offset cascade is a window PARTITIONED BY GROUP over that group's
    ≤ n_buckets bucket totals (bounded per partition, so the registry
    window gate passes structurally, not by whitelist). The totals
    join back on (group, bucket): a groups×n_buckets table that AQE
    typically broadcasts."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = (
        sorted(set(df.stat.approxQuantile(order_col, probs, quantile_err)))
        if probs
        else []
    )
    key = F.col(order_col)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(
            key < F.lit(b) if descending else key > F.lit(b), 1
        ).otherwise(0)
    tagged = df.withColumn("__bucket", bucket.cast("int")).withColumn("__v", v)
    order = [key.desc() if descending else key.asc(), F.col(tiebreak_col).asc()]
    local_w = (
        Window.partitionBy(group_col, "__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = tagged.withColumn("__local_cum", F.sum("__v").over(local_w))
    totals = tagged.groupBy(group_col, "__bucket").agg(F.sum("__v").alias("__total"))
    off_w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # ≤ n_buckets rows PER GROUP: bounded per partition
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__total").over(off_w), F.lit(0))
    )
    return (
        local.join(offsets.select(group_col, "__bucket", "__offset"), [group_col, "__bucket"])
        .withColumn(out, F.col("__offset") + F.col("__local_cum"))
        .drop("__bucket", "__v", "__local_cum", "__offset")
    )


def grouped_global_rank(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    out: str = "rank",
    descending: bool = True,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact 1-based per-group row_number over (order_col, tiebreak)
    without a per-group corpus-scale window — ``grouped_global_prefix_sum``
    of the constant 1."""
    return grouped_global_prefix_sum(
        df,
        F.lit(1),
        group_col=group_col,
        order_col=order_col,
        tiebreak_col=tiebreak_col,
        out=out,
        n_buckets=n_buckets,
        descending=descending,
    ).withColumn(out, F.col(out).cast("long"))
