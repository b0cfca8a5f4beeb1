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
