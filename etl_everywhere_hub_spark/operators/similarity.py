"""Similarity search over embedding columns (SURVEY.md §2.B).

- ``cosine_topk``: brute-force top-k for a bounded query set. The
  query side is broadcast, so the corpus streams through map-side —
  no shuffle until the final per-query top-k window (tiny). Linear in
  |corpus| × |queries|; the correct baseline and the oracle.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing (deterministic
  md5-seeded planes) → candidates share ≥1 bucket → exact rerank.
  Sub-linear candidate set; the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_everywhere_hub_spark.functions.hashing import md5_long
from etl_everywhere_hub_spark.functions.vectors import cosine, cosine_exact


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Top-k corpus neighbors per query vector by cosine similarity.

    ``exact=True`` uses the decimal-fold dot product (bit-stable vs the
    oracle); production uses exact=False (double fold, codegen-fast).
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    sim_fn = cosine_exact if exact else cosine
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            sim_fn(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes.

    Component i = (md5-derived byte in [0,255]) - 127.5, reproducible
    across runs/engines without any RNG.
    """
    import hashlib

    vals: list[float] = []
    counter = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane|{plane_idx}|{counter}".encode()).digest()
        vals.extend(b - 127.5 for b in h)
        counter += 1
    return vals[:dim]


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures over ``n_tables``
    independent tables of ``n_planes`` bits; candidates = corpus rows
    sharing a (table, signature) bucket with the query; exact cosine
    rerank of candidates only.

    The bucket join is equi-shaped (shuffle on 64-bit bucket keys), so
    at 100 TB the cost is |corpus| signatures + collision-bounded
    rerank — never a cross join.
    """

    def signatures(df: DataFrame, side: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(side), F.col(vec_col).alias("__v"))
        sig_cols = []
        for t in range(n_tables):
            bits = []
            for p in range(n_planes):
                plane = _hyperplane(dim, t * n_planes + p)
                dot = None
                # constant-folded linear combination; stays in codegen
                expr = F.lit(0.0)
                for i, w_i in enumerate(plane):
                    expr = expr + F.element_at(F.col("__v"), i + 1).cast("double") * F.lit(w_i)
                bits.append(F.when(expr >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
            sig = bits[0]
            for b in bits[1:]:
                sig = sig + b
            sig_cols.append(F.struct(F.lit(t).alias("table"), sig.alias("sig")))
        return out.select(
            side, "__v", F.explode(F.array(*sig_cols)).alias("bucket")
        ).select(side, "__v", F.col("bucket.table").alias("table"), F.col("bucket.sig").alias("sig"))

    qs = signatures(queries, "query_id").withColumnRenamed("__v", "__qv")
    cs = signatures(corpus, "neighbor_id").withColumnRenamed("__v", "__cv")
    cands = (
        qs.join(cs, on=["table", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def cosine_near_dup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding near-dup pairs (a<b, cosine ≥ threshold) within blocks.

    ``block_col`` bounds the pair space (label/LSH bucket); None means
    all-pairs — oracle scale only.
    """
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"))
    if block_col is not None:
        a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"), F.col(block_col).alias("__blk"))
        b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"), F.col(block_col).alias("__blk"))
        pairs = a.join(b, on="__blk").filter(F.col("a") < F.col("b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a", "b", cosine(F.col("__va"), F.col("__vb")).alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
