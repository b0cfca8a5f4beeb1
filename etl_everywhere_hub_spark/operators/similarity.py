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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_everywhere_hub_spark.functions.hashing import md5_long
from etl_everywhere_hub_spark.functions.vectors import cosine, cosine_exact, dot


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
    # Expr-string twins of functions.vectors.dot / dot_exact /
    # norm_exact (round 12: one py4j round trip per projection instead
    # of one per Column — same expressions, pinned by the oracle).
    _DEC = "decimal(38,18)"

    def dot_expr(a: str, b: str) -> str:
        if exact:
            return (
                f"cast(aggregate(zip_with({a}, {b}, (x, y) ->"
                f" cast(cast(x AS double) * cast(y AS double) AS {_DEC})),"
                f" cast(0 AS {_DEC}), (acc, v) -> cast(acc + v AS {_DEC}))"
                f" AS double)"
            )
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) ->"
            f" cast(x AS double) * cast(y AS double)), 0.0d,"
            f" (acc, v) -> acc + v)"
        )

    # Norms are computed ONCE per row on each side and carried through
    # the join — scoring each pair is a single 64-wide fold instead of
    # three (bit-identical result: dp/(qn*cn) with the same fold shapes
    # the oracle uses).
    q = F.broadcast(
        queries.selectExpr(
            f"`{id_col}` AS query_id",
            f"`{vec_col}` AS __qv",
            f"sqrt({dot_expr(f'`{vec_col}`', f'`{vec_col}`')}) AS __qn",
        )
    )
    c = corpus.selectExpr(
        f"`{id_col}` AS neighbor_id",
        f"`{vec_col}` AS __cv",
        f"sqrt({dot_expr(f'`{vec_col}`', f'`{vec_col}`')}) AS __cn",
    )
    scored = (
        c.crossJoin(q)
        .filter("NOT (neighbor_id = query_id)")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{dot_expr('__qv', '__cv')} / (__qn * __cn) AS cosine_sim",
        )
    )
    return (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk",
        )
        .filter(f"rnk <= {k}")
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
    n_planes: int = 4,
    n_tables: int = 12,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures over ``n_tables``
    independent tables of ``n_planes`` bits; candidates = corpus rows
    sharing a (table, signature) bucket with the query; exact cosine
    rerank of candidates only.

    Signatures come from ONE Arrow-batched pandas UDF doing a numpy
    matmul against the (tables×planes, dim) plane matrix — the
    sanctioned vectorized-Python path (a per-plane column expression
    tree overflows janino codegen and is ~100× slower). The bucket
    join is equi-shaped (shuffle on small int keys), so at 100 TB the
    cost is |corpus| signatures + collision-bounded rerank — never a
    cross join.

    Defaults (4 bits × 12 tables) target ≳0.8 recall at cosine ≈ 0.4
    on 64-dim data; more tables → higher recall, linearly more
    candidate volume.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [_hyperplane(dim, i) for i in range(n_tables * n_planes)]
    )  # (T*P, dim)
    weights = 1 << np.arange(n_planes)

    @pandas_udf("array<long>")
    def table_sigs(v: pd.Series) -> pd.Series:
        E = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (E @ planes.T) >= 0  # (n, T*P)
        sigs = bits.reshape(len(E), n_tables, n_planes) @ weights  # (n, T)
        return pd.Series(list(sigs))

    def signatures(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias(side), F.col(vec_col).alias("__v"))
            .withColumn("__sigs", table_sigs(F.col("__v")))
            .select(
                side, "__v", F.posexplode(F.col("__sigs")).alias("table", "sig")
            )
        )

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


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed Lloyd (spherical k-means) for IVF/PQ
    codebooks — VERDICT r3 item #4, replacing bare lowest-id seeding.

    Seeds are the ``n_cells`` lowest-id corpus vectors (no RNG); each
    iteration is the q145 step distributed and made run-reproducible:

    - E-step: nearest-centroid-by-cosine assignment via ONE broadcast
      numpy matmul per Arrow batch (map-only, ties break on lower cell
      index via argmax-first-occurrence);
    - M-step: per-(cell, dim) mean where the SUM folds through exact
      micro-int64 (floor(x*1e6 + 0.5)) — integer addition is
      order-independent, so the trained centroids are bit-identical
      across runs and cluster layouts, unlike a float sum whose value
      depends on partition merge order. The collect is bounded:
      n_cells x dim rows per iteration (16 x 64 = 1024 here), same
      bound class as the seed collect.

    Empty cells keep their previous centroid. Returns (C, dim) float64.
    """
    from pyspark.sql.functions import pandas_udf

    seeds = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([list(r[0]) for r in seeds], dtype=np.float64)
    dim = centroids.shape[1]
    for _ in range(train_iters):
        cent = centroids
        c_norm = np.linalg.norm(cent, axis=1)
        c_norm[c_norm == 0.0] = 1.0

        @pandas_udf("int")
        def nearest_cell(v: pd.Series) -> pd.Series:
            E = np.vstack(v.to_numpy()).astype(np.float64)
            n = np.linalg.norm(E, axis=1)
            n[n == 0.0] = 1.0
            sims = (E @ cent.T) / (n[:, None] * c_norm[None, :])
            return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

        stats = (
            corpus.select(
                nearest_cell(F.col(vec_col)).alias("cell"),
                F.posexplode(F.col(vec_col)).alias("i", "x"),
            )
            .groupBy("cell", "i")
            .agg(
                F.sum(
                    F.floor(F.col("x").cast("double") * 1_000_000 + F.lit(0.5))
                ).alias("sm"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = centroids.copy()
        for r in stats:
            new[r["cell"], r["i"]] = (r["sm"] / 1_000_000.0) / r["n"]
        centroids = new
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    train_iters: int = 2,
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    ``n_cells`` Voronoi cells, search only the query's ``n_probe``
    nearest cells, exact-rerank inside them.

    Centroids are Lloyd-trained (``train_iters`` deterministic
    spherical-k-means iterations over lowest-id seeds — see
    ``train_ivf_centroids``; ``train_iters=0`` reproduces the r1-r3
    seed-only behavior). Assignment ships as ONE broadcast numpy
    matmul per Arrow batch; the probe join is equi-shaped on cell id,
    so at 100 TB the cost is train_iters + 1 corpus passes +
    (n_probe/n_cells)·|corpus| reranks.
    """
    from pyspark.sql.functions import pandas_udf

    centroids = train_ivf_centroids(
        corpus, n_cells=n_cells, train_iters=train_iters,
        id_col=id_col, vec_col=vec_col,
    )
    c_norm = np.linalg.norm(centroids, axis=1)

    def cell_udf(n_top: int):
        @pandas_udf("array<int>")
        def cells(v: pd.Series) -> pd.Series:
            E = np.vstack(v.to_numpy()).astype(np.float64)
            sims = (E @ centroids.T) / (
                np.linalg.norm(E, axis=1)[:, None] * c_norm[None, :]
            )
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_top]
            return pd.Series(list(top.astype(np.int32)))

        return cells

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.element_at(cell_udf(1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(cell_udf(n_probe)(F.col(vec_col))).alias("cell"),
    )
    cand = q.join(c, on="cell").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
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

    Round 13 (guide §1.2 per-task work, §2.5): (a) per-VECTOR norms
    are computed once per row and carried through the join, so scoring
    a pair is ONE interpreted d-wide fold instead of three —
    bit-identical (dp/(na·nb) with the same fold shapes; the r12
    cosine_topk precedent, now on the pair path that was paying 3
    folds × every in-block pair); (b) when the build side broadcasts,
    the whole pair probe inherits the scan's partitioning — one task
    on a one-split fixture (q183's 8k-edge build measured 19.8 s on
    one core) — so the input spreads with the same no-op-at-scale
    guard as queries._spread_scan."""
    from etl_everywhere_hub_spark.catalog import estimated_scan_splits

    cores = df.sparkSession.sparkContext.defaultParallelism
    if estimated_scan_splits(df) < cores:
        df = df.repartition(cores, id_col)
    norm = F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
    cols_a = [F.col(id_col).alias("a"), F.col(vec_col).alias("__va"), norm.alias("__na")]
    cols_b = [F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"), norm.alias("__nb")]
    if block_col is not None:
        a = df.select(*cols_a, F.col(block_col).alias("__blk"))
        b = df.select(*cols_b, F.col(block_col).alias("__blk"))
        pairs = a.join(b, on="__blk").filter(F.col("a") < F.col("b"))
    else:
        a = df.select(*cols_a)
        b = df.select(*cols_b)
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a",
            "b",
            (
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
