"""Density clustering — DBSCAN re-expressed as grid equi-joins + star
contraction.

DBSCAN's textbook formulation is a sequential region-growing scan with
a spatial index; at 100 TB the same fixed-point decomposes into three
scale-safe pieces (Patwary et al.'s disjoint-set parallelization,
expressed relationally):

1. the eps-neighbor graph via the grid-cell blocking pattern
   (queries.py q127 / q156): bucket points into eps-sized cells,
   explode ONE side to its 3x3 neighborhood, equi-join on the cell
   key, exact-distance filter — O(n * density), never O(n^2);
2. core points by degree (one groupBy);
3. clusters = connected components of the core-core subgraph
   (operators/graph.py star contraction, O(log n) rounds), labeled by
   the component's minimum core id.

Border points (non-core with a core neighbor) join the MINIMUM
cluster label among their core neighbors — the deterministic variant
of classic DBSCAN's first-found assignment (which is scan-order
dependent and therefore unsuitable for a reproducible pipeline).
Everything else is noise. Identical answers to the sequential
algorithm up to that border tie rule.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_everywhere_hub_spark.operators.graph import connected_components


def grid_dbscan(
    pts: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "lon",
    y_col: str = "lat",
) -> DataFrame:
    """DBSCAN over 2-D points. Returns (id, role, cluster): role in
    ('core', 'border', 'noise'); cluster = min core id of the
    component (-1 for noise). The eps-neighborhood is CLOSED (the
    point itself counts toward min_pts, as in the original paper).
    """
    cell = eps
    eps2 = eps * eps
    p = pts.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).withColumn("cx", F.floor(F.col("x") / cell).cast("long")).withColumn(
        "cy", F.floor(F.col("y") / cell).cast("long")
    )
    a = (
        p.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("x_a"),
            F.col("y").alias("y_a"),
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    b = p.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("x_b"),
        F.col("y").alias("y_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("x_a") - F.col("x_b")) * (F.col("x_a") - F.col("x_b")) + (
        F.col("y_a") - F.col("y_b")
    ) * (F.col("y_a") - F.col("y_b"))
    # every ORDERED pair once: a's exploded neighborhood covers b's
    # single home cell, so (u,v) and (v,u) each appear exactly once
    nb = (
        a.join(b, ["jx", "jy"])
        .filter((F.col("id_a") != F.col("id_b")) & (d2 <= F.lit(eps2)))
        .select("id_a", "id_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = nb.groupBy("id_a").agg(F.count(F.lit(1)).alias("n_nb"))
    roles = p.select("id").join(
        deg.withColumnRenamed("id_a", "id"), "id", "left"
    ).select(
        "id",
        ((F.coalesce(F.col("n_nb"), F.lit(0)) + 1) >= min_pts).alias(
            "is_core"
        ),
    )
    cores = roles.filter(F.col("is_core")).select("id")
    core_edges = (
        nb.join(cores.withColumnRenamed("id", "id_a"), "id_a")
        .join(cores.withColumnRenamed("id", "id_b"), "id_b")
        .select("id_a", "id_b")
    )
    comp = connected_components(core_edges, "id_a", "id_b")
    core_lbl = cores.join(comp, "id", "left").select(
        "id", F.coalesce(F.col("component"), F.col("id")).alias("cluster")
    )
    border_lbl = (
        nb.join(
            core_lbl.withColumnRenamed("id", "id_b").withColumnRenamed(
                "cluster", "nb_cluster"
            ),
            "id_b",
        )
        .join(
            roles.filter(~F.col("is_core")).withColumnRenamed("id", "id_a"),
            "id_a",
        )
        .groupBy("id_a")
        .agg(F.min("nb_cluster").alias("cluster"))
        .withColumnRenamed("id_a", "id")
    )
    out = (
        roles.join(core_lbl.withColumnRenamed("cluster", "c_core"), "id", "left")
        .join(border_lbl.withColumnRenamed("cluster", "c_border"), "id", "left")
        .select(
            "id",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("c_border").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("c_core"), F.col("c_border"), F.lit(-1))
            .cast("long")
            .alias("cluster"),
        )
    )
    return out
