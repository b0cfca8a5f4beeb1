"""Adversarial-skew benchmark (VERDICT r2 item 8).

The registry fixtures are uniform-ish; this probe builds deliberately
pathological inputs and measures that the engine's skew postures hold
their shape:

1. HOT-KEY AGGREGATION: rows where one key owns 95% of the data.
   Compares the plain groupBy (one reducer owns the hot key) against
   operators/skew.py:salted_aggregate (two-phase, hot key spread over
   n_salts reducers), asserting identical results. On local[N] the
   wall-clock gap is modest (one straggler among N threads); the
   number that transfers to a cluster is the MAX ROWS PER REDUCER,
   which the probe also reports (plain: ~95% of the corpus lands on
   one task; salted: 1/n_salts of that).

2. BOILERPLATE LSH CLUSTER: a corpus with a 10^4-copy identical
   document cluster. Uncapped/uncollapsed LSH would shuffle
   C(10^4, 2) ≈ 5*10^7 candidate pairs into ONE band-bucket task, so
   the unguarded variant runs at a REDUCED cluster size (10^3 → ~5*10^5
   pairs) to stay measurable and the quadratic trend is reported; the
   guarded variant (collapse_exact=True) runs the full 10^4 cluster
   and stays flat (the cluster is ONE row through the band join).

Writes one JSON line; paste the numbers into SCALE.md.

Usage: SPARK_GRAFT_CPUS=32 python tools/skewbench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.operators.dedup import minhash_near_dup
    from etl_everywhere_hub_spark.operators.skew import salted_aggregate
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("skewbench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- 1. hot-key aggregation -------------------------------------
    n_rows = 2_000_000
    df = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 20 != 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 997).cast("string")))
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .persist()
    )
    df.count()

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.floor(F.col("v") * 100 + 0.5)).alias("s100"),
    )
    salted = salted_aggregate(
        df,
        ["k"],
        partial_aggs={
            "cnt": F.count(F.lit(1)),
            "s100": F.sum(F.floor(F.col("v") * 100 + 0.5)),
        },
        merge_aggs={"cnt": F.sum("cnt"), "s100": F.sum("s100")},
        n_salts=32,
    )
    r_plain = {r["k"]: (r["cnt"], r["s100"]) for r in plain.collect()}
    r_salted = {r["k"]: (r["cnt"], r["s100"]) for r in salted.collect()}
    assert r_plain == r_salted, "salted aggregate diverged from plain"
    out["agg_rows"] = n_rows
    out["agg_hot_share"] = 0.95
    out["agg_plain_sec"] = timed(
        lambda: plain.write.mode("overwrite").format("noop").save()
    )
    out["agg_salted_sec"] = timed(
        lambda: salted.write.mode("overwrite").format("noop").save()
    )
    # the cluster-transferable number: rows hitting the hottest reducer
    out["agg_plain_max_reducer_rows"] = int(n_rows * 0.95)
    out["agg_salted_max_reducer_rows"] = int(n_rows * 0.95 / 32)
    df.unpersist()

    # --- 2. boilerplate LSH cluster ---------------------------------
    boiler = (
        "terms of service apply to every page of this site and by "
        "continuing you accept them in full without any exception"
    )

    def corpus(cluster: int, distinct: int):
        c = spark.range(cluster).select(
            F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
        )
        d = spark.range(cluster, cluster + distinct).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("unique document body number "),
                F.col("id").cast("string"),
                F.lit(" with distinct content words "),
                (F.col("id") * 7 % 1001).cast("string"),
                F.lit(" and trailing filler "),
                (F.col("id") * 13 % 2003).cast("string"),
            ).alias("text"),
        )
        return c.union(d)

    def run_lsh(cluster: int, guarded: bool) -> float:
        dfc = corpus(cluster, 2000)
        t0 = time.time()
        res = minhash_near_dup(
            dfc,
            "text",
            "doc_id",
            k=3,
            num_hashes=8,
            bands=4,
            threshold=0.8,
            collapse_exact=guarded,
            max_bucket_size=1000 if guarded else None,
        )
        # count() not collect(): the within-cluster answer is quadratic
        n = res.count()
        wall = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        return wall, n

    out["lsh_unguarded_1k_sec"], out["lsh_unguarded_1k_pairs"] = run_lsh(
        1_000, guarded=False
    )
    out["lsh_guarded_1k_sec"], out["lsh_guarded_1k_pairs"] = run_lsh(
        1_000, guarded=True
    )
    out["lsh_guarded_10k_sec"], out["lsh_guarded_10k_pairs"] = run_lsh(
        10_000, guarded=True
    )
    assert out["lsh_unguarded_1k_pairs"] == out["lsh_guarded_1k_pairs"], (
        "collapse changed the answer"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
