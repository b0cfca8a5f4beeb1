"""Headline-query benchmark — the driver's per-round perf probe.

Runs the registry's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized through the noop sink (forces every
stage, no driver collect cost); wall-clock per query is reported and
the headline metric is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    from etl_everywhere_hub_spark.queries import headline_queries
    from etl_everywhere_hub_spark.session import get_spark

    # Shuffle partitions sized to the DATA, not the core count
    # (SCALE.md §1: over-partition only when there are bytes to
    # spread). The sf0.1 fixtures shuffle ≤ a few MB per exchange, so
    # core-count partitions are pure per-task overhead — measured 25-30%
    # on the shuffle-stage-heavy q41 (alternating 32-vs-8 A/B, warm
    # session). Honors an explicit SPARK_SHUFFLE_PARTITIONS override;
    # on a cluster the env carries the real (much larger) setting.
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM once so q1's number is the engine, not first-touch
    # JIT: exercise the vectorized parquet reader, hash-agg with a
    # decimal fold, a window, and a shuffle join — the codepaths the
    # headline queries live on.
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
    ).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count().collect()

    # Two passes per query, report the min: this VM is shared and
    # single runs see 2-3x spikes from external load; the min is the
    # engine's actual cost (the quantity that transfers to a cluster).
    timings: dict[str, float] = {}
    for name, q in sorted(headline_queries().items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        # queries persist() frames they consume more than once; drop
        # them between queries so a registry sweep doesn't accumulate
        # executor memory (each query still re-pays its own cache fill
        # on the second run — both runs measure the same work)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "runs_per_query": 2,
                "aggregation": "min",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
