"""Round-5 measured scaling check (SCALE.md §2e): replicate the sf0.1
documents table 10x (distinct doc_ids, identical text distribution) and
time the new round-5 operators at 1x vs 10x — linear-work claims
measured, not asserted.

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/scale10_r5.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
X10 = "/tmp/scale10_r5"


def main() -> None:
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "32")
    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.queries import REGISTRY
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("scale10-r5")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{X10}/documents.parquet"):
        d = spark.read.parquet(f"{SF}/documents.parquet")
        reps = None
        for i in range(10):
            r = d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            reps = r if reps is None else reps.unionAll(r)
        reps.write.mode("overwrite").parquet(f"{X10}/documents.parquet")
        # embeddings too (for ops that join them — not used below, kept
        # for parity with the fixture layout)
        spark.read.parquet(f"{SF}/embeddings.parquet").write.mode(
            "overwrite"
        ).parquet(f"{X10}/embeddings.parquet")

    if not os.path.exists(f"{X10}/orders.parquet"):
        # 10x the relational facts too (distinct orderkeys, FK-consistent
        # lineitem copies, distinct custkeys) for the q249+ stats ops.
        # Same date range: the calendar-bounded series ops (q250/q254/
        # q256) should scale only in their first fact groupBy.
        o = spark.read.parquet(f"{SF}/orders.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        c = spark.read.parquet(f"{SF}/customer.parquet")
        ro = rl = rc = None
        for i in range(10):
            off = F.lit(i * 1_000_000_000)
            r1 = o.withColumn("o_orderkey", F.col("o_orderkey") + off)
            r2 = li.withColumn("l_orderkey", F.col("l_orderkey") + off)
            r3 = c.withColumn("c_custkey", F.col("c_custkey") + off)
            ro = r1 if ro is None else ro.unionAll(r1)
            rl = r2 if rl is None else rl.unionAll(r2)
            rc = r3 if rc is None else rc.unionAll(r3)
        ro.write.mode("overwrite").parquet(f"{X10}/orders.parquet")
        rl.write.mode("overwrite").parquet(f"{X10}/lineitem.parquet")
        rc.write.mode("overwrite").parquet(f"{X10}/customer.parquet")

    names = [
        "q218_skipgram_pmi",         # map-side lead pair build (1 shuffle)
        "q224_zipf_slope",           # global_rank two-phase vocab rank
        "q232_winnowing_fingerprints",  # pure map-side folds
        "q234_domain_blocklist",     # suffix explode + broadcast equi
        "q239_content_defined_chunking",  # map-only
        "q249_ks_two_sample",        # two-phase CDF prefix sums
        "q250_autocorr_daily",       # calendar-bounded series after 1 groupBy
        "q251_hits_copurchase",      # equi-join aggregateMessages half-steps
        "q252_mann_whitney_u",       # one prefix-sum pass + one agg
        "q253_sorted_neighborhood",  # global_rank + rank+k equi self-join
        "q254_seasonal_backtest",    # shifted-day equi self-joins
        "q255_weekly_ks_drift",      # week-partitioned CDF windows
        "q256_haar_blocks",          # two aggregations
    ]
    out = {}
    for name in names:
        q = REGISTRY[name]
        times = {}
        for label, sf_dir in [("x1", SF), ("x10", X10)]:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            spark.catalog.clearCache()
            times[label] = round(best, 3)
        times["ratio"] = round(times["x10"] / times["x1"], 2)
        out[name] = times
        print(name, times, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
