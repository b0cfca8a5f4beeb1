"""Round-5 second-wave measured scaling check (SCALE.md §2f): extends
tools/scale10_r5.py's replicated-10x fixtures with events, then times
the q260+ operators at 1x vs 10x.

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/scale10_r5b.py
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

    from etl_everywhere_hub_spark.catalog import load_table
    from etl_everywhere_hub_spark.queries import REGISTRY
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("scale10-r5b")
    spark.sparkContext.setLogLevel("ERROR")

    # Build every replicated table this run needs (10x, distinct keys —
    # same construction as tools/scale10_r5.py, self-contained because
    # /tmp does not survive across sessions).
    if not os.path.exists(f"{X10}/documents.parquet"):
        d = spark.read.parquet(f"{SF}/documents.parquet")
        reps = None
        for i in range(10):
            r = d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            reps = r if reps is None else reps.unionAll(r)
        reps.write.mode("overwrite").parquet(f"{X10}/documents.parquet")

    if not os.path.exists(f"{X10}/orders.parquet"):
        o = spark.read.parquet(f"{SF}/orders.parquet")
        ro = None
        for i in range(10):
            r = o.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * 1_000_000_000)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * 1_000_000))
            ro = r if ro is None else ro.unionAll(r)
        ro.write.mode("overwrite").parquet(f"{X10}/orders.parquet")

    if not os.path.exists(f"{X10}/customer.parquet"):
        c = spark.read.parquet(f"{SF}/customer.parquet")
        rc = None
        for i in range(10):
            r = c.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 1_000_000))
            rc = r if rc is None else rc.unionAll(r)
        rc.write.mode("overwrite").parquet(f"{X10}/customer.parquet")

    # events: distinct event_ids, distinct users so the keyed windows
    # and per-user state grow with the data.
    if not os.path.exists(f"{X10}/events.parquet"):
        e = load_table(spark, SF, "events")
        reps = None
        for i in range(10):
            r = e.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            reps = r if reps is None else reps.unionAll(r)
        reps.write.mode("overwrite").parquet(f"{X10}/events.parquet")

    names = [
        "q260_kmv_distinct_sketch",      # distinct + WindowGroupLimit sketch
        "q262_simhash_band_pairs",       # 48 vote aggs + band equi self-join
        "q264_shingle_containment",      # inverted-index candidates
        "q266_top_p_vocab",              # grouped two-phase prefix sum
        "q270_grouped_exact_percentiles",  # grouped_global_rank on the fact
        "q272_count_min_sketch",         # fixed 4096-cell aggregation
        "q277_varint_delta_size_audit",  # one keyed window + agg
        "q279_join_blowup_profiler",     # two per-key aggs + key join
        "q283_minhash_estimate_audit",   # signatures + banded candidates
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
