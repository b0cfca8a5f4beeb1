"""Round-5 third-wave measured scaling check (SCALE.md §2f): reuses
tools/scale10_r5b.py's replicated-10x fixtures (documents/orders/
customer/events, distinct keys) and times the q287+ operators at 1x
vs 10x. A ratio near 10 on local[32] means the operator's work grows
linearly with the data (no quadratic pair blow-up, no single-task
serialization); well under 10 means fixed overheads still dominate at
sf0.1.

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/scale10_r5c.py
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

    spark = get_spark("scale10-r5c")
    spark.sparkContext.setLogLevel("ERROR")

    # Same replicated fixtures as r5/r5b (self-contained: /tmp does not
    # survive across sessions).
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
    if not os.path.exists(f"{X10}/events.parquet"):
        e = load_table(spark, SF, "events")
        reps = None
        for i in range(10):
            r = e.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            reps = r if reps is None else reps.unionAll(r)
        reps.write.mode("overwrite").parquet(f"{X10}/events.parquet")
    # embeddings for q294/q306 (distinct vec_ids; vectors repeat, which
    # is fine — the rank/ntile work grows with rows, not vector values)
    if not os.path.exists(f"{X10}/embeddings.parquet"):
        em = spark.read.parquet(f"{SF}/embeddings.parquet")
        re_ = None
        for i in range(10):
            r = em.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000_000))
            re_ = r if re_ is None else re_.unionAll(r)
        re_.write.mode("overwrite").parquet(f"{X10}/embeddings.parquet")
    # lineitem for q288 (distinct orders, same parts so co-purchase
    # pairs keep colliding — the realistic growth mode: more baskets
    # over a fixed catalog).
    if not os.path.exists(f"{X10}/lineitem.parquet"):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        rl = None
        for i in range(10):
            r = li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 1_000_000_000)
            )
            rl = r if rl is None else rl.unionAll(r)
        rl.write.mode("overwrite").parquet(f"{X10}/lineitem.parquet")

    names = [
        "q287_window_distribution_funcs",  # per-user rank windows
        "q288_adamic_adar",                # basket-bounded pair fan-out
        "q290_hll_sketch_audit",           # register build (64/group)
        "q291_kfold_target_encoding",      # one scan, 25-cell agg
        "q293_mutual_information",         # bounded contingency agg
        "q294_roc_auc",                    # two-phase global rank
        "q296_time_to_next_purchase",      # merge window, no join
        "q297_event_sequence_regex",       # sessionize + regex flags
        "q298_activity_streaks",           # islands window
        "q300_holt_linear_smoothing",      # day agg + bounded recursion
        "q301_c4_filter_report",           # map-side HOFs + 1-row agg
        "q303_grouped_weighted_median",    # grouped two-phase prefix sum
        "q304_bitmap_index_audit",         # packed words + popcount
        "q306_decile_lift_table",          # global_rank + exact ntile
        "q307_time_decay_engagement",      # map expr + keyed agg
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
