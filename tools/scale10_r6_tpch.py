"""Round-6 measured scaling check for the TPC-H headline set
(VERDICT r5 #5 / SCALE.md §2h): replicate the sf0.1 FACT tables 10x
(distinct keys, FK-consistent; dims stay 1x, exactly how a real
warehouse grows) and time q01/q17/q105/q22 at 1x vs 10x — the "the
floor amortizes, the data term is linear" claim measured, not
asserted.

Replication shape per query:
  q01  lineitem 10x             -> scan + hash-agg, expect ~linear
  q17  lineitem+orders+customer 10x, dims 1x -> star join, broadcast
       dims unchanged, expect ~linear in the fact scan/shuffle
  q105 same star, group-by volume 10x
  q22  events 10x with DISTINCT user ids (more users, not longer
       per-user history — per-key window work stays constant)

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/scale10_r6_tpch.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
X10 = "/tmp/scale10_r6_tpch"


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{X10}/events.parquet"):
        return
    os.makedirs(X10, exist_ok=True)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ro = rl = rc = re_ = None
    for i in range(10):
        off = F.lit(i * 1_000_000_000)
        r1 = o.withColumn("o_orderkey", F.col("o_orderkey") + off).withColumn(
            "o_custkey", F.col("o_custkey") + off
        )
        r2 = li.withColumn("l_orderkey", F.col("l_orderkey") + off)
        r3 = c.withColumn("c_custkey", F.col("c_custkey") + off)
        r4 = ev.withColumn("event_id", F.col("event_id") + off).withColumn(
            "user_id", F.col("user_id") + off
        )
        ro = r1 if ro is None else ro.unionAll(r1)
        rl = r2 if rl is None else rl.unionAll(r2)
        rc = r3 if rc is None else rc.unionAll(r3)
        re_ = r4 if re_ is None else re_.unionAll(r4)
    ro.write.mode("overwrite").parquet(f"{X10}/orders.parquet")
    rl.write.mode("overwrite").parquet(f"{X10}/lineitem.parquet")
    rc.write.mode("overwrite").parquet(f"{X10}/customer.parquet")
    re_.write.mode("overwrite").parquet(f"{X10}/events.parquet")
    # dims stay 1x (they'd broadcast at any fact scale)
    for t in [
        "supplier", "part", "nation", "region", "documents", "embeddings",
    ]:
        src = f"{SF}/{t}.parquet"
        dst = f"{X10}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)


def main() -> None:
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "32")
    from etl_everywhere_hub_spark.queries import REGISTRY
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("scale10-r6-tpch")
    spark.sparkContext.setLogLevel("ERROR")
    build_fixture(spark)

    names = ["q01_pricing_summary", "q17_revenue_by_nation",
             "q105_local_supplier_volume", "q22_asof_join"]
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
