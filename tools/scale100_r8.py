"""Round-8 measured 100x scaling point for the two headline LLM ops
(VERDICT r7 item #7): the §2i suffix-replication method pushed to 100x
for q41 (MinHash LSH) and q139 (PageRank), pinning the curve shape
where a quadratic regression would actually show.

Replication is the round-7 collision-safe scheme (see
tools/scale10_r7_llm.py): per-replica token suffix keeps each
replica's internal near-dup structure identical while guaranteeing
zero cross-replica shingle/band collisions, so the TRUE pair count
grows exactly linearly — q41 must report exactly 100x the 1x pairs
(25,600 vs 256) or the candidate generation is not bucket-blocked.
q139's doc-chain graph gets 100x nodes and edges (chains stay inside
each replica's contiguous id block).

    SPARK_GRAFT_CPUS=16 PYTHONPATH=. python tools/scale100_r8.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
X100 = "/tmp/scale100_r8"

COUNT_ROWS = {"q41_minhash_lsh"}


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{X100}/documents.parquet/_SUCCESS"):
        return
    os.makedirs(X100, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # 100 unioned branches in one plan is fine for a one-off build, but
    # the regexp runs once per replica anyway — build in two stages
    # (10 x 10) to keep the plan shallow.
    parts = []
    for i in range(100):
        off = F.lit(i * 1_000_000_000)
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + off).withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1_r{i}")
            )
        )
    rd = parts[0]
    for p in parts[1:]:
        rd = rd.unionAll(p)
    rd.repartition(32).write.mode("overwrite").parquet(f"{X100}/documents.parquet")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        dst = f"{X100}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SF}/{t}.parquet", dst)


def main() -> None:
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "32")
    from etl_everywhere_hub_spark.queries import REGISTRY
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("scale100-r8")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build_fixture(spark)
    print(f"fixture built in {time.time() - t0:.1f}s", flush=True)
    out = {}
    for name in ["q41_minhash_lsh", "q139_pagerank_iterations"]:
        q = REGISTRY[name]
        times = {}
        for label, sf_dir in [("x1", SF), ("x100", X100)]:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            times[label] = round(best, 3)
            if name in COUNT_ROWS:
                times[f"{label}_rows"] = q.spark(spark, sf_dir).count()
                spark.catalog.clearCache()
        times["ratio"] = round(times["x100"] / times["x1"], 2)
        out[name] = times
        print(name, times, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
