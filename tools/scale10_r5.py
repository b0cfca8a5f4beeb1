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

    names = [
        "q218_skipgram_pmi",         # map-side lead pair build (1 shuffle)
        "q224_zipf_slope",           # global_rank two-phase vocab rank
        "q232_winnowing_fingerprints",  # pure map-side folds
        "q234_domain_blocklist",     # suffix explode + broadcast equi
        "q239_content_defined_chunking",  # map-only
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
