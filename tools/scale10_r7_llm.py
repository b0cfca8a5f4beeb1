"""Round-7 measured scaling for the LLM-pipeline headline ops
(VERDICT r6 item #3 / SCALE.md §2i): the §2h method applied to
q41/q39/q116/q136/q43 — replicate the sf0.1 documents and embeddings
10x and time 1x vs 10x on the same session (min of 2, noop sink).

Replication shape — 10x more DISTINCT items, not 10 copies:

- documents: every token gets a per-replica suffix
  (``regexp_replace(text, '(\\S+)', '$1_rI')``). Within one replica
  the original near-dup structure is untouched (the suffix is applied
  uniformly, so shingle sets shift identically); ACROSS replicas no
  token — hence no shingle, no MinHash band, no bigram — collides.
  This models a corpus that grew 10x with the same internal duplicate
  rate, instead of manufacturing 10-deep exact-dup clusters whose
  LSH pair count would grow quadratically by construction.
- embeddings: vec_ids offset per replica; element 0 perturbed by
  r*0.01 so cosine ties don't degenerate (work is unchanged — the
  brute/blocked top-k cost is rows x dims either way).

Vocabulary grows 10x under the suffix scheme (worst case vs Heaps'
law) — deliberately: it stresses q39/q116's vocab broadcasts and
q41's band-bucket fanout the way a genuinely larger corpus would.

For q41 the tool also records the output pair count at both scales:
near-linear pair growth (~10x) is the signature of bucket-blocked
candidate generation; quadratic growth would expose an all-pairs
shape the plan gates are supposed to forbid.

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/scale10_r7_llm.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
X10 = "/tmp/scale10_r7_llm"

COUNT_ROWS = {"q41_minhash_lsh"}


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{X10}/embeddings.parquet"):
        return
    os.makedirs(X10, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rd = re_ = None
    for i in range(10):
        off = F.lit(i * 1_000_000_000)
        d = docs.withColumn("doc_id", F.col("doc_id") + off).withColumn(
            "text", F.regexp_replace("text", r"(\S+)", rf"$1_r{i}")
        )
        e = emb.withColumn("vec_id", F.col("vec_id") + off).withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, j) -> CASE WHEN j = 0 "
                f"THEN x + {i} * 0.01D ELSE x END)"
            ),
        )
        rd = d if rd is None else rd.unionAll(d)
        re_ = e if re_ is None else re_.unionAll(e)
    rd.write.mode("overwrite").parquet(f"{X10}/documents.parquet")
    re_.write.mode("overwrite").parquet(f"{X10}/embeddings.parquet")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events",
    ]:
        dst = f"{X10}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SF}/{t}.parquet", dst)


def main() -> None:
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "32")
    from etl_everywhere_hub_spark.queries import REGISTRY
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("scale10-r7-llm")
    spark.sparkContext.setLogLevel("ERROR")
    build_fixture(spark)
    names = [
        "q41_minhash_lsh",
        "q39_tf_idf",
        "q116_bigram_lm_score",
        "q136_hashed_ngram_classifier",
        "q43_cosine_topk",
        # the two round-7 bench-headline additions, measured on the
        # same 10x fixture: q139's doc_id-chain graph gets 10x nodes
        # and 10x edges (chains stay within each replica's contiguous
        # id block); q331 decodes 10x images (spread_for_codec path)
        "q139_pagerank_iterations",
        "q331_jpeg_decode_real_pixels",
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
            if name in COUNT_ROWS:
                times[f"{label}_rows"] = q.spark(spark, sf_dir).count()
                spark.catalog.clearCache()
        times["ratio"] = round(times["x10"] / times["x1"], 2)
        out[name] = times
        print(name, times, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
