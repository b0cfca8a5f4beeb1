"""Measured adversarial-skew run for the LSH bucket cap at 10^4 scale
(VERDICT r7 item #5 / SCALE.md §2j).

Corpus = sf0.1 documents (5,000 organic docs) + a 10,000-doc
NEAR-identical cluster (one doc-unique token appended to a shared
40-token base — exact-collapse cannot merge it; this is the crawl
boilerplate shape the cap exists for). Runs the full
minhash_near_dup candidate stage uncapped and capped
(max_bucket_size=1000) and reports wall clock, candidate-pair counts,
and the drop accounting, so the recall/cost trade is a measured
number instead of a docstring claim.

    SPARK_GRAFT_CPUS=16 PYTHONPATH=. python tools/lsh_cap_r8.py
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
M = 10_000
CAP = 1_000
BASE = " ".join(f"tok{i}" for i in range(40))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.operators import dedup as dedup_ops
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("lsh-cap-r8")
    spark.sparkContext.setLogLevel("ERROR")

    organic = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    cluster = spark.range(M).select(
        (F.col("id") + 1_000_000_000).alias("doc_id"),
        F.concat(F.lit(BASE + " mut"), F.col("id").cast("string")).alias("text"),
    )
    docs = organic.unionAll(cluster)
    sh = dedup_ops.doc_shingles(docs, "text", "doc_id", k=3)
    sigs = dedup_ops.minhash_signatures(sh, id_col="doc_id", num_hashes=8)
    sigs.persist()
    n_docs = sigs.count()

    out = {"n_docs": n_docs, "cluster": M, "cap": CAP}

    class Grab(logging.Handler):
        msg = None

        def emit(self, record):
            if "dropping" in record.getMessage():
                Grab.msg = record.getMessage()

    logging.getLogger("etl_everywhere_hub_spark.operators.dedup").addHandler(Grab())

    for label, cap in [("capped", CAP), ("uncapped", None)]:
        t0 = time.time()
        n = dedup_ops.lsh_candidate_pairs(
            sigs, id_col="doc_id", num_hashes=8, bands=4, max_bucket_size=cap
        ).count()
        out[label] = {"pairs": n, "sec": round(time.time() - t0, 2)}
        print(label, out[label], flush=True)
    out["accounting"] = Grab.msg
    cluster_pairs_possible = M * (M - 1) // 2
    out["uncapped_vs_allpairs"] = round(
        out["uncapped"]["pairs"] / cluster_pairs_possible, 4
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
