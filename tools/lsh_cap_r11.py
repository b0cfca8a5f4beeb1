"""Round-11 LSH-cap RECALL quantification at 10^4 adversarial scale
(VERDICT r10 item #6 — extends tools/lsh_cap_r8.py's cost numbers
with the recall numbers and the star-pair fix).

Same corpus as r8: sf0.1 organic docs + a 10,000-doc near-identical
cluster. Reports, as measured numbers into LSHCAP_r11.json:

- pair_recall_capped: fraction of the cluster's true near-dup PAIRS
  still emitted under the cap via the remaining bands (the quantity
  VERDICT r10 asked for — straggler-level on a fully-flooding
  cluster, and now stated honestly in lsh_candidate_pairs' docstring);
- star mode (oversized_star_pairs=True): emitted-pair count (linear
  in cluster size, not quadratic), wall clock, and CONNECTIVITY
  recall — the fraction of cluster members in the largest connected
  component of the capped candidate graph, which is what CC-based
  dedup actually consumes. 1.0 = the fix loses nothing.

    SPARK_GRAFT_CPUS=16 PYTHONPATH=. python tools/lsh_cap_r11.py
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
ID0 = 1_000_000_000
BASE = " ".join(f"tok{i}" for i in range(40))


def main() -> None:
    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.operators import dedup as dedup_ops
    from etl_everywhere_hub_spark.operators.graph import connected_components
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("lsh-cap-r11")
    spark.sparkContext.setLogLevel("ERROR")

    organic = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    cluster = spark.range(M).select(
        (F.col("id") + ID0).alias("doc_id"),
        F.concat(F.lit(BASE + " mut"), F.col("id").cast("string")).alias(
            "text"
        ),
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
            if "band bucket" in record.getMessage():
                Grab.msg = record.getMessage()

    logging.getLogger(
        "etl_everywhere_hub_spark.operators.dedup"
    ).addHandler(Grab())

    in_cluster = (F.col("a") >= ID0) & (F.col("b") >= ID0)
    runs = {}
    for label, kwargs in [
        ("uncapped", dict(max_bucket_size=None)),
        ("capped", dict(max_bucket_size=CAP)),
        ("capped_star", dict(max_bucket_size=CAP, oversized_star_pairs=True)),
    ]:
        t0 = time.time()
        pairs = dedup_ops.lsh_candidate_pairs(
            sigs, id_col="doc_id", num_hashes=8, bands=4, **kwargs
        ).persist()
        n_all = pairs.count()
        n_cl = pairs.filter(in_cluster).count()
        runs[label] = pairs
        out[label] = {
            "pairs": n_all,
            "cluster_pairs": n_cl,
            "sec": round(time.time() - t0, 2),
        }
        print(label, out[label], flush=True)
    out["accounting"] = Grab.msg
    out["pair_recall_capped"] = round(
        out["capped"]["cluster_pairs"]
        / max(out["uncapped"]["cluster_pairs"], 1),
        8,
    )
    # connectivity recall of the star fix: largest CC over the
    # cluster-member candidate graph / M
    comp = connected_components(
        runs["capped_star"]
        .filter(in_cluster)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    biggest = (
        comp.groupBy("component").count().agg(F.max("count")).collect()[0][0]
    )
    out["star_connectivity_recall"] = round(biggest / M, 6)
    out["star_emission_vs_quadratic"] = round(
        out["capped_star"]["cluster_pairs"] / (M * (M - 1) // 2), 8
    )
    for p in runs.values():
        p.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
