"""Paired Spark-vs-DuckDB bench over the headline set — the ≤2×
contract's measurement instrument (BASELINE.md:23-31).

Times BOTH engines back-to-back in ONE session at the same scale
factor so VM drift cannot confound the ratio (VERDICT r3 item #1: the
r3 bench was Spark-only, leaving the +17% movement attributable only
by assertion). DuckDB runs each headline query's ORACLE SQL — the
semantically identical formulation check.py hash-verifies — fully
materialized via ``.df()``; Spark runs the registry plan through the
noop sink. Two runs per query per engine, min (shared-VM spike
rejection, same policy as bench.py).

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/bench_pair.py
      [--sf /root/testdata/sf0.1] [--only q37,q41,...]

``--only`` restricts to a comma-separated query-id list, matched
against the EXACT query-number prefix (the token before the first
``_`` in the registry name), so ``--only q34`` selects q34 only —
never q340 (ADVICE r10). E.g. ``--only q37,q39,q41,q116,q136,q156``
for the data-term six at sf≥1 scaling points — VERDICT r9 item #5.

Prints a per-query table plus ONE JSON line:
{"spark_total", "duckdb_total", "ratio", "queries": {name:
 {"spark": s, "duckdb": s, "ratio": r}}, "sf"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    sf_dir = "/root/testdata/sf0.1"
    argv = sys.argv[1:]
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    only = None
    if "--only" in argv:
        only = tuple(argv[argv.index("--only") + 1].split(","))

    from etl_everywhere_hub_spark.queries import headline_queries
    from etl_everywhere_hub_spark.session import get_spark

    # data-sized shuffle partitions, same rule and rationale as bench.py
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")

    spark = get_spark("bench-pair")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # identical JVM warmup to bench.py
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
    ).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count().collect()

    rows = []
    for name, q in sorted(headline_queries().items()):
        if only is not None and name.split("_")[0] not in only:
            continue
        s_best = float("inf")
        for _ in range(2):
            t0 = time.time()
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            s_best = min(s_best, time.time() - t0)
        spark.catalog.clearCache()
        d_best = None
        if q.oracle is not None:
            d_best = float("inf")
            for _ in range(2):
                t0 = time.time()
                con.sql(q.oracle).df()
                d_best = min(d_best, time.time() - t0)
        rows.append((name, round(s_best, 3), None if d_best is None else round(d_best, 3)))

    spark_total = round(sum(r[1] for r in rows), 2)
    duck_total = round(sum(r[2] for r in rows if r[2] is not None), 2)
    paired_spark = round(sum(r[1] for r in rows if r[2] is not None), 2)

    w = max(len(r[0]) for r in rows)
    print(f"{'query'.ljust(w)}  spark_s  duckdb_s  ratio")
    for name, s, d in rows:
        if d is None:
            print(f"{name.ljust(w)}  {s:7.3f}   (no oracle)")
        else:
            print(f"{name.ljust(w)}  {s:7.3f}  {d:8.3f}  {s / d:5.2f}x")
    print(
        f"{'TOTAL (paired)'.ljust(w)}  {paired_spark:7.2f}  {duck_total:8.2f}  "
        f"{paired_spark / duck_total:5.2f}x"
    )
    print(
        json.dumps(
            {
                "metric": "paired_headline_bench",
                "sf": sf,
                "spark_total": spark_total,
                "spark_total_paired": paired_spark,
                "duckdb_total": duck_total,
                "ratio": round(paired_spark / duck_total, 3),
                "runs_per_query": 2,
                "aggregation": "min",
                "queries": {
                    name: {"spark": s, "duckdb": d,
                           "ratio": None if d is None else round(s / d, 2)}
                    for name, s, d in rows
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
