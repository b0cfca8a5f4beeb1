"""Generate the sf1.0 fixture set (VERDICT r8 item #3) at /tmp/sf1.0.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md — read-only); the
bench at sf0.1 mostly measures Spark's fixed scheduling/codegen floor
(BASELINE.md). This tool builds a DETERMINISTIC sf1.0 (~6M lineitem)
from sf0.1 with the repo's established replication schemes so the
19-query headline can be paired where the data term dominates:

- region/nation: copied (fixed-size dims at every TPC-H scale).
- customer/supplier/part/orders/lineitem: 10 replicas with one key
  offset per replica applied to EVERY key column (PK and FK alike),
  so per-key join fan-in/out is exactly the sf0.1 shape — the
  warehouse grows by new entities, not longer histories
  (tools/scale10_r6_tpch.py §2h scheme, now FK-complete).
- events: event_id/user_id offsets (more users, same per-user
  history — window/session work per key constant).
- documents: the collision-safe token-suffix scheme
  (tools/scale10_r7_llm.py §2i): every token gets a per-replica
  suffix, so each replica's internal shingle/near-dup structure is
  IDENTICAL while cross-replica collisions are impossible — true
  near-dup pairs grow exactly 10x, never quadratically.
- embeddings: vec_id offset + a deterministic element-0 perturbation
  per replica (breaks exact-duplicate vectors across replicas).

Usage (writes /tmp/sf1.0, ~10 parquet files, idempotent):

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/gen_sf1.py

Round 10 (VERDICT r9 item #5): ``--mult N`` generalizes the replica
count — N replicas of sf0.1 = sf N/10, written to /tmp/sf{N/10}
(e.g. ``--mult 30`` → /tmp/sf3.0). Every scheme is replica-count-safe
by construction: key offsets stride 1e9 (q127's region term gives
each replica its own spatial region at ANY count), the events
value_shift keeps replicas 5e16 micro² apart regardless of count
(q156's oracle squares diffs in DECIMAL(38,0) since round 9, so even
mult 30's widest 6.9e9-micro diff is exact), token suffixes _r{i}
stay collision-free, and embedding perturbations stay distinct.

Then pair the headline there:

    SPARK_GRAFT_SF_DIR=/tmp/sf1.0 SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL_SF1.json \
        python bench.py > BENCH_SF1_r10.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
REPLICAS = 10
if "--mult" in sys.argv:
    REPLICAS = int(sys.argv[sys.argv.index("--mult") + 1])
_sf_label = f"{REPLICAS / 10:.1f}"
OUT = os.environ.get("SF1_DIR", f"/tmp/sf{_sf_label}")
OFF = 1_000_000_000  # key offset stride per replica


def _replicate(spark, table: str, key_cols: list[str], text_suffix=False,
               perturb_col: str | None = None, value_shift: float = 0.0):
    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.catalog import load_table

    # load_table gives canonical types (events' TIMESTAMP(NANOS) is
    # rescued to TIMESTAMP_NTZ micros exactly as every query sees it)
    if os.path.isfile(f"{OUT}/{table}.parquet"):
        print(f"  {table}: exists, skipped")
        return
    df = load_table(spark, SF, table)
    parts = []
    for i in range(REPLICAS):
        r = df
        for c in key_cols:
            r = r.withColumn(c, F.col(c) + F.lit(i * OFF))
        if value_shift and i > 0:
            # spatial honesty: replica users' trajectories must live
            # ELSEWHERE (a warehouse grows by new entities in new
            # places, not 10 co-located copies). 100.0 value units
            # puts adjacent replicas 5*s^2 = 5e16 micro^2 apart —
            # outside q156's 1.5e16 radius, so cross-replica pairs are
            # excluded and the quadratic-pair queries grow LINEARLY at
            # constant density instead of x100 at x10 density — while
            # the widest coordinate diff (2*(560+900)*1e6 = 2.92e9)
            # keeps its int64 square under 2^63 (the oracle computes
            # ALL pair diffs before filtering; 1000.0 overflowed).
            r = r.withColumn("value", F.col("value") + F.lit(i * value_shift))
        if text_suffix and i > 0:
            r = r.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1_r{i}")
            )
        if perturb_col is not None and i > 0:
            # deterministic tiny shift of element 0 per replica
            r = r.withColumn(
                perturb_col,
                F.concat(
                    F.array(
                        (F.element_at(F.col(perturb_col), 1)
                         + F.lit(i * 1e-3)).cast("float")
                    ),
                    F.slice(F.col(perturb_col), 2, 10_000),
                ),
            )
        parts.append(r)
    out = parts[0]
    for r in parts[1:]:
        out = out.unionAll(r)
    _write_single(out, table)
    print(f"  {table}: {REPLICAS}x written")


def _write_single(df, table: str) -> None:
    """Single-FILE parquet like the driver fixtures (bench.py's DuckDB
    views read '{dir}/{t}.parquet' as a file path, not a glob)."""
    import glob
    import shutil

    tmp = f"{OUT}/__{table}_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{OUT}/{table}.parquet")
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from pyspark.sql import SparkSession

    os.makedirs(OUT, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("gen_sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import shutil as _sh

    for t in ("region", "nation"):
        _sh.copyfile(f"{SF}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"  {t}: copied")
    _replicate(spark, "customer", ["c_custkey"])
    _replicate(spark, "supplier", ["s_suppkey"])
    _replicate(spark, "part", ["p_partkey"])
    _replicate(spark, "orders", ["o_orderkey", "o_custkey"])
    _replicate(spark, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    _replicate(spark, "events", ["event_id", "user_id"], value_shift=100.0)
    _replicate(spark, "documents", ["doc_id"], text_suffix=True)
    _replicate(spark, "embeddings", ["vec_id"], perturb_col="embedding")
    print(f"sf{_sf_label} fixture ({REPLICAS}x sf0.1) complete at {OUT}")


if __name__ == "__main__":
    main()
