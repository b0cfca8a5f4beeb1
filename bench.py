"""Headline-query benchmark — the driver's per-round perf probe.

Runs the registry's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized through the noop sink (forces every
stage, no driver collect cost); wall-clock per query is reported and
the headline metric is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    from etl_everywhere_hub_spark.queries import headline_queries
    from etl_everywhere_hub_spark.session import get_spark

    # Shuffle partitions sized to the DATA, not the core count
    # (SCALE.md §1: over-partition only when there are bytes to
    # spread). The sf0.1 fixtures shuffle ≤ a few MB per exchange, so
    # core-count partitions are pure per-task overhead — measured 25-30%
    # on the shuffle-stage-heavy q41 (alternating 32-vs-8 A/B, warm
    # session). Honors an explicit SPARK_SHUFFLE_PARTITIONS override;
    # on a cluster the env carries the real (much larger) setting.
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM once so q1's number is the engine, not first-touch
    # JIT: exercise the vectorized parquet reader, hash-agg with a
    # decimal fold, a window, and a shuffle join — the codepaths the
    # headline queries live on.
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
    ).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count().collect()

    # Machine fingerprint + calibration pair (VERDICT r11 #4: the
    # sf0.1 ratio went environment-hostage across a host change, and
    # cross-round comparisons needed prose archaeology). Fixed
    # synthetic microbenchmarks — no data dependence, min-of-3 on a
    # warm JVM — so any BENCH artifact states how fast THIS host runs
    # each engine; two artifacts are comparable by their calibration
    # ratio without re-running anything.
    def _fingerprint(con) -> dict:
        cpu = ""
        try:
            for line in open("/proc/cpuinfo"):
                if line.lower().startswith("model name"):
                    cpu = line.split(":", 1)[1].strip()
                    break
        except OSError:
            pass
        jvm_runs = []
        for _ in range(3):
            t0 = time.time()
            spark.range(40_000_000).selectExpr("sum(id * 2 + 1)").collect()
            jvm_runs.append(time.time() - t0)
        duck_runs = []
        for _ in range(3):
            t0 = time.time()
            con.sql("SELECT sum(i * 2 + 1) FROM range(100000000) t(i)").df()
            duck_runs.append(time.time() - t0)
        return {
            "cpu": cpu,
            "cores": os.cpu_count(),
            "spark_cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
            "jvm_cal_s": round(min(jvm_runs), 3),
            "duck_cal_s": round(min(duck_runs), 3),
        }

    # Per-round diffability (VERDICT r4 #8, r5 #1): per-query paired
    # DuckDB timing and the PREVIOUS round's spark number live in the
    # BENCH_DETAIL.json sidecar (committed each round) — NOT in the
    # one-line JSON, which must stay under the driver's tail-capture
    # size or `parsed` comes back null (r5 regression). Prev preference:
    # sidecar, then the latest BENCH_r*.json parsed/tail.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev: dict[str, float] = {}
    try:
        sidecar_prev = json.load(open(os.path.join(
            repo_dir, os.environ.get("SPARK_GRAFT_DETAIL_OUT", "BENCH_DETAIL.json"))))
        prev = {
            name: d.get("spark_s")
            for name, d in sidecar_prev.get("queries_detail", {}).items()
        }
    except Exception:
        prev = {}
    if not prev:
        try:
            import glob
            import re as _re

            cands = sorted(
                glob.glob(os.path.join(repo_dir, "BENCH_r*.json")),
                key=lambda p: int(_re.search(r"BENCH_r(\d+)", p).group(1)),
            )
            if cands:
                raw = json.load(open(cands[-1]))
                parsed = raw.get("parsed")
                if not isinstance(parsed, dict) or "queries" not in parsed:
                    m = _re.search(r'\{"metric".*\}', raw.get("tail", ""))
                    parsed = json.loads(m.group(0)) if m else {}
                prev = parsed.get("queries", {}) or {}
        except Exception:
            prev = {}

    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # Four passes per query per engine, report the min: this VM is
    # shared and single runs see 2-3x spikes from external load; the
    # min is the engine's actual cost (the quantity that transfers to
    # a cluster). (Raised from 2 in round 6 after a late-round window
    # where BOTH engines measured ~25-40% slow for tens of minutes;
    # raised 3 -> 4 in round 11 after a window where successive FULL
    # bench runs drifted +6%/+18% duck/spark within the hour — the
    # extra pass tightens BOTH engines' floor estimates identically,
    # the full spread stays in the sidecar.)
    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    RUNS = 4
    # Round-7 headline additions (VERDICT r6 #7): q139 (iterative graph)
    # and q331 (mapInPandas codec). q139 pairs fairly — its oracle runs
    # the same three power iterations in SQL. q331 does NOT enter the
    # cross-engine ratio: its DuckDB oracle is a CORRECTNESS oracle
    # (integer character arithmetic reproducing the checksums), not an
    # equivalent workload — DuckDB never encodes or decodes a JPEG, so
    # pairing it would compare a codec against an adder. It still runs,
    # counts in the headline total, and chains prev_spark_s like every
    # other query; its duckdb_s is recorded in the sidecar with
    # ratio_excluded so the exclusion is visible, not silent.
    RATIO_EXCLUDED = {"q331_jpeg_decode_real_pixels"}
    # SPARK_GRAFT_ORACLE_SKIP: comma-separated query names whose DuckDB
    # oracle is NOT run (recorded as oracle_skipped, excluded from the
    # paired ratio). No standing user as of round 10 (q127's oracle
    # gained the implied lat-band predicate, 4.2 s/run at sf1.0); kept
    # for future fixtures where an oracle is infeasible at scale.
    oracle_skip = set(
        filter(None, os.environ.get("SPARK_GRAFT_ORACLE_SKIP", "").split(","))
    )
    # SPARK_GRAFT_QUERY_SKIP skips a headline query ENTIRELY (both
    # engines), recorded as query_skipped. Round 9's user (q127 at
    # sf1.0 — fixed-area geometry made the true answer quadratic) is
    # RETIRED in round 10: the +100 deg/replica region term keeps the
    # answer linear at every gen_sf1 scale, so no headline query
    # skips anywhere. The knob stays for future fixture pathologies.
    query_skip = set(
        filter(None, os.environ.get("SPARK_GRAFT_QUERY_SKIP", "").split(","))
    )
    # SPARK_GRAFT_BENCH_ONLY: comma-separated substrings — run just the
    # matching headline queries (round 10: the sf3 data-term spot-bench
    # pairs six queries without paying the full 19-query sweep).
    only = [
        s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s
    ]
    selected = {
        name: q
        for name, q in headline_queries().items()
        if not only or any(s in name for s in only)
    }
    for name, q in sorted(selected.items()):
        if name in query_skip:
            detail[name] = {"query_skipped": (
                "SPARK_GRAFT_QUERY_SKIP: fixed-area geometry makes the "
                "true answer quadratic at this sf"
            )}
            continue
        s_runs: list[float] = []
        for _ in range(RUNS):
            t0 = time.time()
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            s_runs.append(time.time() - t0)
        s_runs.sort()
        timings[name] = round(s_runs[0], 3)
        # queries persist() frames they consume more than once; drop
        # them between queries so a registry sweep doesn't accumulate
        # executor memory (each query still re-pays its own cache fill
        # on the second run — both runs measure the same work)
        spark.catalog.clearCache()
        d_best = None
        d_runs: list[float] = []
        if q.oracle is not None and name not in oracle_skip:
            for _ in range(RUNS):
                t0 = time.time()
                con.sql(q.oracle).df()
                d_runs.append(time.time() - t0)
            d_runs.sort()
            d_best = round(d_runs[0], 3)
        # Full spread per engine (VERDICT r8 item #8): min is the
        # headline (the engine's actual cost on this shared VM), the
        # sorted run list + median let the next round classify ±0.1 s
        # upticks as noise vs drift from the artifact alone.
        detail[name] = {
            "spark_s": timings[name],
            "spark_runs_s": [round(x, 3) for x in s_runs],
            "spark_median_s": round(s_runs[len(s_runs) // 2], 3),
            "duckdb_s": d_best,
            "duckdb_runs_s": [round(x, 3) for x in d_runs] or None,
            "duckdb_median_s": (
                round(d_runs[len(d_runs) // 2], 3) if d_runs else None
            ),
            "prev_spark_s": prev.get(name),
        }
        if name in RATIO_EXCLUDED:
            detail[name]["ratio_excluded"] = "correctness oracle, not equivalent work"
        if name in oracle_skip:
            detail[name]["oracle_skipped"] = (
                "SPARK_GRAFT_ORACLE_SKIP: O(n^2) oracle infeasible at this sf"
            )

    total = round(sum(timings.values()), 3)
    duck_total = round(
        sum(
            d["duckdb_s"]
            for n, d in detail.items()
            if d.get("duckdb_s") is not None and n not in RATIO_EXCLUDED
        ),
        3,
    )
    paired_spark = round(
        sum(
            d["spark_s"]
            for n, d in detail.items()
            if d.get("duckdb_s") is not None and n not in RATIO_EXCLUDED
        ),
        3,
    )
    ratio = round(paired_spark / duck_total, 3) if duck_total else None

    # Full per-query detail (spark/duckdb/prev) goes to a committed
    # sidecar; the stdout line carries only the compact headline so the
    # driver's bounded tail capture always holds the complete object.
    # SPARK_GRAFT_DETAIL_OUT redirects the sidecar (the sf1.0 pairing
    # writes BENCH_DETAIL_SF1.json without clobbering the sf0.1 one)
    fingerprint = _fingerprint(con)
    detail_name = os.environ.get("SPARK_GRAFT_DETAIL_OUT", "BENCH_DETAIL.json")
    try:
        with open(os.path.join(repo_dir, detail_name), "w") as fh:
            json.dump(
                {
                    "sf": sf_val,
                    "fingerprint": fingerprint,
                    "queries_detail": detail,
                    "duckdb_total_paired": duck_total,
                    "spark_total_paired": paired_spark,
                    "ratio_paired": ratio,
                    "runs_per_query": RUNS,
                    "aggregation": "min",
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "ratio_paired": ratio,
                "duckdb_total_paired": duck_total,
                "sf": sf_val,
                "fingerprint": fingerprint,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
