"""Registry-wide physical-plan audit — the optimization round's
"every operator" sweep (guide §7.2 signatures, applied to all 379
query plans at once).

For every registry query, build the DataFrame at $SPARK_GRAFT_SF_DIR
and scan its formatted physical plan for the antipattern signatures
the optimization guide names:

- CartesianProduct / BroadcastNestedLoopJoin (accidental cross joins)
- BatchEvalPython (row-at-a-time Python UDF in-plan)
- SortMergeJoin count (sorts that a hash join could skip)
- shuffle Exchange count (plan-declared, pre-AQE)
- fact-table BroadcastExchange: a broadcast whose child scans a file
  bigger than --bcast-file-floor bytes (default 16 MiB) — the q105
  failure mode where size-threshold planning broadcasts the big side

Building a frame can itself run bounded jobs (eager persists,
approxQuantile stats); that is the declared cost of those operators,
not a measurement error. Output: one JSON line per query to stdout
(pipe to a file), plus a ranked summary on stderr.

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/plan_audit.py > /tmp/plan_audit.jsonl
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:]
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")

    from etl_everywhere_hub_spark.queries import REGISTRY
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bcast_floor = int(os.environ.get("SPARK_GRAFT_BCAST_FILE_FLOOR", str(16 << 20)))
    file_sizes = {
        f[:-8]: os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    }
    big_tables = {t for t, sz in file_sizes.items() if sz >= bcast_floor}

    rows = []
    for name, q in sorted(REGISTRY.items()):
        if only and not any(s in name for s in only):
            continue
        rec: dict = {"name": name}
        try:
            df = q.spark(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # surface, never skip silently
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
            rows.append(rec)
            print(json.dumps(rec), flush=True)
            continue
        nodes = re.findall(r"^\(\d+\) (\S+)", txt, re.M)
        rec["exchanges"] = sum(1 for n in nodes if n == "Exchange")
        rec["bcast"] = sum(1 for n in nodes if n == "BroadcastExchange")
        rec["smj"] = sum(1 for n in nodes if n == "SortMergeJoin")
        rec["cartesian"] = sum(1 for n in nodes if n == "CartesianProduct")
        rec["bnlj"] = sum(1 for n in nodes if n == "BroadcastNestedLoopJoin")
        rec["batch_py"] = sum(1 for n in nodes if n == "BatchEvalPython")
        rec["arrow_py"] = sum(
            1 for n in nodes if n in ("ArrowEvalPython", "MapInPandas", "MapInArrow",
                                      "FlatMapGroupsInPandas", "PythonMapInArrow")
        )
        # fact-table broadcast: a BroadcastExchange subtree whose scan
        # reads one of the big fixture files
        fact_bcasts = []
        # formatted details section lists each scan's Location;
        # map node-id -> table, then check which scans sit under a
        # BroadcastExchange in the tree text
        tree = txt.split("\n\n", 1)[0]
        lines = tree.splitlines()
        scan_tbl = {}
        for m in re.finditer(
            r"^\((\d+)\) Scan parquet ?\n(?:.*\n)*?Location: \S+ \[\S*?/(\w+)\.parquet\]",
            txt, re.M,
        ):
            scan_tbl[m.group(1)] = m.group(2)
        # tree walk: for each BroadcastExchange (id), any scan id that
        # appears after it at deeper indentation until indentation pops
        for i, ln in enumerate(lines):
            mm = re.search(r"BroadcastExchange \((\d+)\)", ln)
            if not mm:
                continue
            indent = len(ln) - len(ln.lstrip(" :+-"))
            for ln2 in lines[i + 1:]:
                ind2 = len(ln2) - len(ln2.lstrip(" :+-"))
                if ind2 <= indent:
                    break
                ms = re.search(r"Scan parquet\s+\((\d+)\)", ln2)
                if ms:
                    t = scan_tbl.get(ms.group(1))
                    if t in big_tables:
                        fact_bcasts.append(t)
        rec["fact_bcast"] = sorted(set(fact_bcasts))
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()

    bad = [r for r in rows if r.get("error")]
    print(f"-- {len(rows)} plans, {len(bad)} errors", file=sys.stderr)
    for key, label in [
        ("cartesian", "CartesianProduct"),
        ("batch_py", "BatchEvalPython"),
        ("fact_bcast", "fact-table broadcast"),
    ]:
        hits = [r["name"] for r in rows if r.get(key)]
        print(f"-- {label}: {len(hits)} -> {hits[:20]}", file=sys.stderr)
    top = sorted((r for r in rows if "exchanges" in r),
                 key=lambda r: -r["exchanges"])[:15]
    print("-- most exchanges:", [(r["name"], r["exchanges"]) for r in top],
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
