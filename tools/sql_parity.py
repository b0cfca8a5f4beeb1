"""Three-way SQL parity classifier (VERDICT r6 item #2).

SURVEY §3 claims every entry point converges on the same plans — the
DataFrame API, and SQL over registered views. Every registry query
already ships an ANSI oracle string that DuckDB executes; this tool
feeds that SAME string to ``spark.sql()`` over ``register_views`` temp
views and compares the result to DUCKDB's result for the same string
(canon_parity). Since the existing oracle gate proves
DataFrame == DuckDB, a MATCH here closes the three-way equality
Spark-SQL == DuckDB == DataFrame.

Output: one line per query (MATCH / NONPORTABLE:<category> /
MISMATCH) and a JSON summary. The pinned portable set lives in
``tests/test_sql_parity.py``; rerun this tool when adding queries.

Usage::

    SPARK_GRAFT_CPUS=8 PYTHONPATH=/root/repo python tools/sql_parity.py \
        [--sf /root/testdata/sf0.001] [--json out.json] [substr ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check import canon_cell, _take_flag  # noqa: E402

# Known semantic-dialect cases (ADVICE r7): the SAME string parses and
# runs on both engines but means something different — there is no
# shared spelling of the concept, so the pinned tests record these as
# NONPORTABLE:semantic-dialect rather than MISMATCH, and this tool must
# agree (a clean full-registry rerun should exit 0).
SEMANTIC_DIALECT = {
    "q56_date_extras": (
        "ISO day-of-week: Spark dayofweek()=Sunday1..7 vs DuckDB "
        "dayofweek()=0..6; probed round 7 — no shared keyword exists"
    ),
}


def canon_parity(df) -> list[tuple]:
    """The driver's canonicalization plus the repo's cross-engine
    float policy (BASELINE.md / verify notes): Decimal -> float (Spark
    SQL types `bigint / 10000.0` as DECIMAL where DuckDB's `/` always
    returns DOUBLE — numerically equal, representationally not), and
    floats rounded to 9 decimals (last-ulp differences between decimal
    and double division orders)."""
    import decimal
    import math

    def cell(v):
        if isinstance(v, decimal.Decimal):
            v = float(v)
        v = canon_cell(v)
        if isinstance(v, float) and not math.isnan(v):
            return round(v, 9)
        return v

    cols = sorted(df.columns)
    rows = [
        tuple(cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def classify_error(exc: Exception) -> str:
    """Bucket a spark.sql failure into a stable non-portability category."""
    msg = str(exc)
    for needle, cat in [
        ("UNRESOLVED_ROUTINE", "function-missing"),
        ("Undefined function", "function-missing"),
        ("PARSE_SYNTAX_ERROR", "syntax"),
        ("ParseException", "syntax"),
        ("UNRESOLVED_COLUMN", "column-resolution"),
        ("UNRESOLVED_FIELD", "column-resolution"),
        ("DATATYPE_MISMATCH", "type-rules"),
        ("CANNOT_RESOLVE", "column-resolution"),
        ("INVALID_FORMAT", "format-string"),
        ("NUM_COLUMNS_MISMATCH", "set-op-columns"),
    ]:
        if needle in msg:
            return cat
    return "runtime:" + type(exc).__name__


def main(argv: list[str]) -> int:
    argv, sf = _take_flag(argv, "--sf")
    argv, json_out = _take_flag(argv, "--json")
    sf = sf or os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    substrs = argv

    import duckdb

    from etl_everywhere_hub_spark.catalog import TABLES, register_views
    from etl_everywhere_hub_spark.queries import REGISTRY
    from etl_everywhere_hub_spark.session import get_spark

    spark = get_spark("sql-parity", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    results: dict[str, dict] = {}
    names = [
        n for n in sorted(REGISTRY) if not substrs or any(s in n for s in substrs)
    ]
    for name in names:
        q = REGISTRY[name]
        if q.oracle is None:
            results[name] = {"status": "NO_ORACLE"}
            print(f"SKIP  {name} (rows-only contract)", flush=True)
            continue
        try:
            try:
                sql_pdf = spark.sql(q.oracle).toPandas()
            except Exception as exc:  # noqa: BLE001 — classified below
                cat = classify_error(exc)
                results[name] = {
                    "status": "NONPORTABLE",
                    "category": cat,
                    "error": str(exc).split("\n")[0][:200],
                }
                print(f"NONPORTABLE:{cat}  {name}", flush=True)
                continue
            duck_pdf = con.sql(q.oracle).df()
        finally:
            spark.catalog.clearCache()
        if name in SEMANTIC_DIALECT:
            results[name] = {
                "status": "NONPORTABLE",
                "category": "semantic-dialect",
                "error": SEMANTIC_DIALECT[name],
            }
            print(f"NONPORTABLE:semantic-dialect  {name}", flush=True)
            continue
        if sorted(sql_pdf.columns) != sorted(duck_pdf.columns):
            results[name] = {
                "status": "MISMATCH",
                "detail": f"columns sql={sorted(sql_pdf.columns)} duckdb={sorted(duck_pdf.columns)}",
            }
            print(f"MISMATCH:columns  {name}", flush=True)
            continue
        a, b = canon_parity(sql_pdf), canon_parity(duck_pdf)
        if len(a) != len(b):
            results[name] = {
                "status": "MISMATCH",
                "detail": f"rows sql={len(a)} duckdb={len(b)}",
            }
            print(f"MISMATCH:rowcount  {name}", flush=True)
            continue
        diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), None)
        if diff is not None:
            results[name] = {
                "status": "MISMATCH",
                "detail": f"row {diff}: sql={a[diff]} duckdb={b[diff]}",
            }
            print(f"MISMATCH:values  {name} row {diff}", flush=True)
            print(f"    sql={a[diff]}")
            print(f"    duck={b[diff]}")
            continue
        results[name] = {"status": "MATCH", "rows": len(a)}
        print(f"MATCH  {name} ({len(a)} rows)", flush=True)

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    n_non = sum(1 for r in results.values() if r["status"] == "NONPORTABLE")
    n_mis = sum(1 for r in results.values() if r["status"] == "MISMATCH")
    cats: dict[str, int] = {}
    for r in results.values():
        if r["status"] == "NONPORTABLE":
            cats[r["category"]] = cats.get(r["category"], 0) + 1
    print(
        f"\n{n_match} match, {n_non} nonportable {cats}, {n_mis} mismatch "
        f"of {len(results)}"
    )
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf": sf, "results": results}, fh, indent=1, sort_keys=True)
    return 1 if n_mis else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
