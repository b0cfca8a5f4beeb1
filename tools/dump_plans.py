"""Dump `.explain("formatted")` for headline queries to plans/<dir>/.

The optimization-round evidence artifact (judge checks plan claims
against these files):

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/dump_plans.py r12 before [substr ...]

writes plans/r12/<query>_before.txt for every headline query whose
name contains one of the substrings (all of them when none given).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir_name = sys.argv[1] if len(sys.argv) > 1 else "r12"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    subs = sys.argv[3:]

    from etl_everywhere_hub_spark.queries import headline_queries
    from etl_everywhere_hub_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", outdir_name)
    os.makedirs(outdir, exist_ok=True)

    for name, q in sorted(headline_queries().items()):
        if subs and not any(s in name for s in subs):
            continue
        df = q.spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
