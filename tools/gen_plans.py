"""Regenerate PLANS.md — physical plans of the headline queries at
sf0.1 (AQE initial plans), with shuffle/broadcast summaries.

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# PLANS — headline-query physical plans (sf0.1, AQE initial plans)

Generated from `.explain` via `plans/explain.py` on the bench inputs.
What to look for (and what the plan tests assert): scans carry
PushedFilters + pruned ReadSchema; dims and bounded stats arrive via
BroadcastExchange (never a shuffle); aggregations are partial+final
(`HashAggregate` pairs); relational hot paths sit inside
WholeStageCodegen spans; no CartesianProduct / BroadcastNestedLoopJoin
outside the documented bounded-broadcast exemptions. AQE
(isFinalPlan=false at plan time) re-coalesces partitions and re-plans
joins at runtime — these are the declared shapes Catalyst starts from.

Size-dependence caveat: at sf0.1 every input is ≤11 MB, so Catalyst
broadcasts relations (e.g. q105's orders/lineitem sides) that at
100 TB would exceed autoBroadcastJoinThreshold and become sort-merge
joins on their natural keys — the explicitly-hinted broadcasts in the
code are only the dimension/stat tables that stay bounded at any
scale; everything else is Catalyst's size-based choice, which is the
point.
"""


def main() -> None:
    from etl_everywhere_hub_spark.plans import explain as X
    from etl_everywhere_hub_spark.queries import headline_queries
    from etl_everywhere_hub_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    print(HEADER)
    for name, q in sorted(headline_queries().items()):
        df = q.spark(spark, sf_dir)
        plan = X.physical_plan(df)
        # distinct exchange NODES, not raw tree-string hits — cached
        # subtrees reprint per consumer and inflated r3's counts 26x
        n_ex = X.distinct_shuffle_exchange_count(df)
        assert n_ex < 50, (
            f"{name}: {n_ex} shuffle exchanges — counter bug or a "
            "genuinely pathological plan; investigate before publishing"
        )
        bj = "yes" if "BroadcastHashJoin" in plan else "no"
        print(f"## {name}\n")
        print(f"shuffle exchanges: {n_ex} · broadcast join: {bj}\n")
        print("```")
        print(plan.rstrip())
        print("```")
        print()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
