"""Physical-plan introspection + assertions (SURVEY.md §4).

The engine's optimizer story is "declare the plan, let Catalyst pick
physics" — these helpers make that checkable instead of hoped-for.
tests/test_plans.py pins the plan properties that matter at 100 TB:
filters reach the parquet scan, projections prune columns, bounded
dims broadcast, hot paths stay inside whole-stage codegen, and no
query degenerates into a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan carries at least one pushed predicate."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line:
            _, _, rest = line.partition("PushedFilters:")
            if rest.strip() not in ("[]", ""):
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan — the
    column-pruning check."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            _, _, rest = line.partition("ReadSchema:")
            schema = rest.strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            cols = []
            depth = 0
            field = ""
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append(field.split(":")[0].strip())
                    field = ""
                else:
                    field += ch
            if field:
                cols.append(field.split(":")[0].strip())
            return cols
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastHashJoin" in physical_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


import re as _re


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans in the FINAL plan. AQE's pre-execution
    plan (isFinalPlan=false) hides codegen, so THIS query is collected
    first (count() would finalize a different queryExecution). Spans
    print as `*(n) Operator` in the tree."""
    df.collect()
    p = physical_plan(df)
    stages = set(_re.findall(r"\*\((\d+)\)", p))
    return max(len(stages), p.count("WholeStageCodegen"))


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate appears in partial+final
    pairs, or objHashAggregate/SortAggregate partials)."""
    p = physical_plan(df)
    return p.count("HashAggregate") >= 2 or "partial_" in p


def exchange_count(df: DataFrame) -> int:
    """Shuffle + broadcast exchanges in the plan — 0 for a co-located
    (bucketed) join."""
    return physical_plan(df).count("Exchange")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle (hash/range) exchanges only — broadcast exchanges are
    excluded because a broadcast of a tiny side is the cheap, desired
    alternative to a shuffle, not a cost of the same kind."""
    plan = physical_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def distinct_shuffle_exchange_count(df: DataFrame) -> int:
    """Distinct shuffle-exchange NODES (hash/range partitioning) in the
    plan, counted from the formatted explain's numbered node-detail
    blocks — each physical node prints exactly ONE `(n) Exchange` block
    there, no matter how many times its subtree reprints in the tree
    section (cached InMemoryRelation feeds N consumers → N tree
    reprints, 1 block) or how AQE duplicates initial/final plans.
    Counting raw string hits in the tree overstates by >20x on cached
    plans (r3 PLANS.md reported 313 for q41; true count ~a dozen)."""
    plan = formatted_plan(df)
    n = 0
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if _re.match(r"^\(\d+\) Exchange$", line.strip()):
            # the block's Arguments: line says which partitioning
            for follow in lines[i + 1 : i + 6]:
                if follow.startswith("Arguments:"):
                    if "hashpartitioning" in follow or "rangepartitioning" in follow:
                        n += 1
                    break
    return n


def distinct_exchange_count(df: DataFrame) -> int:
    """Distinct exchange nodes of ANY kind (shuffle + broadcast) — same
    node-id-block counting as distinct_shuffle_exchange_count."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if _re.match(r"^\(\d+\) (Exchange|BroadcastExchange)$", line.strip())
    )


def partition_filters(df: DataFrame) -> str:
    """The scan's planning-time PartitionFilters entry ('' if none) —
    nonempty means whole directories are pruned before I/O."""
    for line in formatted_plan(df).splitlines():
        if "PartitionFilters:" in line:
            _, _, rest = line.partition("PartitionFilters:")
            rest = rest.strip()
            if rest not in ("[]", ""):
                return rest
    return ""


def has_python_eval(df: DataFrame) -> bool:
    """True if any Python-side evaluation node (row UDF or Arrow/pandas
    batch) appears — hot relational paths must stay JVM-only."""
    p = physical_plan(df)
    return any(m in p for m in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"))
