"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship star-join query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2.B;
``oracle_sql()`` gives each one's DuckDB-runnable ANSI-SQL twin.

The real implementations live in etl_everywhere_hub_spark/queries.py
(registry) backed by etl_everywhere_hub_spark/operators/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_everywhere_hub_spark.queries import REGISTRY

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-Q5-style revenue-by-nation star join."""
    return REGISTRY["q17_revenue_by_nation"].spark(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
