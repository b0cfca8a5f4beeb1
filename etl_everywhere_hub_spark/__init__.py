"""etl_everywhere_hub_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
connector ``dfpc-coe/etl-everywhere-hub`` (an AWS-Lambda ETL that
ingests GPS-tracker records, transforms them to GeoJSON features,
maintains a keyed TTL-evicted device cache, and emits batches), which
generalizes to a full relational + streaming + LLM-data-pipeline
operator surface (see SURVEY.md §2.B).

Design stance (SURVEY.md §7): no bespoke execution engine and no
custom Catalyst rules. Everything is declarative DataFrame / SQL so
Catalyst + Tungsten + AQE choose physical plans; Python only enters
via Arrow-batched pandas UDFs where built-ins genuinely cannot
express the semantics (stateful streaming, geometry math).
"""

from etl_everywhere_hub_spark.session import get_spark, configure_session
from etl_everywhere_hub_spark.catalog import load_table, register_views, TABLES

__all__ = [
    "get_spark",
    "configure_session",
    "load_table",
    "register_views",
    "TABLES",
]

__version__ = "0.1.0"
