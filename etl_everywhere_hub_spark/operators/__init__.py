from etl_everywhere_hub_spark.operators import (
    asof,
    dedup,
    sampling,
    similarity,
    skew,
    windows,
)

__all__ = ["asof", "dedup", "sampling", "similarity", "skew", "windows"]
