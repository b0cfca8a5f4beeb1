from etl_everywhere_hub_spark.operators import asof, dedup, similarity, windows

__all__ = ["asof", "dedup", "similarity", "windows"]
