from etl_everywhere_hub_spark.sources import readers

__all__ = ["readers"]
