from etl_everywhere_hub_spark.sources import layout, readers

__all__ = ["layout", "readers"]
