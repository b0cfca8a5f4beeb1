from etl_everywhere_hub_spark.streaming import jobs

__all__ = ["jobs"]
