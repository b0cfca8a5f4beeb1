from etl_everywhere_hub_spark.streaming import jobs, sinks

__all__ = ["jobs", "sinks"]
