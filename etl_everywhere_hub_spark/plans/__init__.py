from etl_everywhere_hub_spark.plans import explain

__all__ = ["explain"]
