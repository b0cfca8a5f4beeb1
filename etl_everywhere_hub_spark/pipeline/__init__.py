from etl_everywhere_hub_spark.pipeline import tracks

__all__ = ["tracks"]
