from etl_everywhere_hub_spark.pipeline import cot, tracks

__all__ = ["cot", "tracks"]
