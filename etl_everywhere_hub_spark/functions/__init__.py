from etl_everywhere_hub_spark.functions import hashing, text, timeutil, vectors

__all__ = ["hashing", "text", "timeutil", "vectors"]
