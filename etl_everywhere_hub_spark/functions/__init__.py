from etl_everywhere_hub_spark.functions import geo, hashing, text, timeutil, vectors

__all__ = ["geo", "hashing", "text", "timeutil", "vectors"]
