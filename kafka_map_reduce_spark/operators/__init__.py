from kafka_map_reduce_spark.operators.asof import asof_join

__all__ = ["asof_join"]
