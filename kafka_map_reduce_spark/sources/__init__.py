from kafka_map_reduce_spark.sources.tables import TABLE_NAMES, Tables, load_table

__all__ = ["TABLE_NAMES", "Tables", "load_table"]
