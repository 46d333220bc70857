from kafka_map_reduce_spark.streaming.pipeline import (
    ConsoleSink,
    JsonLinesSink,
    MemorySink,
    ParquetSink,
    Pipeline,
)
from kafka_map_reduce_spark.streaming.http_sink import HttpJsonLinesSink
from kafka_map_reduce_spark.streaming.sources import file_replay_stream, kafka_source

__all__ = [
    "ConsoleSink",
    "HttpJsonLinesSink",
    "JsonLinesSink",
    "MemorySink",
    "ParquetSink",
    "Pipeline",
    "file_replay_stream",
    "kafka_source",
]
