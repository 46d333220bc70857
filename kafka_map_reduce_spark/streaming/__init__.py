from kafka_map_reduce_spark.streaming.pipeline import (
    ConsoleSink,
    JsonLinesSink,
    KafkaSink,
    MemorySink,
    ParquetSink,
    Pipeline,
)
from kafka_map_reduce_spark.streaming.http_sink import HttpJsonLinesSink
from kafka_map_reduce_spark.streaming.gated import gated_ingest_stream
from kafka_map_reduce_spark.streaming.group import (
    FileTopic,
    GroupConsumer,
    GroupCoordinator,
)
from kafka_map_reduce_spark.streaming.monitor import (
    mixture_drift_report,
    mixture_monitor_stream,
)
from kafka_map_reduce_spark.streaming.sources import file_replay_stream, kafka_source

__all__ = [
    "ConsoleSink",
    "FileTopic",
    "GroupConsumer",
    "GroupCoordinator",
    "HttpJsonLinesSink",
    "JsonLinesSink",
    "KafkaSink",
    "MemorySink",
    "ParquetSink",
    "Pipeline",
    "file_replay_stream",
    "gated_ingest_stream",
    "kafka_source",
    "mixture_drift_report",
    "mixture_monitor_stream",
]
