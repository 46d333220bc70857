from kafka_map_reduce_spark.functions.compat import (
    davg4,
    dsum4,
    o_avg4,
    o_round4,
    o_sum4,
    round4,
)

__all__ = ["davg4", "dsum4", "o_avg4", "o_round4", "o_sum4", "round4"]
