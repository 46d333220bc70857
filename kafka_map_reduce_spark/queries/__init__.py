"""Import every query module so REGISTRY is fully populated."""

from kafka_map_reduce_spark.queries import (  # noqa: F401
    aggregates,
    audits,
    joins,
    pivots,
    scalar_funcs,
    scans,
    sorts_setops,
    streaming_batch,
    streaming_live,
    subqueries,
    tierc_dedup,
    tierc_similarity,
    tierc_text,
    udfs,
    windows,
)

from kafka_map_reduce_spark.registry import REGISTRY  # noqa: F401
