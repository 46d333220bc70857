"""Import every query module so REGISTRY is fully populated.

Import order IS registry order IS the order an external harness iterates
``queries()`` — deliberate:

1. cheap batch queries first, with the families that lacked driver
   correctness rows in round 1 (windows, subqueries, UDFs, Tier C) right
   after the scans, so a capped or interrupted harness run still records
   them;
2. real Structured-Streaming queries (streaming_live) absolutely last —
   they spin up checkpointed streams and are the only queries that can
   wedge or exhaust a small harness driver heap, and round 1's run died
   there, shadowing every query registered after them.
"""

from kafka_map_reduce_spark.queries import (  # noqa: F401
    scans,
    windows,
    subqueries,
    udfs,
    tierc_text,
    tierc_dedup,
    tierc_similarity,
    scalar_funcs,
    timeseries,
    analytics,
    aggregates,
    joins,
    pivots,
    audits,
    sorts_setops,
    streaming_batch,
    streaming_live,
)

from kafka_map_reduce_spark.registry import REGISTRY  # noqa: F401
