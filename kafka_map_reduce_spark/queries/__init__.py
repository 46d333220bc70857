"""Import every query module so REGISTRY is fully populated.

Import order populates REGISTRY; the harness-facing iteration order is
then imposed by ``registry.all_queries()`` via ``registry._PRIORITY`` —
an explicit per-round list that spends a bounded external check window
(the driver verifies a 50-query prefix) on the queries that most need a
fresh correctness row. Live Structured-Streaming queries stay at the end
of that window: they are the only queries that can wedge or exhaust a
small harness driver heap (round 1's run died there), so nothing else in
the window can be shadowed by them.
"""

from kafka_map_reduce_spark.queries import (  # noqa: F401
    scans,
    layout,
    windows,
    subqueries,
    udfs,
    tierc_text,
    tierc_dedup,
    tierc_corpus,
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
    promotions_r10,
)

from kafka_map_reduce_spark.registry import REGISTRY  # noqa: F401
