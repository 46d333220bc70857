"""HTTP JSONEachRow batch sink + ack verification (A7/A8).

The reference streams rows into a ClickHouse ``INSERT … FORMAT
JSONEachRow`` HTTP request, closing a batch at max_buf_size/flush-interval
(/root/reference/src/clickhouse.rs:65-139), then an ack stage asserts
status 200 and parses the written-rows summary (clickhouse.rs:147-184).

Spark-first translation:

- serialization is JVM-side (``to_json(struct(*))``);
- each EXECUTOR partition posts its own size-capped chunks
  (foreachPartition) — at 100 TB the sink traffic fans out from the
  executors, never through the driver;
- the ack check runs inline per request: non-200 or a written-rows
  mismatch raises, failing the micro-batch so its offsets are never
  committed (at-least-once, exactly the reference's contract §1.3).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _written_rows(headers) -> int | None:
    """ClickHouse reports progress in the ``x-clickhouse-summary`` JSON
    header (reference ack handler: clickhouse.rs:159-169); the plain
    ``x-written-rows`` form is kept as a fallback for simpler endpoints."""
    summary = headers.get("x-clickhouse-summary")
    if summary is not None:
        try:
            return int(json.loads(summary)["written_rows"])
        except (ValueError, KeyError, TypeError):
            pass
    legacy = headers.get("x-written-rows")
    if legacy is not None:
        try:
            return int(legacy)
        except ValueError:
            pass
    return None


def _post_chunk(url: str, lines: list[str], timeout: float) -> int:
    body = ("\n".join(lines) + "\n").encode("utf-8")
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/x-ndjson"}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        status = resp.status
        written = _written_rows(resp.headers)
    if status != 200:
        raise IOError(f"sink returned HTTP {status}")  # -> DLQ/retry path
    if written is not None and written != len(lines):
        raise IOError(f"ack mismatch: sent {len(lines)} rows, sink wrote {written}")
    return len(lines)


class HttpJsonLinesSink:
    """Batched JSONEachRow HTTP sink with ack verification.

    ``max_buf_size`` mirrors the demo's 128-row request batches
    (main.rs:115).
    """

    def __init__(self, url: str, max_buf_size: int = 128, timeout: float = 30.0):
        self.url = url
        self.max_buf_size = max_buf_size
        self.timeout = timeout

    def write(self, df: DataFrame, batch_id: int) -> int:
        url, cap, timeout = self.url, self.max_buf_size, self.timeout
        lines_df = df.select(F.to_json(F.struct(*df.columns)).alias("line"))
        # Single computation per micro-batch: the posted-row count rides an
        # accumulator on the same foreachPartition action instead of a
        # separate count() pass over the batch. Like the posts themselves,
        # the counter is AT-LEAST-ONCE: a retried/speculative task re-posts
        # its partition and adds again, so the metric can exceed the batch
        # row count exactly when duplicate posts happened — by design it
        # counts rows POSTED, not distinct rows acknowledged.
        posted = df.sparkSession.sparkContext.accumulator(0)

        def post_partition(rows):
            buf: list[str] = []
            n_part = 0
            for row in rows:
                buf.append(row.line)
                if len(buf) >= cap:
                    n_part += _post_chunk(url, buf, timeout)
                    buf = []
            if buf:
                n_part += _post_chunk(url, buf, timeout)
            posted.add(n_part)

        lines_df.foreachPartition(post_partition)
        return posted.value
