"""HTTP JSONEachRow sink tests against a live in-process HTTP server —
the sink+ack semantics of the reference's ClickHouse writer
(clickhouse.rs:65-184): 200 acks commit, non-200 fails the batch.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from tests.conftest import SF_SMOKE


class _Collector(BaseHTTPRequestHandler):
    received: list[list[dict]] = []
    fail_mode = False
    underreport_mode = False

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        rows = [json.loads(line) for line in body.decode().splitlines() if line]
        if _Collector.fail_mode:
            self.send_response(500)
            self.end_headers()
            return
        _Collector.received.append(rows)
        self.send_response(200)
        # The REAL ClickHouse ack shape: progress JSON in
        # x-clickhouse-summary (clickhouse.rs:159-169), not a bare count
        # header — the sink must parse this form against real endpoints.
        n = len(rows) - 1 if _Collector.underreport_mode else len(rows)
        self.send_header(
            "x-clickhouse-summary",
            json.dumps({"read_rows": str(n), "written_rows": str(n)}),
        )
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    _Collector.received, _Collector.fail_mode = [], False
    _Collector.underreport_mode = False
    srv = HTTPServer(("127.0.0.1", 0), _Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/insert"
    srv.shutdown()


def test_http_sink_batches_and_acks(spark, http_server):
    from kafka_map_reduce_spark.sources import load_table
    from kafka_map_reduce_spark.streaming import Pipeline
    from kafka_map_reduce_spark.streaming.http_sink import HttpJsonLinesSink

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    sink = HttpJsonLinesSink(http_server, max_buf_size=128)
    metrics = Pipeline(ev).run_batch(sink)

    assert metrics["written_rows"] == 1000
    got = [r for chunk in _Collector.received for r in chunk]
    assert len(got) == 1000
    assert {r["event_id"] for r in got} == set(range(1000))
    # request batches are size-capped (the 128-row contract, main.rs:115)
    assert max(len(chunk) for chunk in _Collector.received) <= 128


def test_http_sink_non_200_fails_batch(spark, http_server):
    from kafka_map_reduce_spark.sources import load_table
    from kafka_map_reduce_spark.streaming import Pipeline
    from kafka_map_reduce_spark.streaming.http_sink import HttpJsonLinesSink

    _Collector.fail_mode = True
    ev = load_table(spark, SF_SMOKE, "events").select("event_id").limit(10)
    sink = HttpJsonLinesSink(http_server, max_buf_size=4)
    with pytest.raises(Exception):
        Pipeline(ev).run_batch(sink)  # failed ack must propagate (no commit)


def test_http_sink_written_rows_mismatch_fails_batch(spark, http_server):
    """The at-least-once ack contract: a sink that acknowledges fewer rows
    than sent must fail the micro-batch (clickhouse.rs:165-175)."""
    from kafka_map_reduce_spark.sources import load_table
    from kafka_map_reduce_spark.streaming import Pipeline
    from kafka_map_reduce_spark.streaming.http_sink import HttpJsonLinesSink

    _Collector.underreport_mode = True
    ev = load_table(spark, SF_SMOKE, "events").select("event_id").limit(10)
    sink = HttpJsonLinesSink(http_server, max_buf_size=4)
    with pytest.raises(Exception, match="ack mismatch|IOError|Py4J"):
        Pipeline(ev).run_batch(sink)


def test_written_rows_header_parsing():
    """x-clickhouse-summary is authoritative; x-written-rows is fallback."""
    from kafka_map_reduce_spark.streaming.http_sink import _written_rows

    assert _written_rows({"x-clickhouse-summary": '{"written_rows": "42"}'}) == 42
    assert _written_rows({"x-written-rows": "7"}) == 7
    # summary wins over legacy when both present
    assert (
        _written_rows(
            {"x-clickhouse-summary": '{"written_rows": 3}', "x-written-rows": "9"}
        )
        == 3
    )
    assert _written_rows({"x-clickhouse-summary": "not json"}) is None
    assert _written_rows({}) is None
