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

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        rows = [json.loads(line) for line in body.decode().splitlines() if line]
        if _Collector.fail_mode:
            self.send_response(500)
            self.end_headers()
            return
        _Collector.received.append(rows)
        self.send_response(200)
        self.send_header("x-written-rows", str(len(rows)))
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    _Collector.received, _Collector.fail_mode = [], False
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
