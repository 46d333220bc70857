"""Registry-iteration contract: the external harness checks the FIRST 50
entries of ``all_queries()`` per round, so the priority prefix is a
load-bearing artifact — a typo'd name or an accidental reorder silently
wastes the round's verification window."""

from __future__ import annotations

from kafka_map_reduce_spark.registry import _PRIORITY, REGISTRY, all_queries


def test_priority_names_exist_and_fill_the_window():
    ordered = all_queries()
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    missing = [n for n in _PRIORITY if n not in ordered]
    assert not missing, f"priority names not registered: {missing}"
    assert list(ordered)[:50] == list(_PRIORITY)


def test_reorder_loses_no_queries():
    assert set(all_queries()) == set(REGISTRY)
    assert len(all_queries()) == len(REGISTRY)


def test_live_streams_sit_at_the_window_edge():
    """Live Structured-Streaming queries are the only ones that can wedge
    a small harness session; they must occupy the END of the 50-query
    window so a wedge shadows nothing else inside it."""
    ordered = list(all_queries().items())
    in_window_streams = [
        i
        for i, (_, spec) in enumerate(ordered[:50])
        if spec.fn.__module__.endswith("streaming_live")
    ]
    if in_window_streams:
        n = len(in_window_streams)
        assert in_window_streams == list(range(50 - n, 50)), (
            "live-stream queries must be contiguous at positions "
            f"{50 - n}..49, got {in_window_streams}"
        )
