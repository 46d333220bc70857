"""Custom stateful reducer lifecycle (Tier A, A4) on
``applyInPandasWithState``.

The reference's ``Reducer`` trait (/root/reference/src/lib.rs:703-713):
``reduce(&mut self, t)`` accumulates, ``flush()`` emits, ``reset()``
clears, ``is_full()`` triggers, configured by ``ReduceConfig``
(lib.rs:677-701). Spark-first mapping: per-key GroupState holds the
accumulator; each micro-batch's rows for a key are reduced in one Arrow
batch; flush emits on every batch (update semantics).

Lifecycle parity:

- ``flush_interval`` (lib.rs:786-792)  -> the stream trigger cadence;
- ``is_full`` + ``WhenFull::Flush`` (lib.rs:832-835, 697-701) ->
  ``capacity``: once a key has absorbed >= capacity rows since its last
  flush, the flush emits and the accumulator RESETS (the reference's
  flush()-then-reset cycle). ``WhenFull::Backpressure`` has no per-key
  analogue in the micro-batch model — admission control is global
  (maxOffsetsPerTrigger / maxFilesPerTrigger on the source), which is
  where the engine expresses backpressure (SURVEY §4.2);
- state eviction (the explicit ``reset`` on idle keys) -> ``timeout``:
  with ``ProcessingTimeTimeout``, a key idle for ``timeout_duration_ms``
  is re-invoked with ``hasTimedOut`` and its state is removed WITHOUT
  re-emitting (update mode already flushed the accumulator on its last
  data batch — an eviction emit would duplicate that row), so
  long-running streams don't grow state without bound.

Spark 4's ``transformWithStateInPandas`` (state-v2: typed ValueState,
native TTL, timers, RocksDB) is the forward-looking home for this
operator; its Python worker requires ``google.protobuf``, which this
runtime does not ship, so the engine stays on ``applyInPandasWithState``
(verified: a TWS query crashes the StreamingPythonRunner on protobuf
import here). The runner contract below is API-agnostic — porting means
swapping the ``run`` adapter, not the reducer lifecycle.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def make_reducer_runner(
    init: Callable[[], tuple],
    reduce_fn: Callable[[tuple, pd.DataFrame], tuple],
    flush_fn: Callable[[tuple, tuple], dict],
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 60_000,
    capacity: int | None = None,
):
    """Build the ``(key, pdfs, state) -> Iterator[pdf]`` function passed to
    ``applyInPandasWithState``. Factored out so the lifecycle (timeout
    eviction, capacity flush-reset) is unit-testable against a fake
    GroupState without running a stream.

    State layout: the user accumulator tuple + one trailing bookkeeping
    int (rows absorbed since last reset) used for the capacity trigger.
    """

    def run(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if timeout != "NoTimeout" and state.hasTimedOut:
            # Idle-key eviction: drop the state WITHOUT emitting — update
            # mode already flushed this accumulator on its last data batch,
            # so an eviction-time emit would always be an exact duplicate
            # row (double-counting for any consumer that sums the output).
            if state.exists:
                state.remove()
            return

        if state.exists:
            *acc, seen = tuple(state.get)
            acc = tuple(acc)
        else:
            acc, seen = init(), 0
        for pdf in pdfs:
            acc = reduce_fn(acc, pdf)
            seen += len(pdf)

        flushed = flush_fn(key, acc)
        if capacity is not None and seen >= capacity:
            # is_full -> WhenFull::Flush: emit and reset the accumulator.
            state.remove()
        else:
            state.update(tuple(acc) + (seen,))
            if timeout != "NoTimeout":
                state.setTimeoutDuration(timeout_duration_ms)
        yield pd.DataFrame([flushed])

    return run


def stateful_reduce(
    df: DataFrame,
    key_cols: list[str],
    init: Callable[[], tuple],
    reduce_fn: Callable[[tuple, pd.DataFrame], tuple],
    flush_fn: Callable[[tuple, tuple], dict],
    state_schema: T.StructType,
    output_schema: T.StructType,
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 60_000,
    capacity: int | None = None,
) -> DataFrame:
    """Generic keyed reducer over a streaming DataFrame.

    ``reduce_fn(state, pdf) -> state`` accumulates a batch;
    ``flush_fn(key, state) -> row dict`` emits the current accumulator
    (every batch, update-mode) — the reduce->flush cycle of lib.rs:750-840.
    ``timeout="ProcessingTimeTimeout"`` evicts idle keys after
    ``timeout_duration_ms`` (state removal, no duplicate emission);
    ``capacity`` flushes-and-resets a key after that many absorbed rows
    (``is_full`` + ``WhenFull::Flush``, lib.rs:697-701, 832-835).
    """
    run = make_reducer_runner(
        init, reduce_fn, flush_fn, timeout, timeout_duration_ms, capacity
    )
    # Trailing bookkeeping int (rows since last reset) rides in the state.
    full_state_schema = T.StructType(
        list(state_schema.fields) + [T.StructField("__seen", T.LongType())]
    )
    return df.groupBy(*key_cols).applyInPandasWithState(
        run,
        outputStructType=output_schema,
        stateStructType=full_state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
