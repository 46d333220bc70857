"""Custom stateful reducer lifecycle (Tier A, A4) on
``applyInPandasWithState``.

The reference's ``Reducer`` trait (/root/reference/src/lib.rs:703-713):
``reduce(&mut self, t)`` accumulates, ``flush()`` emits, ``reset()``
clears, ``is_full()`` triggers. Spark-first mapping: per-key GroupState
holds the accumulator; each micro-batch's rows for a key are reduced in
one Arrow batch; flush emits on every batch (update semantics) and state
eviction on timeout replaces the explicit reset.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_reduce(
    df: DataFrame,
    key_cols: list[str],
    init: Callable[[], tuple],
    reduce_fn: Callable[[tuple, pd.DataFrame], tuple],
    flush_fn: Callable[[tuple, tuple], dict],
    state_schema: T.StructType,
    output_schema: T.StructType,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Generic keyed reducer over a streaming DataFrame.

    ``reduce_fn(state, pdf) -> state`` accumulates a batch;
    ``flush_fn(key, state) -> row dict`` emits the current accumulator
    (every batch, update-mode) — the reduce->flush cycle of lib.rs:750-840
    without the whole-batch poisoning.
    """

    def run(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc = tuple(state.get) if state.exists else init()
        for pdf in pdfs:
            acc = reduce_fn(acc, pdf)
        state.update(acc)
        yield pd.DataFrame([flush_fn(key, acc)])

    return df.groupBy(*key_cols).applyInPandasWithState(
        run,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
