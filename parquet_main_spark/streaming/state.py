"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where the built-in stateful operators (windowed/session aggregation,
dropDuplicates) can't express the semantics, Spark's arbitrary-state API
is the engine's escape hatch: per-key state lives in the state store,
batches arrive as pandas frames, and the operator decides what to emit.
This module's example is THRESHOLD CROSSING detection — emit one row the
moment a key's cumulative event count reaches N (e.g. "flag a user as a
heavy hitter at their 10th event", "flag a host at its 1000th crawled
page") — which no built-in emits: a windowed count aggregates per window
(not cumulative) and can't fire exactly once at the crossing event.

Ordering note: state is cumulative across micro-batches, so crossings are
exact when arrival respects event order ACROSS batches (each batch's rows
are sorted in-operator; a continuously-ingested crawl appends in time
order). Out-of-order delivery across batches would need event-time
buffering — out of scope for this operator.

pyspark 4.1 caveat (BENCH/BASELINE.md host notes): applyInPandasWithState
callables must be plain named functions — functools.partial or partially
annotated closures break eval-type inference. Parameters are therefore
bound via a closure-free default-arg pattern.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def threshold_crossings(stream_df: DataFrame, *, key_col: str, ts_col: str,
                        order_cols: list[str] | None = None,
                        threshold: int) -> DataFrame:
    """Streaming DataFrame -> one row per key at the moment its cumulative
    row count reaches ``threshold``: (key, crossed_at, n_seen_in_batch).

    State per key is a single running count (constant size — the 100-TB
    shape: state growth is O(distinct keys), not O(rows); keys that crossed
    long ago keep one small tombstone row). ``order_cols`` (default
    ``[ts_col]``) sorts each batch's rows per key before counting so the
    crossing row is deterministic within a batch."""
    order = list(order_cols or [ts_col])
    key_ddl = stream_df.schema[key_col].dataType.simpleString()
    ts_ddl = stream_df.schema[ts_col].dataType.simpleString()
    out_schema = f"{key_col} {key_ddl}, crossed_at {ts_ddl}, n_at_crossing int"
    state_schema = "count int"

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (count,) = state.get if state.exists else (0,)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(order, kind="mergesort").reset_index(drop=True)
        new_count = count + len(rows)
        if count < threshold <= new_count:
            crossing = rows.iloc[threshold - count - 1]
            yield pd.DataFrame({
                key_col: [key[0]],
                "crossed_at": [crossing[ts_col]],
                "n_at_crossing": [threshold],
            })
        state.update((new_count,))

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
