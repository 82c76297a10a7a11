"""Custom stateful streaming operator (applyInPandasWithState).

The reference's only state is the external checkpoint table; a real
incremental engine also needs *in-stream* state (running per-key
aggregates, dedup-across-batches, session tracking). This module is the
template: per-key state as a typed tuple, Arrow-batched updates, update
output mode.

Scale notes: state lives in the executors' state store partitioned by
key (shuffle on user_id), so memory is O(distinct keys / executor);
with a watermark + timeout the store evicts idle keys — unbounded key
spaces need ``GroupStateTimeout.EventTimeTimeout``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n_events bigint, total_value double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per user across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stream_user_totals_with_state(stream: DataFrame) -> DataFrame:
    """Running per-user (count, sum) maintained in stream state —
    emits the refreshed totals for keys touched by each micro-batch."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
