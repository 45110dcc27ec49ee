"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps no cross-record state at all (one-shot loop,
/root/reference/app/app.py:220). These operators cover the SURVEY.md §2.4
"custom stateful ops" capability: arbitrary per-key state maintained by
the engine's state store across micro-batches, with watermark/timeout
eviction — the building block for running aggregates, anomaly flags, and
session enrichment that windowed aggregation can't express.

Scale: state is partitioned by the grouping key across executors; each
micro-batch touches only keys present in the batch (plus timeouts), so
state size — not throughput — is the scaling dimension. Use timeouts to
bound it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: (n_events, total_value) carried per user across micro-batches.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count + value sum, emitted (updated)
    every micro-batch the user appears in. State never expires here —
    callers with unbounded key spaces should use a timeout variant."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
