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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's successor stateful API
# ---------------------------------------------------------------------------

#: Output of sessionized_user_totals: live rows as users arrive, plus a
#: final evicted=true row when a user's idle timer fires.
_TWS_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, evicted boolean"
)

RUN_EVICT_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _make_session_processor(idle_timeout_ms: int):
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _SessionProcessor(StatefulProcessor):
        """Per-user running totals with idle-timeout eviction: every
        input batch refreshes a processing-time timer; when it expires
        the accumulated row is emitted once more with evicted=true and
        the state (and its store footprint) is dropped — the bounded-
        state pattern for unbounded key spaces."""

        def init(self, handle):
            self._handle = handle
            self._agg = handle.getValueState(
                "agg", "n_events long, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            # one live timer per key: re-arm on every arrival
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + idle_timeout_ms
            )
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "evicted": [False],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if self._agg.exists():
                n, total = self._agg.get()
                self._agg.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "total_value": [round(total, 4)],
                        "evicted": [True],
                    }
                )

        def close(self):
            pass

    return _SessionProcessor()


def sessionized_user_totals(
    events: DataFrame, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """``transformWithStateInPandas`` variant of ``running_user_totals``
    with timeout-based state eviction (the Spark-4 API the older
    ``applyInPandasWithState`` predates: named state variables, explicit
    timers, TTL support). Executed and asserted by
    ``tests/tws_driver.py`` (cross-batch carry, timer eviction,
    post-eviction fresh restart).

    Requirements and caveats (each pinned by the test):
    - RocksDB state store provider: set
      ``spark.sql.streaming.stateStore.providerClass`` to
      ``RUN_EVICT_STATE_STORE`` before starting the query;
    - a ``google.protobuf`` runtime (the TWS state protocol serializes
      state messages as protobuf; tests vendor a pure-Python runtime
      where no wheel is installed — tests/conftest.py);
    - in this environment daemon-forked Python workers crash against
      the TWS state server (socket reset, no traceback) — run with
      ``spark.python.use.daemon=false``;
    - with ``timeMode='ProcessingTime'`` the engine schedules
      timer-evaluation batches indefinitely, so
      ``processAllAvailable()`` never returns — poll the sink instead.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_session_processor(idle_timeout_ms),
        outputStructType=_TWS_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="ProcessingTime",
    )


# ---------------------------------------------------------------------------
# Stateful conversion funnel: view -> click -> purchase, exact under
# out-of-order arrival
# ---------------------------------------------------------------------------

#: Per-user event-time lists (epoch micros). Keeping the LISTS (bounded
#: by individual activity, the same bound the batch funnel's
#: collect_list carries) makes the chase EXACT under any arrival order:
#: a late-arriving early view can still unlock an already-seen click,
#: which a scalar (t1,t2,t3) state would have discarded.
_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("views", T.ArrayType(T.LongType())),
        T.StructField("clicks", T.ArrayType(T.LongType())),
        T.StructField("purchases", T.ArrayType(T.LongType())),
    ]
)

_FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)


def _chase(views: list, clicks: list, purchases: list):
    t1 = min(views) if views else None
    t2 = min((c for c in clicks if t1 is not None and c > t1), default=None)
    t3 = min(
        (p for p in purchases if t2 is not None and p > t2), default=None
    )
    # is-not-None, not truthiness: epoch 0 is a valid timestamp
    stage = (
        3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
    )
    return stage, t1, t2, t3


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    views, clicks, purchases = (
        state.get if state.exists else ([], [], [])
    )
    views, clicks, purchases = list(views), list(clicks), list(purchases)
    buckets = {"view": views, "click": clicks, "purchase": purchases}
    for pdf in pdfs:
        for et, ts in zip(pdf["event_type"], pdf["ts"]):
            b = buckets.get(et)
            # pd.isna guard: a null/NaT ts would append the NaT sentinel
            # (-2^63 ns) and poison the min-chase; the batch twin's
            # F.min/collect_list skip null ts, so the stream must too
            if b is not None and not pd.isna(ts):
                b.append(int(pd.Timestamp(ts).value // 1000))
    state.update((views, clicks, purchases))
    stage, t1, t2, t3 = _chase(views, clicks, purchases)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stage": [stage],
            "t1_us": [t1],
            "t2_us": [t2],
            "t3_us": [t3],
        }
    )


def funnel_stages(events: DataFrame) -> DataFrame:
    """Per-user live conversion stage (0-3) for the strict-order
    view -> click -> purchase funnel — the streaming twin of the batch
    `q_event_funnel`, updated every micro-batch the user appears in and
    EXACT under out-of-order arrival (see state schema note). State is
    bounded by per-user activity; unbounded key spaces should add a
    timeout like the TWS eviction variant below."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=_FUNNEL_OUTPUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# TWS list/map-state profile: the remaining state primitives, executed
# ---------------------------------------------------------------------------
#: Output of user_activity_profile: one row per (user, input batch).
_TWS_PROFILE_SCHEMA = (
    "user_id long, n_types long, top_type string, recent_sum double, "
    "k_kept long"
)


def _make_profile_processor(k_recent: int):
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _ProfileProcessor(StatefulProcessor):
        """Per-user activity profile exercising the two TWS state
        primitives the sessionizer does not: ListState (rolling last-k
        event values in cents) and MapState (per-event-type counts).
        Emits, per input batch: the number of distinct types seen, the
        modal type (count desc, name asc tiebreak — deterministic), the
        sum of the kept last-k values, and how many are kept."""

        def init(self, handle):
            self._recent = handle.getListState("recent", "cents long")
            self._counts = handle.getMapState(
                "counts", "event_type string", "c long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            batch = pd.concat(list(rows))
            # deterministic intra-batch order regardless of arrival
            batch = batch.sort_values("event_id")
            for t, cnt in batch["event_type"].value_counts().items():
                prev = (
                    self._counts.getValue((t,))[0]
                    if self._counts.containsKey((t,))
                    else 0
                )
                self._counts.updateValue((t,), (prev + int(cnt),))
            for cents in (
                (batch["value"] * 100).round().astype("int64").tolist()
            ):
                self._recent.appendValue((cents,))
            kept = [r[0] for r in self._recent.get()][-k_recent:]
            # ListState has no truncate: rebuild to hold only last-k
            self._recent.put([(c,) for c in kept])
            counts = {
                kv[0][0]: kv[1][0] for kv in self._counts.iterator()
            }
            top = min(counts, key=lambda t: (-counts[t], t))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_types": [len(counts)],
                    "top_type": [top],
                    "recent_sum": [round(sum(kept) / 100.0, 4)],
                    "k_kept": [len(kept)],
                }
            )

        def close(self):
            pass

    return _ProfileProcessor()


def user_activity_profile(events: DataFrame, k_recent: int = 3) -> DataFrame:
    """``transformWithStateInPandas`` operator exercising ListState
    (rolling last-k values; rebuilt via put() since the API has no
    truncate) and MapState (per-type counters with containsKey/
    getValue/updateValue/iterator) — together with the sessionizer's
    ValueState + timers this executes every TWS state primitive.
    Same environment caveats as :func:`sessionized_user_totals`
    (vendored protobuf, no Python worker daemon, RocksDB provider);
    asserted by tests/tws_driver.py: cross-batch list truncation to
    last-k, map counters accumulating across batches, deterministic
    modal-type tiebreak."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_profile_processor(k_recent),
        outputStructType=_TWS_PROFILE_SCHEMA,
        outputMode="update",
        timeMode="None",
    )
