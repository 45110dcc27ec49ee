"""Streaming ops surface: health + progress metrics.

Reference analog: the `/health` probe (app/app.py:265-267) — a container
readiness gate with no insight into throughput or lag. The Spark-native
upgrade is the StreamingQueryListener + StreamingQuery.status/
lastProgress: per-batch row counts, durations, and state-store sizes,
captured here into plain dicts a monitoring endpoint can serve.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Collects one record per completed micro-batch. Driver-side only;
    the list is bounded by ``keep_last`` (a long-running query must not
    grow driver memory)."""

    def __init__(self, keep_last: int = 100):
        self.keep_last = keep_last
        self.batches: list[dict[str, Any]] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            {
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": p.batchDuration,
            }
        )
        del self.batches[: -self.keep_last]

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append(str(event.id))


def query_health(query) -> dict[str, Any]:
    """The /health payload for one StreamingQuery: alive + latest batch
    metrics (None before the first batch completes)."""
    last = query.lastProgress
    return {
        "active": query.isActive,
        "message": query.status.get("message", "") if query.status else "",
        "last_batch_id": last.get("batchId") if last else None,
        "last_num_input_rows": last.get("numInputRows") if last else None,
    }
