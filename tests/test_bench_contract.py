"""bench.py's stdout contract: the driver tail-captures stdout and
parses the LAST line as one JSON object — a formatting regression here
silently turns BENCH_r{N}.json.parsed null (the round-2 lesson)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_last_line_is_compact_parseable_json():
    # this launches a SECOND full JVM while the shared pytest session
    # (local[32], 8g driver) is alive — cap its cores/memory and run one
    # single pass so a loaded host can't push it toward the timeout
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_FILTER="q6_revenue",
        SPARK_GRAFT_BENCH_PASSES="1",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_DRIVER_MEM="2g",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert set(last) == {"metric", "value", "unit", "pass1_total", "sf", "n_queries"}
    assert last["unit"] == "sec" and last["n_queries"] == 1
    # headline is the min-of-passes sum; with PASSES=1 they coincide
    assert last["value"] == last["pass1_total"]
    assert len(lines[-1]) < 230  # must survive a bounded tail capture
    # the detail line (first JSON line) carries the per-query maps
    detail = json.loads(lines[-2])
    assert "queries" in detail and "rows" in detail


def test_artifact_writable_guard():
    """Gate-artifact clobber guard (VERDICT r12 #8): a committed,
    git-clean round-end record refuses an implicit overwrite; absent or
    dirty files are writable."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.artifacts import artifact_writable

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    committed = os.path.join(repo, "SWEEP_DETAIL_sf0.001.json")
    if os.path.exists(committed):
        clean = (
            subprocess.run(
                ["git", "-C", repo, "diff", "--quiet", "HEAD", "--", committed],
                capture_output=True,
            ).returncode
            == 0
        )
        assert artifact_writable(committed) == (not clean)
    assert artifact_writable(os.path.join(repo, "no_such_artifact.json"))
