"""Physical-plan inspection helpers.

Plan shape IS part of this engine's contract (PLANS.md): tests assert on
the absence of exchanges, the presence of pushed filters, and broadcast
choices — these helpers make those assertions first-class.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list in the plan (one per parquet scan)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema per scan — the column-pruning evidence."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", physical_plan(df))


def exchange_count(df: DataFrame) -> int:
    return len(re.findall(r"\bExchange\b", physical_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def assert_no_exchange(df: DataFrame, context: str = "") -> None:
    plan = physical_plan(df)
    assert "Exchange" not in plan, f"{context}: plan contains a shuffle:\n{plan}"


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Assert some parquet scan pushes a filter mentioning ``fragment``."""
    pushed = pushed_filters(df)
    assert any(fragment in p for p in pushed), (
        f"no pushed filter mentions {fragment!r}; got {pushed}"
    )
