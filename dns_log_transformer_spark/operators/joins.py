"""Custom join operators Spark lacks natively: as-of and range joins.

Both are expressed as compositions of built-in operators chosen for their
shuffle behavior at scale (SURVEY.md §2.4 "custom operators: composition
first"):

- as-of join: union + single partition-sort + last(ignorenulls) window
  carry-forward. ONE shuffle on the key, linear work — never the
  per-row subquery (O(n*m)) and never a full interval cross join.
- range join: Spark plans a pure range predicate as a broadcast
  nested-loop join (O(n*m) compares). The scalable shape buckets the
  point side and explodes the interval side into the coarse buckets it
  overlaps, turning the join into an equi-join on bucket + residual
  refine. Bucket width trades explode fan-out vs per-bucket compare
  work; set it near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with the same ``on``
    key whose timestamp is before (``strict``) or at-or-before the left
    timestamp. The event<->dimension-history enrichment join.

    Output: all left columns + the requested right columns (null when no
    right row precedes). Ties within a side are broken by source order of
    the sort columns; right rows at identical timestamps resolve to the
    last one in (ts, _src) order.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    lhs = left.select(
        "*",
        F.lit(1).alias("_src"),
        F.col(left_ts).alias("_t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    rhs = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on
        ],
        F.col(on),
        F.lit(0).alias("_src"),
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal timestamps unless strict:
    # strict => a right row AT the left ts must not be visible, so left
    # sorts first (_src asc puts right(0) first = visible; for strict we
    # exclude equal-ts rights by ordering left(1) before right(0)? No —
    # visibility is handled by the frame: rowsBetween(-inf, -1) over an
    # order where equal-ts rights precede lefts makes them visible
    # (at-or-before); ordering them after lefts hides them (strictly-
    # before).
    order_src = F.asc("_src") if not strict else F.desc("_src")
    w = (
        W.partitionBy(on)
        .orderBy(F.col("_t"), order_src)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_src") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_carry_{c}").alias(c) for c in right_cols],
    )
    return out


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval INNER join ``start <= point < end`` as a
    bucketized equi-join: intervals explode into the coarse buckets they
    overlap, points map to their single bucket, the join runs on the
    bucket key, and the exact range predicate refines. All values are
    numeric (use unix_timestamp for time). Inner-only: an outer variant
    would need the refine predicate inside the join condition, not as a
    post-filter.

    vs the naive range join (broadcast nested loop, O(n*m) compares):
    work becomes O(n + m * avg_interval/bucket_width + matches).

    Empty/inverted intervals (end <= start) are pre-filtered: sequence()
    DESCENDS when stop < start, so a dirty interval with end << start
    would otherwise explode into an unbounded run of spurious bucket rows
    (correctness survives the refine filter; the fan-out does not).
    """
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    intervals = intervals.filter(F.col(start_col) < F.col(end_col))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                F.floor((F.col(end_col) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "_bucket").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("_bucket")
