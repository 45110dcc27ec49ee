"""Change-data-capture / slowly-changing-dimension operators.

A 100 TB training-data pipeline is rarely built from one immutable
snapshot: corpora arrive as a base load plus change feeds (new crawls,
takedown deletes, metadata corrections), and dimension attributes drift
over time. This module re-expresses the two canonical shapes as pure
DataFrame plans:

- :func:`upsert_latest` — latest-wins merge of a base snapshot with one
  or more change batches (the Delta/Hudi ``MERGE INTO`` semantics,
  expressed engine-neutrally as union + one ``max_by`` aggregation).
- :func:`scd2_intervals` — type-2 slowly-changing-dimension history:
  collapse an event stream of attribute observations into validity
  intervals ``[valid_from, valid_to)`` per key.

No reference analog (the reference is a stateless log transformer);
this covers the "mutable corpus at scale" shape the SURVEY §2 L-rows
target. Both operators are deterministic and exactly SQL-expressible,
so their queries carry full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def upsert_latest(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
    tiebreak_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Latest-wins merge: one row per key — the row with the highest
    ``version_col`` — with tombstones (``op_col == delete_op``) dropped
    AFTER the argmax, so a delete that is the latest change removes the
    key even when older upserts exist.

    ``changes`` is the union of the base snapshot (as version-0 upserts)
    and every change batch. Shape at scale: ONE hash shuffle on the key;
    ``max_by`` packs the whole row through a partial+final aggregation
    (map-side combine shrinks duplicate keys before the exchange), so there is
    no window sort and no join — the same plan shape as dedup_exact.

    Version-tie policy (two rows with equal (key, version)): by default
    the ordering key is the bare version and the winner is whichever row
    ``max_by`` sees last — NOT deterministic. Two opt-in guards:

    - ``tiebreak_cols``: extra columns folded into the ordering key
      (lexicographic struct comparison: version first, then each
      tiebreaker), making the winner total whenever
      (version, *tiebreak_cols) is unique per key. The streaming CDC
      sink passes ``[op_col]`` so an upsert/delete collision at the same
      version resolves deterministically (max string — 'U' beats 'D').
    - ``strict=True``: raise ``ValueError`` if any (key, version) pair
      occurs more than once. Costs one extra aggregation over the feed
      (an eager action), so it is for batch validation, not per-epoch
      streaming.

    ``keep_tombstones=True`` keeps the winning delete rows in the
    output (readers filter them). An INCREMENTALLY maintained table
    must store tombstones: dropping one forgets the delete, and a
    lower-versioned upsert for the key replayed in a later batch would
    resurrect it (the streaming upsert sink's late-arrival case,
    pinned in test_streaming.py).
    """
    if strict:
        dup = (
            changes.groupBy(*key_cols, version_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            raise ValueError(
                "upsert_latest(strict=True): duplicate (key, version) "
                f"pair {tuple(r[c] for c in key_cols)} @ "
                f"{r[version_col]!r} — the winner would be "
                "nondeterministic; pass tiebreak_cols or dedupe upstream"
            )
    payload = F.struct(*[F.col(c) for c in changes.columns])
    order_key = (
        F.struct(F.col(version_col), *[F.col(c) for c in tiebreak_cols])
        if tiebreak_cols
        else F.col(version_col)
    )
    merged = changes.groupBy(*key_cols).agg(
        F.max_by(payload, order_key).alias("_row")
    )
    out_cols = [c for c in changes.columns if c not in key_cols]
    out = merged.select(
        *key_cols, *[F.col(f"_row.{c}").alias(c) for c in out_cols]
    )
    if keep_tombstones:
        return out
    return out.filter(F.col(op_col) != delete_op)


def scd2_intervals(
    observations: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: Column,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 SCD history: collapse per-key attribute observations into
    validity intervals. Consecutive observations with the SAME attribute
    merge into one interval; an attribute change closes the previous
    interval at the change's timestamp (``valid_to`` exclusive; the
    current interval has ``valid_to`` null / ``is_current`` true).

    Windows partition by key — safe at 100 TB because key cardinality
    (users/entities) scales with the data while per-key history stays
    bounded; there is no global or low-cardinality sort (contrast
    text_quality_deciles' rewrite, which had single-digit partitions).
    ``tiebreak_col`` makes the order total so lag/lead are deterministic
    under equal timestamps.
    """
    w = W.partitionBy(key_col).orderBy(ts_col.asc(), F.col(tiebreak_col).asc())
    runs = (
        observations.withColumn("_ts", ts_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        # run starts where the attribute differs from its predecessor
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    w2 = W.partitionBy(key_col).orderBy(F.col("_ts").asc(), F.col(tiebreak_col).asc())
    return (
        runs.withColumn("valid_to", F.lead("_ts").over(w2))
        .select(
            F.col(key_col),
            F.col(attr_col),
            F.col("_ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
