"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the two cases AQE doesn't
cover: (a) skewed AGGREGATION keys (one reducer owns the hot key), and
(b) broadcast-infeasible joins against a skewed build side.

Pattern (a), implemented here: two-phase aggregation — salt the key into
``n_salts`` subkeys, partially aggregate on (key, salt), then finally
aggregate on key. The hot key's work spreads across n_salts reducers;
the second shuffle carries only n_salts rows per key.

Pattern (b): replicate the small side n_salts times (one copy per salt
value) and salt the big side's key — `salt_join` below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """COUNT(*) per key via two-phase salted aggregation. Output:
    (key_cols..., n). Identical result to a plain groupBy().count(),
    skew-proof by construction."""
    salt = (F.rand() * n_salts).cast("int").alias("_salt")
    partial = (
        df.select(*key_cols, salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_n"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_n").alias("n"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """SUM(value) per key, two-phase salted. Output: (key_cols..., total)."""
    salt = (F.rand() * n_salts).cast("int").alias("_salt")
    partial = (
        df.select(*key_cols, value_col, salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_s"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_s").alias("total"))


def salt_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small side without
    broadcast: the big side gets a random salt column, the small side is
    replicated once per salt value, and the join key becomes (key, salt)
    — the hot key's rows spread over n_salts partitions.

    The small side grows n_salts x; use only when broadcast is off the
    table (side too big) and AQE's skew split is insufficient.

    Only ``inner`` and ``left`` (big-side-preserving) joins are valid:
    with right/full_outer, every unmatched small-side row is unmatched in
    all n_salts replicas and would be emitted n_salts times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salt_join supports inner/left only, got {how!r}: the "
            "replicated small side emits unmatched rows once per salt "
            "under right/full joins"
        )
    salted_big = big.withColumn("_salt", (F.rand() * n_salts).cast("int"))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")
