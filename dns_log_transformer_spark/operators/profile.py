"""Data-profiling operator: per-column quality stats in one declarative
pass per column.

A 100 TB ingest needs a cheap answer to "which columns are broken" before
any modeling — null rates, cardinality, value ranges. Reference analog:
none (the reference logs-and-drops per record, app/app.py:255-263); this
is the engine-level upgrade of that visibility.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_nulls, n_distinct, min_str, max_str) per column.

    Shape at scale: one partial+final aggregate PER COLUMN, unioned —
    each scan is pruned to that single column (parquet columnar IO), and
    there is no multi-distinct Expand (which would multiply every input
    row by len(cols) — the q_distinct_and_percentiles lesson). min/max
    are cast to string AFTER aggregating so one schema fits all column
    types; distinct counts are exact (COUNT DISTINCT, nulls excluded).
    """
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c)).agg(
                F.sum(F.col(c).isNull().cast("long")).cast("long").alias("n_nulls"),
                F.countDistinct(F.col(c)).cast("long").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_str"),
                F.max(F.col(c)).cast("string").alias("max_str"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    return reduce(DataFrame.unionAll, parts)


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """Pairwise content overlap between corpus sources, estimated from
    per-source MinHash signatures — the "which of my 200 crawl dumps are
    re-scrapes of each other" question that decides a training mixture.

    An exact answer intersects per-source shingle SETS — a shuffle of
    every distinct shingle keyed by source, quadratic joins between the
    big sets. The sketch answer: minhash each source's shingle union
    down to `num_hashes` longs (one explode + map-side-combined min-agg,
    identical shape to doc-level `minhash_signatures` but keyed by
    source), then compare signatures pairwise. The pair join touches
    #sources rows of num_hashes longs each — driver-trivial at any
    corpus size; E[matches/num_hashes] = Jaccard(source_a, source_b) by
    the MinHash argument. j < num_hashes <= 64 keeps h1 + j*h2 < 2^54 —
    exact int64 arithmetic both engines reproduce.

    Output: (source_a, source_b, n_sig_matches, est_jaccard) for
    source_a < source_b.
    """
    from dns_log_transformer_spark.operators.caching import persist_tracked
    from dns_log_transformer_spark.operators.dedup import (
        minhash_signatures,
        with_shingles,
    )

    sh = with_shingles(df, id_col=source_col, text_col=text_col, n=n)
    # one row per source after the min-agg; persisted because both sides
    # of the pair self-join consume it (PLANS.md rule 4)
    sig = persist_tracked(minhash_signatures(sh, id_col=source_col, num_hashes=num_hashes))
    a = sig.select(
        F.col(source_col).alias("source_a"),
        *[F.col(f"m{j}").alias(f"_a{j}") for j in range(num_hashes)],
    )
    b = sig.select(
        F.col(source_col).alias("source_b"),
        *[F.col(f"m{j}").alias(f"_b{j}") for j in range(num_hashes)],
    )
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    matches = reduce(
        lambda x, y: x + y,
        [
            (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("long")
            for j in range(num_hashes)
        ],
    )
    return pairs.select(
        "source_a",
        "source_b",
        matches.alias("n_sig_matches"),
        F.round(matches / num_hashes, 4).alias("est_jaccard"),
    )


def observed_write(
    df: DataFrame,
    keep: "F.Column",
    metrics: dict[str, "F.Column"],
) -> DataFrame:
    """Run a filter-and-land pipeline with observability metrics riding
    the SAME action (``df.observe`` / ``pyspark.sql.Observation``) —
    the zero-extra-scan monitoring surface a 100 TB ingest needs: the
    counters a separate audit query would cost a full second scan to
    compute are collected as a side effect of the one write that was
    happening anyway.

    ``metrics`` are aggregate expressions evaluated over the PRE-filter
    stream (the observe node sits below the keep-filter, so rejected
    rows are still counted); the kept rows land in the ``noop`` sink
    (the scale stand-in for the real parquet/stream sink). Returns the
    observed metrics as a driver-built (metric, value) DataFrame —
    bounded at len(metrics) rows.

    Reference analog: none — the reference counts rejects in process
    memory per request (app/app.py:255-263); this is the distributed
    equivalent where the counters survive executor parallelism.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    observed.filter(keep).write.format("noop").mode("overwrite").save()
    got = obs.get  # blocks until the action above has populated it
    spark = df.sparkSession
    # SUM over zero rows observes as null — report empty-input counters
    # as 0 (the empty-pipeline contract: run clean, count nothing)
    return spark.createDataFrame(
        [(k, 0 if got[k] is None else int(got[k])) for k in metrics],
        "metric string, value long",
    )
