"""Count-min sketch: fixed-size frequency estimation over token streams.

The sketch answer to "what are the hot tokens in 100 TB of text" when an
exact groupBy(token) would shuffle one row per distinct token: a d x w
counter grid (depth x width, here 4 x 64 = 256 cells) whose size is FIXED
regardless of corpus size. Each token instance increments one counter per
row (d md5-salted hashes); a token's estimate is the MIN over its d
counters — always >= the true count (collisions only add), with error
bounded by total_count/w per the standard CMS analysis (Cormode &
Muthukrishnan 2005).

Scale shape: the counter build is one explode + map-side-combined
aggregation into <= d*w rows — the shuffle payload is the GRID, not the
vocabulary. Probing broadcasts the grid (d*w rows by construction) and
equi-joins candidates against it; no driver-side state beyond nothing.

Hashes are md5-based so the DuckDB oracle reproduces the exact grid and
estimates bit-for-bit (same discipline as the dedup family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dns_log_transformer_spark.operators.text import rebalance_for_fanout, tokens

CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_hash(tok: Column, j: int, width: int) -> Column:
    """Row-j counter column for a token: first 32 md5 bits of 'j:tok',
    mod width. Salting with the row index makes the d hash functions
    independent draws from the same family."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), tok)), 1, 8), 16, 10
    ).cast("long")
    return (h % width).cast("int")


def cms_counters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the (j, h, c) counter grid from the token stream.

    One explode to token instances, one explode to the d (row, bucket)
    pairs, one aggregation: partial counts combine map-side into at most
    depth*width rows per task, so the exchange carries the grid, never
    the stream."""
    toks = rebalance_for_fanout(df.select(F.col(text_col))).select(
        F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    jh = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_hash(F.col("_tok"), j, width).alias("h")
            )
            for j in range(depth)
        ]
    )
    return (
        toks.select(F.explode(jh).alias("_jh"))
        .select(F.col("_jh.j").alias("j"), F.col("_jh.h").alias("h"))
        .groupBy("j", "h")
        .agg(F.count("*").alias("c"))
    )


def cms_topk(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Top-k tokens by count-min estimate: distinct candidate tokens
    probe the broadcast grid (d rows each), estimate = min over the d
    counters, rank by (est desc, tok asc).

    The candidate set here is the corpus vocabulary (exact at fixture
    scale); at 100 TB candidates come from a cheap pre-filter (e.g. a
    sampled vocabulary) and the sketch prices them without an exact
    count — the grid's size, and therefore the shuffle and broadcast
    cost, never grows with the corpus.

    Output: (tok, est) — est is a CMS upper bound on the true count
    (tests/test_sketches.py pins est >= true per token).
    """
    counters = cms_counters(df, text_col, depth, width)
    cand = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok")).distinct()
    )
    probes = cand.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_hash(F.col("tok"), j, width).alias("h"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_jh"),
    ).select("tok", F.col("_jh.j").alias("j"), F.col("_jh.h").alias("h"))
    est = (
        probes.join(F.broadcast(counters), ["j", "h"])
        .groupBy("tok")
        .agg(F.min("c").alias("est"))
    )
    return est.orderBy(F.desc("est"), F.asc("tok")).limit(k)
