"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Design for 100 TB:
- every algorithm is joins + aggregations over shuffle keys (content
  hashes, shingles, LSH band keys, SimHash byte-bands) — never an O(n^2)
  cross join and never a driver-side collect;
- hot shingles (stopword trigrams at corpus scale) are document-frequency
  capped before the pair join — the standard skew guard;
- hash functions are md5-based so the DuckDB oracle reproduces signatures
  bit-for-bit (xxhash64 would be faster JVM-side; md5 keeps the
  correctness gate engine-independent; swap via HASH_FN for prod).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dns_log_transformer_spark.operators.text import normalized, tokens

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group rows by normalized-content hash. Output one row per distinct
    content: (fingerprint, n_docs, keep_id = min id). Exact dedup = join
    back on keep_id, or `dropDuplicates` when provenance isn't needed."""
    fp = F.md5(F.encode(normalized(F.col(text_col)), "UTF-8"))
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


# ---------------------------------------------------------------------------
# Shingling (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (n=3). Fewer than n tokens -> empty
    array (guards sequence() against negative ranges)."""
    toks = tokens(text)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def with_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col), shingles(F.col(text_col), n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact pairwise over an inverted shingle index)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    df_cap: int = 100,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via inverted index:

    shingle-explode -> document-frequency cap (drop shingles in > df_cap
    docs: they contribute little to Jaccard but dominate join fan-out —
    the skew guard) -> self-join on shingle -> count common -> Jaccard
    from |A|,|B|,|A∩B|. One shuffle on shingle, one on the pair key.
    """
    sh = with_shingles(df, id_col, text_col, n)
    posting = sh.select(id_col, "n_shingles", F.explode("shingles").alias("shingle"))
    rare = (
        posting.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    posting = posting.join(rare, "shingle")
    a = posting.select(
        F.col("shingle"),
        F.col(id_col).alias("doc_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b = posting.select(
        F.col("shingle"),
        F.col(id_col).alias("doc_b"),
        F.col("n_shingles").alias("n_b"),
    )
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

NUM_HASHES = 12
NUM_BANDS = 4  # 4 bands x 3 rows: candidate threshold ~ (1/4)^(1/3) ~ 0.63


def minhash_signature(shingle_col: Column, num_hashes: int = NUM_HASHES) -> Column:
    """Array of minhash values: element j = min over shingles of
    md5('<j>|' || shingle) (lexicographic min of hex = min of the 128-bit
    value; md5 keeps Spark and DuckDB signatures identical)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col,
                    lambda s, j=j: F.md5(F.encode(F.concat(F.lit(f"{j}|"), s), "UTF-8")),
                )
            )
            for j in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle -> signature -> band buckets ->
    candidate pairs (equi-join on band key — the LSH trick that replaces
    the O(n^2) comparison) -> verify exact Jaccard on the candidates only.

    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    rows = num_hashes // num_bands
    sh = with_shingles(df, id_col, text_col, n).filter(F.col("n_shingles") > 0)
    sig = sh.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.concat_ws(
                    "", *[F.col("sig")[k * rows + r] for r in range(rows)]
                ).alias("key"),
            )
            for k in range(num_bands)
        ]
    )
    bucketed = sig.select(id_col, "shingles", F.explode(bands).alias("b")).select(
        id_col, "shingles", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    left = bucketed.select(
        F.col("band"), F.col("key"),
        F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"),
    )
    right = bucketed.select(
        F.col("band"), F.col("key"),
        F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"),
    )
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over distinct tokens: bit b of md5(token)'s first 8
    hex chars votes +1/-1; the sign of each bit's vote sum becomes the
    fingerprint bit. Explode + one wide aggregation — fully JVM-side.

    Output: (id_col, simhash) with simhash a non-negative 32-bit value in
    a long. Near-dup candidates = pairs within small Hamming distance; see
    simhash_pairs for the banded join.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    h = F.md5(F.encode(F.col("tok"), "UTF-8"))
    # hex char k (1-indexed) -> nibble value via position in the alphabet
    votes = toks.select(
        F.col(id_col),
        *[
            (
                F.shiftright(
                    F.instr(F.lit("0123456789abcdef"), F.substring(h, 1 + bit // 4, 1))
                    - 1,
                    bit % 4,
                ).bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias(f"v{bit}")
            for bit in range(SIMHASH_BITS)
        ],
    )
    agg = votes.groupBy(id_col).agg(
        *[F.sum(f"v{bit}").alias(f"s{bit}") for bit in range(SIMHASH_BITS)]
    )
    packed = None
    for bit in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{bit}") > 0, F.lit(1 << bit).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = term if packed is None else packed + term
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming (< 4).

    Scalable shape: split the 32-bit hash into 4 bytes; any pair within
    Hamming 3 must agree on >= 1 whole byte (pigeonhole), so an equi-join
    per byte-band finds all such pairs without a cross join.
    """
    sh = simhash(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright(F.col("simhash"), 8 * k).bitwiseAND(F.lit(255)).alias("key"),
            )
            for k in range(4)
        ]
    )
    bucketed = sh.select(id_col, "simhash", F.explode(bands).alias("b")).select(
        id_col, "simhash", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    left = bucketed.select("band", "key", F.col(id_col).alias("doc_a"), F.col("simhash").alias("h_a"))
    right = bucketed.select("band", "key", F.col(id_col).alias("doc_b"), F.col("simhash").alias("h_b"))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
