"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention (the lakehouse-standard shape for image/audio/video at scale):
a row carries ``blob: binary`` plus lightweight typed metadata columns;
heavy decode/feature work runs in Arrow-batched ``mapInPandas`` so bytes
stream through Python in columnar batches, never row-at-a-time.

The decode step itself is STUBBED in this environment (no PIL/ffmpeg in
the container): ``decode_image_meta`` raises NotImplementedError unless a
decoder is injected, and ``fake_image_meta`` provides the deterministic
stand-in used by tests/oracle — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Output schema of the image-metadata extractor.
IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, channels int"
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column as ``blob``.
    (Real pipelines read the bytes from object storage / parquet binary.)"""
    return df.withColumn("blob", F.encode(F.col(text_col), "UTF-8"))


def fake_image_meta(blob: bytes, doc_id: int) -> tuple[int, int, int]:
    """Deterministic stand-in for an image header decode:
    width = n_bytes % 640, height = doc_id % 480, channels = 3."""
    return (len(blob) % 640, doc_id % 480, 3)


def image_meta(
    df: DataFrame,
    decoder: Callable[[bytes, int], tuple[int, int, int]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Extract per-image metadata from binary payloads via mapInPandas.

    ``decoder(blob, id) -> (width, height, channels)``; defaults to the
    deterministic fake. Passing a real decoder (e.g. PIL-based) is the
    production path:

        def pil_decoder(blob, _id):
            raise NotImplementedError("PIL not available in this container")
    """
    dec = decoder or fake_image_meta

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [dec(b, i) for b, i in zip(pdf["blob"], pdf[id_col])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["blob"].map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in meta], dtype="int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="int32"),
                    "channels": pd.Series([m[2] for m in meta], dtype="int32"),
                }
            )

    blobs = df if "blob" in df.columns else attach_blob(df)
    return blobs.select(id_col, "blob").mapInPandas(extract, IMAGE_META_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, resized binary"


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize binary image payloads via mapInPandas (the standard
    preprocess step before feature extraction). The pixel work is stubbed
    — no PIL/opencv in this container — with a deterministic byte
    down-sample standing in; inject ``resizer(blob, w, h) -> bytes`` for
    the production decode-resize-reencode:

        def pil_resizer(blob, w, h):
            raise NotImplementedError("PIL not available in this container")

    The Spark-side contract (binary in/out through Arrow, batch shape,
    schema) is real and tested either way.
    """
    w, h = target

    def fake_resize(blob: bytes, tw: int, th: int) -> bytes:
        budget = max(1, (tw * th) // 64)
        step = max(1, len(blob) // budget)
        return blob[::step][:budget]

    rz = resizer or fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series([w] * len(pdf), dtype="int32"),
                    "height": pd.Series([h] * len(pdf), dtype="int32"),
                    "resized": [rz(b, w, h) for b in pdf["blob"]],
                }
            )

    blobs = df if "blob" in df.columns else attach_blob(df)
    return blobs.select(id_col, "blob").mapInPandas(run, RESIZE_SCHEMA)


#: Frame-sampling: pick n byte offsets per payload (the video analog —
#: real frame extraction needs ffmpeg; offsets make the fan-out testable).
FRAME_SCHEMA = "doc_id bigint, frame_idx int, byte_offset bigint"


def frame_offsets(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """1 -> n_frames fan-out with deterministic offsets i*len/n — pure
    column ops (no UDF): the explode pattern every frame-sampler shares."""
    blobs = df if "blob" in df.columns else attach_blob(df)
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return (
        blobs.select(
            F.col(id_col).alias("doc_id"),
            F.octet_length("blob").cast("long").alias("n_bytes"),
            F.explode(idx).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.floor(F.col("frame_idx") * F.col("n_bytes") / n_frames)
            .cast("long")
            .alias("byte_offset"),
        )
    )


#: Output schema of the Arrow-native digest pass (default id column).
BLOB_DIGEST_SCHEMA = "doc_id bigint, n_bytes bigint, digest string"


def _blob_digest_schema(id_col: str) -> str:
    return f"{id_col} bigint, n_bytes bigint, digest string"


def blob_digest(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload md5 + byte length via ``mapInArrow`` — the zero-copy
    Arrow RecordBatch surface (vs mapInPandas' pandas conversion): byte
    lengths come from ``pyarrow.compute`` without touching Python
    objects; only the digest itself walks values (hashing is inherently
    per-value, batch-amortized). The content-addressing pass a multimodal
    lakehouse runs at ingest (dedup key / integrity check).
    """
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    blobs = df if "blob" in df.columns else attach_blob(df)

    def digest(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            blob = batch.column(batch.schema.get_field_index("blob"))
            ids = batch.column(batch.schema.get_field_index(id_col))
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pc.binary_length(blob).cast(pa.int64()),
                    pa.array(
                        [
                            None if v is None else hashlib.md5(v).hexdigest()
                            for v in blob.to_pylist()
                        ],
                        pa.string(),
                    ),
                ],
                names=[id_col, "n_bytes", "digest"],
            )

    return blobs.select(F.col(id_col), "blob").mapInArrow(
        digest, _blob_digest_schema(id_col)
    )


#: Perceptual-hash near-dup: 64-bit aHash over the (stubbed) decoded
#: thumbnail, banded for an exact Hamming<=3 pair join.
PHASH_SCHEMA = "doc_id bigint, b0 int, b1 int, b2 int, b3 int"


def fake_pixels(blob: bytes) -> list[int]:
    """Deterministic stand-in for decode+grayscale+8x8 downsample: 64
    'pixel' intensities (0-15) sampled at evenly-spaced character
    positions of the payload (nearest-neighbor downsample of the byte
    stream). LOCALITY-PRESERVING like a real thumbnail — a small edit
    to the payload perturbs few pixels, so near-identical payloads get
    near-identical hashes (an md5-based stub would randomize every bit
    and make perceptual matching vacuous). A real pipeline injects
    actual pixel averaging; everything downstream (aHash, banding,
    pair join) is unchanged."""
    s = blob.decode("utf-8", errors="replace")
    n = len(s)
    if n == 0:
        return [0] * 64
    return [ord(s[i * n // 64]) % 16 for i in range(64)]


def phash64(
    df: DataFrame,
    pixels: Callable[[bytes], list[int]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit average-hash (aHash) per binary payload, emitted as four
    16-bit band integers (b0..b3) — the form the banded pair join needs.
    bit i of the hash = 1 iff pixel_i is above the image mean; the
    compare is exact-integer (pixel*64 > sum) so both engines agree on
    ties. Arrow-batched mapInPandas; inject ``pixels(blob)`` to swap in
    a real decoder."""
    px = pixels or fake_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bands: list[list[int]] = [[], [], [], []]
            for blob in pdf["blob"]:
                p = px(blob)
                total = sum(p)
                for k in range(4):
                    v = 0
                    for i in range(16):
                        if p[k * 16 + i] * 64 > total:
                            v |= 1 << i
                    bands[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "b0": pd.Series(bands[0], dtype="int32"),
                    "b1": pd.Series(bands[1], dtype="int32"),
                    "b2": pd.Series(bands[2], dtype="int32"),
                    "b3": pd.Series(bands[3], dtype="int32"),
                }
            )

    blobs = df if "blob" in df.columns else attach_blob(df)
    return blobs.select(F.col(id_col), "blob").mapInPandas(run, PHASH_SCHEMA)


def phash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    bucket_cap: int = 100,
) -> DataFrame:
    """Perceptual near-dup pairs: images whose 64-bit aHashes differ in
    <= max_hamming bits. EXACT via banding + pigeonhole: <= 3 flips
    cannot touch all 4 of the 16-bit bands, so every qualifying pair
    shares at least one band value and the candidate join is an
    equi-join on (band, value) — never all-pairs. Verification sums
    per-band popcounts of the XOR (ints <= 2^16, plain bit_count).

    Shape at scale: identical to SimHash banding (operators/dedup.py) —
    candidate volume is bounded by band-bucket occupancy, and a hot
    (band, key) bucket (web-scale monochrome thumbnails all hash to the
    same bands) is guarded the same way as dedup_text_embedding_lsh:
    buckets holding more than ``bucket_cap`` members are EXCLUDED from
    the candidate join (a per-key window count on the same (band, key)
    the join shuffles on — no extra join, no driver-side key list).
    Recall note for capped buckets: a pair is still found if ANY of its
    <= 4 shared bands stays under the cap; pairs whose every shared
    band is oversized are exact/near-exact-dup territory — route those
    through content-hash dedup (operators/dedup.py) instead.
    """
    from dns_log_transformer_spark.operators.caching import persist_tracked

    # feeds the band explode AND both sides of the verify join
    if not 0 <= max_hamming <= 3:
        # pigeonhole over 4 bands is complete only for <= 3 flips; a
        # larger threshold would silently MISS pairs whose differing
        # bits touch all four bands (use more/narrower bands instead)
        raise ValueError("phash_pairs: max_hamming must be 0..3 (4 bands)")
    hashed = persist_tracked(phash64(df, id_col=id_col))
    bands = (
        hashed.select(
            F.col(id_col),
            F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
                "band", "key"
            ),
        )
        .withColumn(
            "_c", F.count("*").over(Window.partitionBy("band", "key"))
        )
        .filter(F.col("_c") <= bucket_cap)
        .drop("_c")
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    ha = hashed.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    hb = hashed.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"b{k}").alias(f"c{k}") for k in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"c{k}")))
        for k in range(4)
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
