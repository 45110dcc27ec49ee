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


def _meta_columns(pdf: "pd.DataFrame", meta: list, id_col: str) -> dict:
    """Assemble the IMAGE_META_SCHEMA column dict from decoded
    (width, height, channels) tuples — the ONE definition image_meta
    and image_profile share (two live copies are a dtype-divergence
    trap; code-review r10)."""
    return {
        "doc_id": pdf[id_col].astype("int64"),
        "n_bytes": pdf["blob"].map(len).astype("int64"),
        "width": pd.Series([m[0] for m in meta], dtype="int32"),
        "height": pd.Series([m[1] for m in meta], dtype="int32"),
        "channels": pd.Series([m[2] for m in meta], dtype="int32"),
    }


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
            yield pd.DataFrame(_meta_columns(pdf, meta, id_col))

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


def _ahash_band_votes(p: list[int]) -> list[int]:
    """Four 16-bit aHash bands from 64 pixel intensities: bit i of band
    k = 1 iff p[k*16+i]*64 > sum(p) — the exact-integer mean compare
    both engines agree on for ties. The ONE definition phash64 and
    image_profile share (the band values feed the same pair join, so
    two live copies were a silent-divergence trap; code-review r10)."""
    total = sum(p)
    out = []
    for k in range(4):
        v = 0
        for i in range(16):
            if p[k * 16 + i] * 64 > total:
                v |= 1 << i
        out.append(v)
    return out


def _band_columns(pdf: "pd.DataFrame", px, id_col: str) -> dict:
    bands: list[list[int]] = [[], [], [], []]
    for blob in pdf["blob"]:
        for k, v in enumerate(_ahash_band_votes(px(blob))):
            bands[k].append(v)
    return {
        "doc_id": pdf[id_col].astype("int64"),
        **{
            f"b{k}": pd.Series(bands[k], dtype="int32") for k in range(4)
        },
    }


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
            yield pd.DataFrame(_band_columns(pdf, px, id_col))

    blobs = df if "blob" in df.columns else attach_blob(df)
    return blobs.select(F.col(id_col), "blob").mapInPandas(run, PHASH_SCHEMA)


#: Output schema of the combined meta + aHash profile pass.
IMAGE_PROFILE_SCHEMA = IMAGE_META_SCHEMA + ", b0 int, b1 int, b2 int, b3 int"


def image_profile(
    df: DataFrame,
    decoder: Callable[[bytes, int], tuple[int, int, int]] | None = None,
    pixels: Callable[[bytes], list[int]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Header metadata AND the 64-bit average-hash bands in ONE Arrow
    pass over the binary payloads (r10: backs the merged mm_image_meta
    registration — the old image_meta + phash64 pair each paid a full
    mapInPandas scan; a census that wants both should decode once).
    Inject ``decoder``/``pixels`` exactly as in the split operators,
    which remain for callers needing only one half; the meta assembly
    and the band votes are the SAME helpers those operators run, so
    the three surfaces cannot diverge."""
    dec = decoder or fake_image_meta
    px = pixels or fake_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [dec(b, i) for b, i in zip(pdf["blob"], pdf[id_col])]
            cols = _meta_columns(pdf, meta, id_col)
            band_cols = _band_columns(pdf, px, id_col)
            cols.update(
                {k: v for k, v in band_cols.items() if k != "doc_id"}
            )
            yield pd.DataFrame(cols)

    blobs = df if "blob" in df.columns else attach_blob(df)
    return blobs.select(F.col(id_col), "blob").mapInPandas(
        run, IMAGE_PROFILE_SCHEMA
    )


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


# ---------------------------------------------------------------------------
# Byte-level format sniffing + header-parsed dimensions (no decoder needed)
# ---------------------------------------------------------------------------
#
# Unlike the stubbed pixel paths above, these operators are REAL in this
# sandbox: magic-number detection and dimensions-from-header parsing are
# pure byte arithmetic (hex/substring/conv — whole-stage codegen, no
# Python), exactly what a 100 TB ingest census runs before any decode.
# Formats: PNG (IHDR big-endian dims), JPEG (segment walk to SOF0..3),
# GIF (logical-screen little-endian dims), BMP (DIB header little-endian
# dims).

#: JPEG segment-walk depth: real-world headers routinely front-load
#: APP0/JFIF + APP1/EXIF + APP2/ICC + APP13/APP14 + COM + several
#: DQT/DHT/DRI segments before SOF — 12 unrolled steps cover an
#: 11-segment preface (comfortably past the typical camera/Photoshop
#: layout; r9's 5 covered only 4 and silently nulled deep-preface dims,
#: ADVICE r9). The walk is O(depth) shuffle-free projections, so depth
#: is cheap; when it DOES exhaust, the row stays loud — format='jpeg',
#: null dims, dims_parsed=false — and mm_format_census counts it in
#: n_unparsed instead of silently excluding the payload.
JPEG_WALK_STEPS = 12


def _hx_byte(hx, pos):
    """Byte value at 1-indexed byte position ``pos`` of the hex-encoded
    payload column ``hx`` (out-of-range reads 0 via the lpad guard —
    keeps ANSI conv() off empty strings)."""
    return F.conv(
        F.lpad(F.substring(hx, pos * 2 - 1, F.lit(2)), 2, "0"), 16, 10
    ).cast("long")


def _hx_pair(hx, pos):
    """One hex byte-pair at byte position ``pos``, zero-filled when the
    read runs past the payload end (rpad: a missing TRAILING byte reads
    as 0, matching the per-byte lpad-guard semantics)."""
    return F.rpad(F.substring(hx, pos * 2 - 1, F.lit(2)), 2, "0")


def _hx_be16(hx, pos):
    # one substring + one conv instead of per-byte assembly: the walk
    # columns' expression count drove generated-source size past
    # Janino's 64 KB method limit in r11 (see _codegen_barrier); rpad
    # zero-fills past-end reads at the TAIL, same as byte-wise reads
    return F.conv(
        F.rpad(F.substring(hx, pos * 2 - 1, F.lit(4)), 4, "0"), 16, 10
    ).cast("long")


def _hx_be32(hx, pos):
    return F.conv(
        F.rpad(F.substring(hx, pos * 2 - 1, F.lit(8)), 8, "0"), 16, 10
    ).cast("long")


def _hx_le16(hx, pos):
    return F.conv(
        F.concat(_hx_pair(hx, pos + 1), _hx_pair(hx, pos)), 16, 10
    ).cast("long")


def _hx_le32(hx, pos):
    return F.conv(
        F.concat(
            _hx_pair(hx, pos + 3),
            _hx_pair(hx, pos + 2),
            _hx_pair(hx, pos + 1),
            _hx_pair(hx, pos),
        ),
        16,
        10,
    ).cast("long")


def sniff_image_meta(
    df: DataFrame, id_col: str = "doc_id", jpeg_steps: int = JPEG_WALK_STEPS
) -> DataFrame:
    """(id, format, width, height, n_bytes) from raw payload bytes by
    magic-number sniff + per-format header parse — no image library:

    - png: 8-byte signature; dims big-endian 32-bit at IHDR offsets
      17/21 (the IHDR chunk is mandated first by the PNG spec).
    - jpeg: FFD8 SOI, then an unrolled marker-segment walk (each
      non-SOF segment advances by 2 + big-endian length) until a
      SOF0..SOF3 frame header; dims big-endian 16-bit at SOF+5/+7.
    - gif: GIF87a/89a signature; logical-screen dims little-endian
      16-bit at offsets 7/9.
    - bmp: BM signature; DIB dims little-endian 32-bit at 19/23.
    - anything else: format 'unknown', null dims.

    ``dims_parsed`` makes partial parses LOUD: false whenever either
    dim is null (unknown format, walk exhausted before SOF, overflow
    dims routed by try_cast) so a census can report parse coverage
    instead of silently excluding null-dim rows (ADVICE r9).

    All positions are 1-indexed (Spark substring convention). The hex
    payload is materialized ONCE as a top-level projection (PLANS.md
    rule 1) and every per-step walk position/flag is its own projection
    column so codegen subexpression elimination applies; the whole
    operator is joins-free, shuffle-free, UDF-free.
    """
    blobs = df if "blob" in df.columns else attach_blob(df)
    cur = blobs.select(F.col(id_col), "blob").withColumn(
        "_hx", F.hex("blob")
    )
    hx = F.col("_hx")

    fmt = (
        F.when(F.substring(hx, 1, 16) == "89504E470D0A1A0A", "png")
        .when(F.substring(hx, 1, 4) == "FFD8", "jpeg")
        .when(
            F.substring(hx, 1, 12).isin("474946383961", "474946383761"),
            "gif",
        )
        .when(F.substring(hx, 1, 4) == "424D", "bmp")
        .otherwise("unknown")
    )
    cur = cur.withColumn("_fmt", fmt)

    # JPEG marker-segment walk, unrolled: _p{k} is the byte position of
    # the k-th marker, _sof{k} whether it is a frame header. Non-JPEG
    # rows compute harmless garbage that the final CASE never reads.
    cur = cur.withColumn("_p0", F.lit(3).cast("long"))
    for k in range(jpeg_steps):
        p = F.col(f"_p{k}")
        b1 = _hx_byte(hx, p + 1)
        cur = cur.withColumn(
            f"_sof{k}",
            (_hx_byte(hx, p) == 255) & (b1 >= 192) & (b1 <= 195),
        )
        if k + 1 < jpeg_steps:
            cur = cur.withColumn(
                f"_p{k + 1}",
                F.when(F.col(f"_sof{k}"), p).otherwise(
                    p + 2 + _hx_be16(hx, p + 2)
                ),
            )
    jpeg_h = F.coalesce(
        *[
            F.when(F.col(f"_sof{k}"), _hx_be16(hx, F.col(f"_p{k}") + 5))
            for k in range(jpeg_steps)
        ]
    )
    jpeg_w = F.coalesce(
        *[
            F.when(F.col(f"_sof{k}"), _hx_be16(hx, F.col(f"_p{k}") + 7))
            for k in range(jpeg_steps)
        ]
    )

    width = (
        F.when(F.col("_fmt") == "png", _hx_be32(hx, F.lit(17)))
        .when(F.col("_fmt") == "jpeg", jpeg_w)
        .when(F.col("_fmt") == "gif", _hx_le16(hx, F.lit(7)))
        .when(F.col("_fmt") == "bmp", _hx_le32(hx, F.lit(19)))
    )
    height = (
        F.when(F.col("_fmt") == "png", _hx_be32(hx, F.lit(21)))
        .when(F.col("_fmt") == "jpeg", jpeg_h)
        .when(F.col("_fmt") == "gif", _hx_le16(hx, F.lit(9)))
        .when(F.col("_fmt") == "bmp", _hx_le32(hx, F.lit(23)))
    )
    # try_cast, not cast: arbitrary crawled bytes can put >= 2^31 at a
    # dim offset (e.g. a spec-legal top-down BMP stores biHeight as a
    # NEGATIVE two's-complement le32) — ANSI cast would crash the whole
    # census job on one such payload; null dims route it instead
    w_i = width.try_cast("int")
    h_i = height.try_cast("int")
    return cur.select(
        F.col(id_col),
        F.col("_fmt").alias("format"),
        w_i.alias("width"),
        h_i.alias("height"),
        (w_i.isNotNull() & h_i.isNotNull()).alias("dims_parsed"),
        F.octet_length("blob").cast("long").alias("n_bytes"),
    )


def _hex2(c):
    return F.lpad(F.hex(c.cast("bigint")), 2, "0")


def _hex_be16(c):
    return F.lpad(F.hex(c.cast("bigint")), 4, "0")


def _hex_be32(c):
    return F.lpad(F.hex(c.cast("bigint")), 8, "0")


def _hex_le16(c):
    return F.concat(_hex2(c % 256), _hex2(F.floor(c / 256)))


def _hex_le32(c):
    # FULL 4-byte writer since the r11 constants audit (VERDICT r10 #8):
    # the old "<2^16 dims" two-high-bytes-zero shortcut silently
    # truncated larger values — the exact trap that corrupted the first
    # cut of the r10 container fixture — and the full form writes
    # identical bytes for everything the image fixture produces, so
    # there is no truncating writer left for a future fixture edit to
    # trip on
    return F.concat(_hex_le16(c % 65536), _hex_le16(F.floor(c / 65536)))


def synth_image_blob(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> DataFrame:
    """Deterministic spec-true image payloads for the sniff/census path
    (the container has no image libs, so the FIXTURE is synthesized; the
    PARSER above is real): format cycles with ``id % 4`` (png, jpeg,
    gif, bmp), dims derive from the id, payload filler length from
    ``len_col`` — so the DuckDB oracle can state every expected value
    arithmetically while the Spark side must actually parse the bytes
    it built. Headers are format-faithful: PNG signature + IHDR chunk,
    JPEG SOI + variable-length APP0 + COM + SOF0 (so the segment walk
    is exercised, not a fixed offset), GIF89a logical screen, BMP
    BITMAPINFOHEADER.

    Layout constants (mirrored in the mm_format_census oracle):
    width = 16 + id % 240, height = 16 + (id // 4) % 224,
    payload = 10 + len % 100; byte sizes png 29+payload, gif
    10+payload, bmp 26+payload, jpeg 27 + app0(16 + id % 8) +
    com(4 + id % 5) + 4 * (id % 16) + payload.

    JPEG prefaces are DEEP on purpose: id % 16 extra empty COM
    segments sit between the COM and the SOF, so SOF is marker index
    2 + id % 16 (range 2..17). Ids with id % 16 <= 9 parse through the
    12-step walk — pinning depths the r9 walk (5) could not reach —
    while id % 16 >= 10 EXCEEDS the walk and must surface as the loud
    format='jpeg' / null-dims / dims_parsed=false row the census
    counts in n_unparsed; both regimes are stated arithmetically in
    the oracle, so neither a walk bug nor a silent drop can cancel.
    """
    i = F.col(id_col)
    w = (F.lit(16) + i % 240).cast("long")
    h = (F.lit(16) + F.floor(i / 4) % 224).cast("long")
    pl = (F.lit(10) + F.col(len_col) % 100).cast("int")
    filler = F.repeat(F.lit("00"), pl)
    l0 = (F.lit(16) + i % 8).cast("long")  # APP0 length (incl. itself)
    l1 = (F.lit(4) + i % 5).cast("long")  # COM length (incl. itself)
    n_extra = (i % 16).cast("int")  # extra 4-byte empty COM segments

    png = F.concat(
        F.lit("89504E470D0A1A0A"),  # signature
        F.lit("0000000D49484452"),  # IHDR length 13 + type
        _hex_be32(w),
        _hex_be32(h),
        F.lit("0806000000"),  # bit depth 8, RGBA, default methods
        filler,
    )
    jpeg = F.concat(
        F.lit("FFD8"),  # SOI
        F.lit("FFE0"),
        _hex_be16(l0),
        F.repeat(F.lit("00"), (l0 - 2).cast("int")),  # APP0 body
        F.lit("FFFE"),
        _hex_be16(l1),
        F.repeat(F.lit("00"), (l1 - 2).cast("int")),  # COM body
        F.repeat(F.lit("FFFE0002"), n_extra),  # deep preface (see above)
        F.lit("FFC0"),
        F.lit("0011"),  # SOF0, length 17
        F.lit("08"),  # precision
        _hex_be16(h),
        _hex_be16(w),
        F.lit("03"),  # 3 components
        F.lit("011100021100031100"),  # component specs
        F.lit("FFD9"),  # EOI
        filler,
    )
    gif = F.concat(
        F.lit("474946383961"),  # GIF89a
        _hex_le16(w),
        _hex_le16(h),
        filler,
    )
    bmp = F.concat(
        F.lit("424D"),  # BM
        F.lit("00000000"),  # file size (unused by the parser)
        F.lit("00000000"),  # reserved
        F.lit("36000000"),  # pixel-data offset
        F.lit("28000000"),  # DIB header size 40
        _hex_le32(w),
        _hex_le32(h),
        filler,
    )
    blob_hex = (
        F.when(i % 4 == 0, png)
        .when(i % 4 == 1, jpeg)
        .when(i % 4 == 2, gif)
        .otherwise(bmp)
    )
    return df.select(F.col(id_col), F.unhex(blob_hex).alias("blob"))


# ---------------------------------------------------------------------------
# Audio/video container sniffing: WAV/RIFF, WebP (VP8/VP8L/VP8X), ISO-BMFF
# ---------------------------------------------------------------------------
#
# The mm_format_census technique (VERDICT r9 #4) extended past images: a
# multimodal training corpus also carries audio (WAV) and video (MP4)
# payloads plus WebP, and the same pure-codegen byte arithmetic parses
# their container headers — RIFF chunk walk for WAV, the three WebP
# bitstream variants' distinct dimension encodings, and a top-level
# ISO-BMFF box walk (the JPEG-marker-walk pattern generalized).

#: RIFF chunk-walk depth for WAV: 'fmt ' is usually the first chunk but
#: JUNK/LIST/bext prefaces are common in broadcast WAVs; 6 unrolled
#: steps cover 4 preface chunks AND still reach the 'data' chunk after
#: 'fmt ' (the r11 descent reads the data-chunk size for duration, so
#: the walk no longer freezes at 'fmt ').
WAV_WALK_STEPS = 6

#: moov child-box walk depth: mvhd is universally muxed first, then
#: trak (video) / trak (audio) / udta — 4 steps cover the layouts the
#: census descends into. Like every walk here, exhaustion is LOUD:
#: duration/dims stay NULL, never a guess.
MOOV_WALK_STEPS = 4

#: Top-level ISO-BMFF box-walk depth: ftyp + a handful of free/skip/
#: meta boxes before moov/mdat in real muxers; 8 covers 7 intermediate
#: boxes. Like the JPEG walk, exhaustion is LOUD: boxes past the walk
#: are simply not counted and the structural flag stays 0 unless both
#: moov and mdat were seen inside it.
MP4_WALK_STEPS = 8

#: Codec-descent walk depths (VERDICT r11 #6), one per level of the
#: trak -> mdia -> minf -> stbl -> stsd chain. Real muxer layouts:
#: trak children are tkhd [tref/edts] mdia (mdia at index <= 2);
#: mdia children are mdhd hdlr minf (minf at index 2 exactly);
#: minf children are vmhd/smhd [dinf] stbl (stbl at index <= 2);
#: stsd is stbl's FIRST child universally (2 gives one slot of slack).
#: All four are real parameters of sniff_container_meta — a deeper
#: corpus gets a knob, not a code change (the moov_steps discipline).
TRAK_WALK_STEPS = 3
MDIA_WALK_STEPS = 3
MINF_WALK_STEPS = 3
STBL_WALK_STEPS = 2


def _hx_str4(hx, pos):
    """Hex of the 4 bytes at 1-indexed byte position ``pos``."""
    return F.substring(hx, pos * 2 - 1, F.lit(8))


def _codegen_barrier(df: DataFrame, tag: str) -> DataFrame:
    """1:1 ``explode(array(1))`` Generate that stops CollapseProject
    from fusing adjacent walk stages into one Project: the full r11
    container-walk column set in a single Project generated a
    doConsume past Janino's 64 KB method limit, and the WHOLE stage
    silently fell back to interpreted execution (ERROR CodeGenerator;
    the census sweep row ballooned to ~20 s). Splitting the stages
    keeps every generated method small enough to compile. Each stage's
    walk positions/flags are already materialized as columns, so
    nothing is recomputed across the barrier, and the Generate itself
    is whole-stage-codegen'd and row-neutral.

    The int-1 ``tag`` column is deliberately KEPT (r12): every Dataset
    transformation triggers an eager analyzer pass over the whole
    accumulated plan, so the old ``.drop(tag)`` doubled the barrier's
    DRIVER-side cost on the deep census plans (~80 ms per op at 60+
    ops) for zero benefit — callers end in an explicit select that
    never carries the tags."""
    return df.withColumn(tag, F.explode(F.array(F.lit(1))))


def _idiv(num, den):
    """Exact nonnegative-long integer division as columns: num - num%den
    is an exact multiple of den, and an IEEE double division whose
    operands and quotient are all exactly-representable integers
    (< 2^53 here: num <= 2^32 * 10^6 ~ 4.3e15) returns the quotient
    EXACTLY, so the cast back to long is lossless — unlike
    floor(num/den), whose 0.5-ulp rounding at ~1e15 magnitudes can
    cross an integer boundary on hostile header values."""
    return ((num - num % den) / den).cast("long")


# --- SQL-string expression builders for the container walks (r16,
# DRIVER-side build cost: VERDICT r15 #4 / PLANS.md rule 9).
# The unrolled container walks build THOUSANDS of tiny Column ops, and
# EVERY Column operator call is a py4j socket roundtrip (~0.45 ms):
# profiled at 10.6k roundtrips = ~4 s of driver build time per census
# plan (bench passes rebuild plans, so that is real wall per pass in
# the sweep's build+exec row). These helpers build the SAME expressions
# as the ``_hx_*`` Column helpers above but as SQL STRINGS, applied
# with one ``F.expr`` per output column — the SQL parser constructs the
# identical Catalyst operators JVM-side, cutting the roundtrip count
# ~40x. Positions are SQL sub-expressions (a column name or
# parenthesized arithmetic); every helper parenthesizes its inputs.
# ``_hx``/``_nb`` are the hex-payload / octet-length columns
# materialized at the head of ``sniff_container_meta``.

def _sx_str4(pos: str) -> str:
    """Hex of the 4 bytes at 1-indexed byte position ``pos``."""
    return f"substring(_hx, ({pos}) * 2 - 1, 8)"


def _sx_byte(pos: str) -> str:
    return (
        f"CAST(conv(lpad(substring(_hx, ({pos}) * 2 - 1, 2), 2, '0'),"
        " 16, 10) AS BIGINT)"
    )


def _sx_pair(pos: str) -> str:
    return f"rpad(substring(_hx, ({pos}) * 2 - 1, 2), 2, '0')"


def _sx_be16(pos: str) -> str:
    return (
        f"CAST(conv(rpad(substring(_hx, ({pos}) * 2 - 1, 4), 4, '0'),"
        " 16, 10) AS BIGINT)"
    )


def _sx_be32(pos: str) -> str:
    return (
        f"CAST(conv(rpad(substring(_hx, ({pos}) * 2 - 1, 8), 8, '0'),"
        " 16, 10) AS BIGINT)"
    )


def _sx_le16(pos: str) -> str:
    return (
        f"CAST(conv(concat({_sx_pair(f'({pos}) + 1')}, {_sx_pair(pos)}),"
        " 16, 10) AS BIGINT)"
    )


def _sx_le32(pos: str) -> str:
    return (
        "CAST(conv(concat("
        f"{_sx_pair(f'({pos}) + 3')}, {_sx_pair(f'({pos}) + 2')}, "
        f"{_sx_pair(f'({pos}) + 1')}, {_sx_pair(pos)}), 16, 10) AS BIGINT)"
    )


def _sx_idiv(num: str, den: str) -> str:
    """String form of :func:`_idiv` (same exact-integer discipline)."""
    return f"CAST(((({num}) - (({num}) % ({den}))) / ({den})) AS BIGINT)"


def _sx_stage(cur, cols: dict[str, str]):
    """Apply one walk-stage projection from SQL-string expressions —
    ONE py4j roundtrip per column plus one Dataset op, instead of one
    roundtrip per Column operator. Uses ``selectExpr("*", ...)`` so a
    later entry may reference an earlier entry's alias LATERALLY
    (spark.sql.lateralColumnAlias, on by default since 3.4): chained
    walk steps merge into one projection, halving the eager analyzer
    passes a deep census plan pays per Dataset op (rule 9b)."""
    return cur.selectExpr("*", *(f"{v} AS {k}" for k, v in cols.items()))


def _box_child_walk(cur, prefix, parent_pos, parent_size, steps, pre=None):
    """Unrolled walk over the CHILD boxes of a parent at 1-indexed byte
    position ``parent_pos`` with resolved byte size ``parent_size``:
    materializes ``_<prefix>p{k}`` (child box position),
    ``_<prefix>ok{k}`` (header fits inside the parent, sane size) and
    ``_<prefix>ty{k}`` (child fourcc hex) as top-level columns.

    Children use the compact size form only (``size >= 8``) — neither
    largesize nor to-EOF occurs below top level in the layouts the
    census descends (the moov-walk contract since r11); anything else
    stops the walk and downstream reads stay loud-NULL. A NULL parent
    (not found upstream) walks NULL positions into NULL types. Clamps
    mirror the top-level walk: a garbage child size cannot push a
    position past ``n_bytes + 8`` (substring int-overflow guard), and
    an intra-walk ``_codegen_barrier`` every 2 steps keeps each
    generated method under Janino's 64 KB limit (CLAUDE.md rule 10)."""
    # ONE withColumns projection per walk step (r12): a withColumn
    # CHAIN makes the analyzer re-walk the whole accumulated plan per
    # call — at ~90 projections the census paid ~10 s of DRIVER time
    # per plan build. cok is inlined into the next-position expression
    # (cheap comparisons; the expensive conv(substring) reads stay
    # top-level aliases for codegen subexpression elimination).
    # Expressions are SQL strings since r16 (see the _sx_* helpers:
    # the py4j-roundtrip cost of building them as Columns dominated
    # the census's driver build). ``parent_pos``/``parent_size`` are
    # SQL sub-expressions; the strings read the materialized
    # ``_hx``/``_nb`` columns directly.
    # one _sx_stage per barrier-bounded PAIR of steps (r16): the pair's
    # second step references the first step's position LATERALLY, so
    # both resolve in a single analyzer pass; ``pre`` lets a caller
    # fold its parent-found projection into the same pass.
    cols: dict[str, str] = dict(pre or {})
    cols[f"_{prefix}end"] = f"least(({parent_pos}) + ({parent_size}) - 1, _nb)"
    cols[f"_{prefix}p0"] = f"({parent_pos}) + 8"
    for k in range(steps):
        p = f"_{prefix}p{k}"
        csz = _sx_be32(p)
        cok = f"(({p}) + 7 <= _{prefix}end) AND (({csz}) >= 8)"
        cols[f"_{prefix}ok{k}"] = cok
        cols[f"_{prefix}ty{k}"] = (
            f"CASE WHEN {cok} THEN {_sx_str4(f'({p}) + 4')} END"
        )
        if k + 1 < steps:
            cols[f"_{prefix}p{k + 1}"] = (
                f"CASE WHEN {cok} THEN least(({p}) + ({csz}), _nb + 8) "
                "ELSE _nb + 8 END"
            )
        if k % 2 == 1 or k == steps - 1:
            cur = _sx_stage(cur, cols)
            cols = {}
        if k % 2 == 1:  # intra-walk barrier: ~2 steps per codegen method
            cur = _codegen_barrier(cur, f"_{prefix}bar{k}")
    return cur


def _box_child_found(prefix: str, steps: int, fourcc_hex: str) -> str:
    """SQL expression for the position of the first walked child whose
    fourcc matches (NULL = not found within the walk — exhaustion stays
    loud)."""
    return "COALESCE(" + ", ".join(
        f"CASE WHEN _{prefix}ty{k} = '{fourcc_hex}' THEN _{prefix}p{k} END"
        for k in range(steps)
    ) + ")"


def sniff_container_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    wav_steps: int = WAV_WALK_STEPS,
    mp4_steps: int = MP4_WALK_STEPS,
    moov_steps: int = MOOV_WALK_STEPS,
    trak_steps: int = TRAK_WALK_STEPS,
    mdia_steps: int = MDIA_WALK_STEPS,
    minf_steps: int = MINF_WALK_STEPS,
    stbl_steps: int = STBL_WALK_STEPS,
) -> DataFrame:
    """(id, container, d1, d2, parsed, n_bytes, dur_us, v_w, v_h,
    codec) from raw payload bytes — magic-number sniff + per-container
    header parse, no media library:

    - wav: 'RIFF' + 'WAVE', then a RIFF chunk walk (id/size/body, sizes
      little-endian, bodies even-padded) to the 'fmt ' chunk (gated on
      the full 16-byte PCM body fitting — a payload truncated inside
      fmt stays the loud null row, ADVICE r10) and ON to the 'data'
      chunk; d1 = sample rate (le32 at fmt+12), d2 = channels (le16 at
      fmt+10), dur_us = declared data size * 1e6 / byte rate (le32 at
      fmt+16).
    - webp: 'RIFF' + 'WEBP', then the variant fourcc — the three
      bitstream flavors encode dimensions three different ways:
      'VP8 ' (lossy: 14-bit le dims after the 9D012A sync code),
      'VP8L' (lossless: width-1/height-1 packed into one le32 after the
      0x2F signature), 'VP8X' (extended: 24-bit le canvas dims minus
      one). d1 = width, d2 = height.
    - mp4: ISO-BMFF starting with an 'ftyp' box (size be32 + fourcc per
      box) — a top-level box walk counts boxes and checks structural
      completeness; d1 = boxes seen within the walk, d2 = 1 iff BOTH
      'moov' and 'mdat' were seen (a truncated upload misses one — the
      quiet-data-loss class the census exists to surface). One level
      DOWN (VERDICT r10 #5), a moov-child walk reads mvhd (v0/v1) for
      dur_us = duration * 1e6 / timescale and each trak's leading tkhd
      (v0/v1) for v_w/v_h — the 16.16 fixed-point canvas dims, MAX
      across traks (the audio trak reports zeros). FOUR levels further
      (VERDICT r11 #6), the codec descent walks the first trak's
      mdia -> minf -> stbl -> stsd chain and decodes the leading
      sample-entry format fourcc as ``codec`` (avc1/hvc1/mp4a/av01/…),
      gated on entry_count >= 1, a sample-entry-sized first entry, and
      a printable fourcc.
    - anything else: container 'unknown', null d1/d2.

    dur_us/v_w/v_h are NULL wherever the container doesn't carry them
    (webp/unknown; wav dims) or the walk missed them — ``parsed``
    deliberately keeps its original d1/d2-only meaning so the census's
    coverage metric is stable across rounds.

    ``parsed`` mirrors sniff_image_meta's dims_parsed: false whenever
    either metric is null, so the census reports coverage instead of
    silently excluding rows. Same discipline as the image sniffer: hex
    payload materialized once, every walk position a top-level
    projection column, joins-free, shuffle-free, UDF-free; try_cast
    routes hostile values to NULL instead of an ANSI crash.
    """
    blobs = df if "blob" in df.columns else attach_blob(df)
    # Expressions below are SQL STRINGS applied via _sx_stage (r16):
    # building this walk as Column ops cost ~10.6k py4j roundtrips
    # (~4 s driver time) per plan build — see the _sx_* helper block.
    # _hx / _nb are the two inputs every string expression reads.
    cur = blobs.select(F.col(id_col), "blob").withColumns(
        {
            "_hx": F.hex("blob"),
            "_nb": F.octet_length("blob").cast("long"),
        }
    )
    cur = _sx_stage(
        cur,
        {
            "_ctr": (
                "CASE WHEN substring(_hx, 1, 8) = '52494646'"  # 'RIFF'
                " AND substring(_hx, 17, 8) = '57415645' THEN 'wav'"
                " WHEN substring(_hx, 1, 8) = '52494646'"
                " AND substring(_hx, 17, 8) = '57454250' THEN 'webp'"
                " WHEN substring(_hx, 9, 8) = '66747970' THEN 'mp4'"  # ftyp
                " ELSE 'unknown' END"
            ),
        },
    )

    # WAV RIFF chunk walk: _wp{k} = byte position of the k-th chunk id
    # (chunks start at 13); _wfmt{k} = that chunk is 'fmt ' AND its full
    # 16-byte PCM body fits (bytes p+8..p+23 — rate, channels AND byte
    # rate are read from it; without the fit gate a payload truncated
    # inside fmt parses past-end lpad-zero bytes as rate=0/channels=0
    # with parsed=true, the confidently-wrong class, ADVICE r10).
    # Bodies are even-padded per spec (odd sizes advance one extra
    # byte); the walk does NOT freeze at 'fmt ' — it continues to the
    # 'data' chunk, whose declared size gives the duration.
    # start position GATED on the container (r12): a NULL start
    # short-circuits every downstream read in codegen (null-check
    # before the substring/conv work), so the wav walk costs nothing
    # on the ~3/4 of rows that aren't wav — same outputs (the final
    # CASE never reads wav columns elsewhere), ~free rows elsewhere
    # one projection per barrier-bounded PAIR of steps (r16 lateral
    # aliases, see _sx_stage): the analyzer re-walks the accumulated
    # plan on every Dataset op, so fewer/wider ops cost less driver
    # time on deep walks
    wcols = {"_wp0": "CAST(CASE WHEN _ctr = 'wav' THEN 13 END AS BIGINT)"}
    for k in range(wav_steps):
        p = f"_wp{k}"
        wcols[f"_wfmt{k}"] = (  # 'fmt '
            f"({_sx_str4(p)} = '666D7420') AND (({p}) + 23 <= _nb)"
        )
        wcols[f"_wdat{k}"] = f"{_sx_str4(p)} = '64617461'"  # 'data'
        if k + 1 < wav_steps:
            sz = _sx_le32(f"({p}) + 4")
            # clamp: on non-RIFF bytes the le32 "size" is garbage up to
            # 2^32-1, and an unclamped position overflows substring's
            # int argument (ANSI CAST_OVERFLOW kills the job); past-end
            # positions all behave identically (lpad-guarded zero reads)
            wcols[f"_wp{k + 1}"] = (
                f"least(({p}) + 8 + ({sz}) + (({sz}) % 2), _nb + 8)"
            )
        if k % 2 == 1 or k == wav_steps - 1:
            cur = _sx_stage(cur, wcols)
            wcols = {}
        if k % 2 == 1:  # intra-walk barrier: ~2 steps per codegen method
            cur = _codegen_barrier(cur, f"_wbar{k}")
    wav_rate = "COALESCE(" + ", ".join(
        f"CASE WHEN _wfmt{k} THEN {_sx_le32(f'_wp{k} + 12')} END"
        for k in range(wav_steps)
    ) + ")"
    wav_ch = "COALESCE(" + ", ".join(
        f"CASE WHEN _wfmt{k} THEN {_sx_le16(f'_wp{k} + 10')} END"
        for k in range(wav_steps)
    ) + ")"
    # fmt body offset 8 = average byte rate (le32); 'data' declared
    # size / byte rate = the header-declared duration (a truncated
    # upload keeps its declared duration — the DECLARED-vs-present gap
    # is mdat/moov-style structural checking, not duration parsing)
    wav_byte_rate = "COALESCE(" + ", ".join(
        f"CASE WHEN _wfmt{k} THEN {_sx_le32(f'_wp{k} + 16')} END"
        for k in range(wav_steps)
    ) + ")"
    wav_data = "COALESCE(" + ", ".join(
        f"CASE WHEN _wdat{k} THEN {_sx_le32(f'_wp{k} + 4')} END"
        for k in range(wav_steps)
    ) + ")"
    wav_dur_us = (
        f"CASE WHEN ({wav_byte_rate}) > 0 THEN "
        f"{_sx_idiv(f'({wav_data}) * 1000000', wav_byte_rate)} END"
    )
    # materialize the per-container outputs INSIDE their stage so the
    # final select assembles small columns instead of re-inlining every
    # coalesce chain into one method (the 64 KB trap, see
    # _codegen_barrier); the webp columns (below, walk-free) share the
    # projection — they read only _hx/_nb
    wav_out = {
        "_wav_rate": wav_rate,
        "_wav_ch": wav_ch,
        "_wav_dur": wav_dur_us,
    }

    # WebP variant dims (chunk fourcc at 13, body at 21). Every branch
    # carries a LENGTH gate beside its signature check: the lpad guard
    # reads past-end bytes as 0, so a truncated chunk would otherwise
    # parse as a confidently-wrong 1x1 canvas with parsed=true — the
    # exact quiet-data-loss class the census exists to surface
    # (code-review r10; truncated-VP8X pinned in test_formats).
    variant = _sx_str4("13")
    vp8_sync = "(substring(_hx, 47, 6) = '9D012A') AND (_nb >= 30)"
    vp8_w = f"({_sx_le16('27')}) % 16384"
    vp8_h = f"({_sx_le16('29')}) % 16384"
    vp8l_sig = "(substring(_hx, 41, 2) = '2F') AND (_nb >= 25)"
    vp8l_bits = _sx_le32("22")
    vp8l_w = f"(({vp8l_bits}) % 16384) + 1"
    vp8l_h = f"((FLOOR(({vp8l_bits}) / 16384)) % 16384) + 1"
    vp8x_ok = "_nb >= 30"  # flags+reserved+two le24 dims end at 30
    vp8x_w = f"({_sx_le16('25')}) + ({_sx_byte('27')}) * 65536 + 1"
    vp8x_h = f"({_sx_le16('28')}) + ({_sx_byte('30')}) * 65536 + 1"
    webp_w = (
        f"CASE WHEN ({variant} = '56503820') AND ({vp8_sync}) THEN {vp8_w}"
        f" WHEN ({variant} = '5650384C') AND ({vp8l_sig}) THEN {vp8l_w}"
        f" WHEN ({variant} = '56503858') AND ({vp8x_ok}) THEN {vp8x_w} END"
    )
    webp_h = (
        f"CASE WHEN ({variant} = '56503820') AND ({vp8_sync}) THEN {vp8_h}"
        f" WHEN ({variant} = '5650384C') AND ({vp8l_sig}) THEN {vp8l_h}"
        f" WHEN ({variant} = '56503858') AND ({vp8x_ok}) THEN {vp8x_h} END"
    )
    cur = _sx_stage(
        cur, {**wav_out, "_webp_w": webp_w, "_webp_h": webp_h}
    )
    # stage barrier: the WAV/webp output columns compile as their own
    # method
    cur = _codegen_barrier(cur, "_stage_wav")

    # ISO-BMFF top-level box walk: _bp{k} = byte position of box k's
    # size field. Spec-true size handling (ISO 14496-12 §4.2):
    # size >= 8 is the compact form; size == 1 means a 64-bit largesize
    # follows the fourcc (the >4 GB mdat every real video corpus
    # carries — high dword read but clamped, since the payload itself
    # bounds the walk); size == 0 means the box extends to EOF (valid
    # only for the last box — counted, then the walk stops).
    # same container gate as the wav walk: NULL start = free non-mp4
    # rows (the descent below then short-circuits through NULL moov)
    bcols = {"_bp0": "CAST(CASE WHEN _ctr = 'mp4' THEN 1 END AS BIGINT)"}
    for k in range(mp4_steps):
        p = f"_bp{k}"
        sz32 = _sx_be32(p)
        # 64-bit largesize: gate the high dword BEFORE any arithmetic —
        # any nonzero high half already exceeds every payload, and
        # multiplying it by 2^32 first overflows long under ANSI for
        # high >= 2^31 (a crafted mdat kills the whole census job,
        # ADVICE r10); the clamp value n_bytes + 8 keeps the box
        # counted and ends the walk, same as every other oversize
        large = (
            f"CASE WHEN ({_sx_be32(f'({p}) + 8')}) > 0 THEN _nb + 8"
            f" ELSE least({_sx_be32(f'({p}) + 12')}, _nb + 8) END"
        )
        sz = (
            f"CASE WHEN ({sz32}) = 0 THEN _nb - ({p}) + 1"  # to-EOF box
            f" WHEN ({sz32}) = 1 THEN {large}"
            f" ELSE ({sz32}) END"
        )
        min_sz = f"CASE WHEN ({sz32}) = 1 THEN 16 ELSE 8 END"
        ok = f"(({p}) + 7 <= _nb) AND (({sz}) >= ({min_sz}))"
        bcols[f"_bok{k}"] = ok
        bcols[f"_bty{k}"] = (
            f"CASE WHEN {ok} THEN {_sx_str4(f'({p}) + 4')} END"
        )
        bcols[f"_bsz{k}"] = f"CASE WHEN {ok} THEN {sz} END"
        if k + 1 < mp4_steps:
            # same clamp as the WAV walk: a garbage size of up to
            # 2^32-1 must not push the position past int range
            bcols[f"_bp{k + 1}"] = (
                f"CASE WHEN {ok} THEN least(({p}) + ({sz}), _nb + 8)"
                " ELSE _nb + 8 END"
            )
        if k % 2 == 1 or k == mp4_steps - 1:
            cur = _sx_stage(cur, bcols)  # one projection per step pair
            bcols = {}
        if k % 2 == 1:  # intra-walk barrier: ~2 steps per codegen method
            cur = _codegen_barrier(cur, f"_bbar{k}")
    mp4_boxes = " + ".join(
        f"CAST(_bok{k} AS BIGINT)" for k in range(mp4_steps)
    )
    # each term coalesces through CASE/ELSE 0: _bty{k} is NULL past
    # the last valid box, and a bare (NULL = 'moov') would poison the
    # whole + chain to NULL (the first cut's bug — d2 came back NULL on
    # every structurally-complete mp4)
    mp4_complete = (
        "(("
        + " + ".join(
            f"CASE WHEN _bty{k} = '6D6F6F76' THEN 1 ELSE 0 END"  # 'moov'
            for k in range(mp4_steps)
        )
        + ") > 0) AND (("
        + " + ".join(
            f"CASE WHEN _bty{k} = '6D646174' THEN 1 ELSE 0 END"  # 'mdat'
            for k in range(mp4_steps)
        )
        + ") > 0)"
    )

    cur = _sx_stage(
        cur, {"_mp4_boxes": mp4_boxes, "_mp4_complete": mp4_complete}
    )

    # stage barrier: the top-level box walk compiles as its own method
    cur = _codegen_barrier(cur, "_stage_box")

    # --- moov descent (VERDICT r10 #5): one level down. The top-level
    # walk hands over moov's position and size; a second unrolled walk
    # over moov's CHILD boxes finds mvhd (movie timescale + duration,
    # version 0 be32 fields / version 1 with 64-bit times — the high
    # duration dword is gated, not multiplied) and each trak's leading
    # tkhd (width/height as 16.16 fixed point — the integer part is
    # the leading be16 of each dword; the video trak carries real dims,
    # the audio trak zeros, so MAX across traks is the canvas). Every
    # miss is LOUD: no mvhd in the walk, a non-tkhd-first trak, or a
    # 64-bit duration with a nonzero high dword all leave NULLs.
    mpos = "COALESCE(" + ", ".join(
        f"CASE WHEN _bty{k} = '6D6F6F76' THEN _bp{k} END"
        for k in range(mp4_steps)
    ) + ")"
    msz = "COALESCE(" + ", ".join(
        f"CASE WHEN _bty{k} = '6D6F6F76' THEN _bsz{k} END"
        for k in range(mp4_steps)
    ) + ")"
    # child walk over moov (the _box_child_walk helper since r12 — the
    # same unrolled machinery now also drives the codec descent below);
    # msz is the top-level walk's RESOLVED size (largesize handled)
    cur = _box_child_walk(cur, "c", mpos, msz, moov_steps)
    # stage barrier: the moov child walk compiles as its own method
    cur = _codegen_barrier(cur, "_stage_moov")

    # mvhd position materialized once (r16): the string expressions
    # below would otherwise each inline the whole coalesce chain; it
    # shares the dur/dims projection via a lateral reference
    mvq_col = {"_mvq": _box_child_found("c", moov_steps, "6D766864")}  # mvhd
    mv_v1 = f"({_sx_byte('_mvq + 8')}) = 1"
    mp4_timescale = (
        f"CASE WHEN {mv_v1} THEN {_sx_be32('_mvq + 28')}"
        f" ELSE {_sx_be32('_mvq + 20')} END"
    )
    mp4_duration = (
        # 64-bit duration: read the low dword only when the high dword
        # is zero — same no-multiply overflow discipline as largesize
        f"CASE WHEN {mv_v1} THEN"
        f" (CASE WHEN ({_sx_be32('_mvq + 32')}) = 0"
        f" THEN {_sx_be32('_mvq + 36')} END)"
        f" ELSE {_sx_be32('_mvq + 24')} END"
    )
    mp4_dur_us = (
        f"CASE WHEN ({mp4_timescale}) > 0 THEN "
        f"{_sx_idiv(f'({mp4_duration}) * 1000000', mp4_timescale)} END"
    )
    # tkhd integer dims per trak child whose FIRST grandchild is tkhd
    # (universal muxer layout; anything else stays NULL):
    # v0 width at tkhd body offset 76, v1 at 88 (+12 for 64-bit times)
    tk_dims = []
    for k in range(moov_steps):
        tq = f"(_cp{k} + 8)"  # candidate tkhd box position
        is_tk = (
            f"_cok{k} AND (_cty{k} = '7472616B')"  # trak
            f" AND ({_sx_str4(f'{tq} + 4')} = '746B6864')"  # tkhd
        )
        tk_v1 = f"({_sx_byte(f'{tq} + 8')}) = 1"
        woff = f"CASE WHEN {tk_v1} THEN 96 ELSE 84 END"
        tk_dims.append(
            (
                f"CASE WHEN {is_tk} THEN "
                f"{_sx_be16(f'{tq} + ({woff})')} END",
                f"CASE WHEN {is_tk} THEN "
                f"{_sx_be16(f'{tq} + ({woff}) + 4')} END",
            )
        )
    mp4_vw = "greatest(" + ", ".join(w for w, _ in tk_dims) + ")"
    mp4_vh = "greatest(" + ", ".join(h for _, h in tk_dims) + ")"
    cur = _sx_stage(
        cur,
        {
            **mvq_col,
            "_mp4_dur": mp4_dur_us,
            "_mp4_vw": mp4_vw,
            "_mp4_vh": mp4_vh,
        },
    )
    # stage barrier: the mvhd/tkhd reads compile as their own method,
    # leaving the final select a CASE over ~10 materialized columns
    cur = _codegen_barrier(cur, "_stage_tk")

    # --- codec descent (VERDICT r11 #6): trak -> mdia -> minf -> stbl
    # -> stsd, each level one _box_child_walk over the previous level's
    # found box; the leading sample-entry fourcc of the FIRST trak's
    # stsd answers the "what codec is this corpus" curation question
    # the duration/dims columns stop short of. Every miss in the chain
    # (no trak, trak without mdia in-walk, opaque stbl, zero entries,
    # an undersized sample entry, or a non-printable fourcc) stays a
    # loud NULL — never a guess.
    # Each level: materialize the found-child position, then walk its
    # children. No per-level stage barriers (r12): the walks' own
    # intra-walk barriers already bound every generated method at ~2
    # steps, and each Dataset op costs an eager analyzer pass over the
    # whole accumulated plan — the deep census pays real driver time
    # per op, so ops are budgeted.
    # each level's found-position projection folds into the next
    # walk's first stage (pre=, resolved laterally) — one analyzer
    # pass per level instead of two
    cur = _box_child_walk(
        cur, "t", "_trakq", _sx_be32("_trakq"), trak_steps,
        pre={"_trakq": _box_child_found("c", moov_steps, "7472616B")},  # trak
    )
    cur = _box_child_walk(
        cur, "d", "_mdq", _sx_be32("_mdq"), mdia_steps,
        pre={"_mdq": _box_child_found("t", trak_steps, "6D646961")},
    )
    cur = _box_child_walk(
        cur, "f", "_mfq", _sx_be32("_mfq"), minf_steps,
        pre={"_mfq": _box_child_found("d", mdia_steps, "6D696E66")},
    )
    cur = _box_child_walk(
        cur, "s", "_sbq", _sx_be32("_sbq"), stbl_steps,
        pre={"_sbq": _box_child_found("f", minf_steps, "7374626C")},
    )
    sdq_col = {"_sdq": _box_child_found("s", stbl_steps, "73747364")}
    # stsd layout (ISO 14496-12 §8.5.2): verflags at +8, entry_count
    # (be32) at +12, first sample entry's size at +16 and its format
    # fourcc at +20. Gates: at least one entry declared, the entry at
    # least sample-entry-header-sized (16), the fourcc bytes in-payload,
    # and the decoded fourcc printable (registered formats are
    # alphanumerics plus ' ', '.', '-': avc1/hvc1/mp4a/av01/ac-3/
    # .mp3/raw ) — junk bytes would otherwise decode into confidently-
    # wrong mojibake, the quiet-data-loss class the census surfaces.
    stsd_fourcc = f"decode(unhex({_sx_str4('_sdq + 20')}), 'UTF-8')"
    codec = (
        f"CASE WHEN ({_sx_be32('_sdq + 12')}) >= 1"
        f" AND ({_sx_be32('_sdq + 16')}) >= 16"
        " AND (_sdq + 23 <= _nb)"
        f" AND ({stsd_fourcc}) RLIKE '^[0-9A-Za-z .-]{{4}}$'"
        f" THEN {stsd_fourcc} END"
    )
    cur = _sx_stage(cur, {**sdq_col, "_mp4_codec": codec})
    # stage barrier: the stsd reads compile as their own method
    cur = _codegen_barrier(cur, "_stage_stsd")

    d1_i = (
        "try_cast((CASE WHEN _ctr = 'wav' THEN _wav_rate"
        " WHEN _ctr = 'webp' THEN _webp_w"
        " WHEN _ctr = 'mp4' THEN _mp4_boxes END) AS BIGINT)"
    )
    d2_i = (
        "try_cast((CASE WHEN _ctr = 'wav' THEN _wav_ch"
        " WHEN _ctr = 'webp' THEN _webp_h"
        " WHEN _ctr = 'mp4' THEN CAST(_mp4_complete AS BIGINT) END)"
        " AS BIGINT)"
    )
    dur_us = (
        "try_cast((CASE WHEN _ctr = 'wav' THEN _wav_dur"
        " WHEN _ctr = 'mp4' THEN _mp4_dur END) AS BIGINT)"
    )
    return cur.selectExpr(
        f"`{id_col}`",
        "_ctr AS container",
        f"{d1_i} AS d1",
        f"{d2_i} AS d2",
        f"((({d1_i}) IS NOT NULL) AND (({d2_i}) IS NOT NULL)) AS parsed",
        "_nb AS n_bytes",
        f"{dur_us} AS dur_us",
        "try_cast((CASE WHEN _ctr = 'mp4' THEN _mp4_vw END) AS BIGINT)"
        " AS v_w",
        "try_cast((CASE WHEN _ctr = 'mp4' THEN _mp4_vh END) AS BIGINT)"
        " AS v_h",
        "CASE WHEN _ctr = 'mp4' THEN _mp4_codec END AS codec",
    )


def _hex_le24(c):
    return F.concat(_hex2(c % 256), _hex2(F.floor(c / 256) % 256),
                    _hex2(F.floor(c / 65536) % 256))


# --- SQL-string hex WRITERS (r16): synth_container_blob's Column-built
# body cost ~0.7 s of py4j roundtrips per plan build (the _sx_* reader
# rationale, writer side). Same expressions as the _hex* helpers above,
# emitted as strings; `c` is a parenthesized SQL sub-expression.

def _shex2(c: str) -> str:
    return f"lpad(hex(CAST(({c}) AS BIGINT)), 2, '0')"


def _shex_be16(c: str) -> str:
    return f"lpad(hex(CAST(({c}) AS BIGINT)), 4, '0')"


def _shex_be32(c: str) -> str:
    return f"lpad(hex(CAST(({c}) AS BIGINT)), 8, '0')"


def _shex_le16(c: str) -> str:
    return (
        f"concat({_shex2(f'({c}) % 256')}, "
        f"{_shex2(f'FLOOR(({c}) / 256)')})"
    )


def _shex_le32(c: str) -> str:
    # full 4-byte writer, same as _hex_le32 (VERDICT r10 #8)
    return (
        f"concat({_shex_le16(f'({c}) % 65536')}, "
        f"{_shex_le16(f'FLOOR(({c}) / 65536)')})"
    )


def _shex_le24(c: str) -> str:
    return (
        f"concat({_shex2(f'({c}) % 256')}, "
        f"{_shex2(f'FLOOR(({c}) / 256) % 256')}, "
        f"{_shex2(f'FLOOR(({c}) / 65536) % 256')})"
    )


def _hex_le32f(c):
    """Alias of :func:`_hex_le32`, retained from r10 when the image
    writer truncated values >= 2^16 and containers needed a separate
    full writer; since the r11 constants audit BOTH are the same full
    4-byte little-endian writer (VERDICT r10 #8)."""
    return _hex_le32(c)


def synth_container_blob(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> DataFrame:
    """Deterministic spec-true container payloads for the census path
    (the synth_image_blob design): container cycles with ``id % 4``
    (wav, webp, mp4, unknown), every field derives arithmetically from
    (id, len) so the DuckDB oracle states expected values without ever
    touching bytes, while the Spark side must actually parse what it
    built.

    Layout constants (mirrored in the mm_container_census oracle;
    payload = 10 + len % 100 throughout):

    - wav (id%4=0): the variation arithmetic runs on id//4 — wav ids
      all satisfy id%4 == 0, so id%2/id%4/id%8 are DEGENERATE on the
      wav lattice (the first cut shipped channels constantly 1 and a
      constant JUNK size; code-review r10): sample_rate =
      8000 + ((id//4)%8)*4000, channels = 1 + (id//4)%2; ids with
      id%5 == 0 carry a JUNK chunk of body 4 + 2*((id//4)%4) BEFORE
      'fmt ' (exercising the RIFF chunk walk; odd bodies exist in the
      wild but RIFF pads to even — the walk handles both, the even
      fixture keeps byte math simple); n_bytes = 12 +
      junk*(12 + 2*((id//4)%4)) + 24 + 8 + payload.
    - webp (id%4=1): width = 16 + id%240, height = 16 + (id//4)%224;
      variant cycles id%3 over VP8 (n_bytes = 30 + payload),
      VP8L (25 + payload), VP8X (30 + payload) — all three dimension
      encodings attested.
    - mp4 (id%4=2): 'ftyp' (16 + 4*(id%3) bytes: id%3 compatible
      brands) + (id//4)%4 'free' boxes of 8 + 2*(id%5) bytes +
      'moov' + 'mdat' (8 + payload); boxes = 3 + (id//4)%4,
      structurally complete (d2 = 1). moov holds REAL children
      (r11 descent): mvhd with timescale = 600*(1 + (id//4)%4) and
      duration = timescale*(1 + id%7) + (id//4)%600 (version 1 when
      (id//4)%3 == 0, else 0 — both decode paths), and one trak whose
      tkhd (version 1 when id%3 == 0) carries width = 320 + (id%64)*4,
      height = 180 + ((id//4)%64)*4. The trak continues (r12 codec
      descent) with an optional edts (present when (id//4)%2 == 1,
      size 8 + 4*((id//4)%3)) and a full mdia(mdhd hdlr minf(vmhd
      stbl(stsd))) chain of fixed size 141 whose leading sample-entry
      fourcc cycles (id//4)%5 over avc1/hvc1/mp4a/av01/vp09; moov
      size = 16 + mvhd (120 v1 / 108 v0) + tkhd (104 v1 / 92 v0)
      + edts + 141.
    - unknown (id%4=3): zero bytes, n_bytes = 26 + payload — the
      unparsed row the census must count, not drop.
    """
    # The whole payload is ONE string expression (r16): built as SQL
    # text and handed to a single F.expr at the end — the Column DSL
    # version paid ~0.7 s of py4j roundtrips per plan build (_sx_*
    # rationale). Same operators, same bytes; format tests + the
    # census oracle pin the output.
    i = f"`{id_col}`"
    pl = f"CAST(10 + (`{len_col}`) % 100 AS INT)"
    filler = f"repeat('00', {pl})"

    # --- wav --- (variation on id//4: see docstring — id%2/4/8 are
    # constant on the id%4 == 0 lattice)
    q4 = f"FLOOR(({i}) / 4)"
    rate = f"CAST(8000 + (({q4}) % 8) * 4000 AS BIGINT)"
    ch = f"CAST(1 + ({q4}) % 2 AS BIGINT)"
    bits = "CAST(16 AS BIGINT)"
    # junk body: even by construction
    junk_body = f"CAST(4 + 2 * (({q4}) % 4) AS BIGINT)"
    has_junk = f"(({i}) % 5) = 0"
    junk = (
        f"CASE WHEN {has_junk} THEN concat('4A554E4B', "  # 'JUNK'
        f"{_shex_le32(junk_body)}, "
        f"repeat('00', CAST(({junk_body}) AS INT))) ELSE '' END"
    )
    byte_rate = f"({rate}) * ({ch}) * 2"
    block_align = f"({ch}) * 2"
    data_size = f"CAST(({pl}) AS BIGINT)"
    riff_size = (
        "4"  # 'WAVE'
        f" + (CASE WHEN {has_junk} THEN ({junk_body}) + 8 ELSE 0 END)"
        " + 24"  # fmt chunk
        f" + 8 + ({data_size})"  # data chunk
    )
    wav = (
        "concat("
        f"'52494646', {_shex_le32(riff_size)}, '57415645', "
        f"{junk}, "
        f"'666D7420', {_shex_le32('16')}, "
        f"{_shex_le16('1')}, "  # PCM
        f"{_shex_le16(ch)}, "
        f"{_shex_le32(rate)}, "
        f"{_shex_le32(byte_rate)}, "
        f"{_shex_le16(block_align)}, "
        f"{_shex_le16(bits)}, "
        f"'64617461', {_shex_le32(data_size)}, "
        f"{filler})"
    )

    # --- webp ---
    w = f"CAST(16 + ({i}) % 240 AS BIGINT)"
    h = f"CAST(16 + FLOOR(({i}) / 4) % 224 AS BIGINT)"
    vp8_body = (
        "concat("
        "'000000', "  # frame tag (3 bytes, unread by the sniffer)
        "'9D012A', "  # sync code
        f"{_shex_le16(w)}, {_shex_le16(h)}, "
        f"{filler})"
    )
    vp8_size = f"CAST(10 + ({pl}) AS BIGINT)"
    vp8l_bits = f"(({w}) - 1) + (({h}) - 1) * 16384"
    vp8l_body = f"concat('2F', {_shex_le32(vp8l_bits)}, {filler})"
    vp8l_size = f"CAST(5 + ({pl}) AS BIGINT)"
    vp8x_body = (
        "concat("
        "'00000000', "  # flags + reserved
        f"{_shex_le24(f'({w}) - 1')}, {_shex_le24(f'({h}) - 1')}, "
        f"{filler})"
    )
    vp8x_size = f"CAST(10 + ({pl}) AS BIGINT)"
    chunk = (
        f"CASE WHEN ({i}) % 3 = 0 THEN "
        f"concat('56503820', {_shex_le32(vp8_size)}, {vp8_body})"
        f" WHEN ({i}) % 3 = 1 THEN "
        f"concat('5650384C', {_shex_le32(vp8l_size)}, {vp8l_body})"
        f" ELSE concat('56503858', {_shex_le32(vp8x_size)}, {vp8x_body}) END"
    )
    chunk_size = (
        f"CASE WHEN ({i}) % 3 = 0 THEN {vp8_size}"
        f" WHEN ({i}) % 3 = 1 THEN {vp8l_size}"
        f" ELSE {vp8x_size} END"
    )
    webp = (
        "concat("
        "'52494646', "
        f"{_shex_le32(f'({chunk_size}) + 12')}, "  # 'WEBP' + chunk hdr + body
        "'57454250', "
        f"{chunk})"
    )

    # --- mp4 ---
    ncompat = f"CAST(({i}) % 3 AS INT)"
    ftyp_size = f"CAST(16 + 4 * ({ncompat}) AS BIGINT)"
    ftyp = (
        "concat("
        f"{_shex_be32(ftyp_size)}, '66747970', "  # 'ftyp'
        "'69736F6D', "  # major brand 'isom'
        "'00000000', "  # minor version
        f"repeat('6D703431', {ncompat}))"  # 'mp41' compat brands
    )
    nfree = f"CAST(FLOOR(({i}) / 4) % 4 AS INT)"
    free_size = f"CAST(8 + 2 * (({i}) % 5) AS BIGINT)"
    free_box = (
        "concat("
        f"{_shex_be32(free_size)}, '66726565', "  # 'free'
        f"repeat('00', CAST(({free_size}) - 8 AS INT)))"
    )
    # moov with real children (VERDICT r10 #5): mvhd (movie timescale +
    # duration; version 1 with 64-bit times on the (id//4)%3 == 0
    # lattice so BOTH mvhd decode paths attest) and one trak whose
    # leading tkhd carries the canvas dims as 16.16 fixed point
    # (version 1 on id%3 == 0 — id%2/id%4 are degenerate on the mp4
    # lattice, the wav-fixture lesson). All variation runs on moduli
    # that actually vary for id % 4 == 2.
    matrix = (
        "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3
        + "40000000"
    )  # identity 3x3 fixed-point transform, spec's default
    ts = f"CAST(600 * (1 + ({q4}) % 4) AS BIGINT)"
    mdur = f"CAST(({ts}) * (1 + ({i}) % 7) + ({q4}) % 600 AS BIGINT)"
    mvhd_v1 = f"({q4}) % 3 = 0"
    rate_vol = "00010000" + "0100" + "00" * 10  # rate, volume, reserved
    mvhd = (
        f"CASE WHEN {mvhd_v1} THEN concat("
        f"{_shex_be32('120')}, '6D766864', "
        "'01000000', "  # version 1 + flags
        "repeat('00', 16), "  # 64-bit ctime + mtime
        f"{_shex_be32(ts)}, "
        f"'00000000', {_shex_be32(mdur)}, "  # 64-bit duration
        f"'{rate_vol}', "
        f"'{matrix}', "
        "repeat('00', 24), "  # pre_defined
        "'00000002'"  # next_track_ID
        ") ELSE concat("
        f"{_shex_be32('108')}, '6D766864', "
        "'00000000', "  # version 0 + flags
        "repeat('00', 8), "  # 32-bit ctime + mtime
        f"{_shex_be32(ts)}, "
        f"{_shex_be32(mdur)}, "
        f"'{rate_vol}', "
        f"'{matrix}', "
        "repeat('00', 24), "
        "'00000002'"
        ") END"
    )
    mvhd_size = f"CAST(CASE WHEN {mvhd_v1} THEN 120 ELSE 108 END AS BIGINT)"
    vw = f"CAST(320 + (({i}) % 64) * 4 AS BIGINT)"
    vh = f"CAST(180 + (({q4}) % 64) * 4 AS BIGINT)"
    tkhd_v1 = f"({i}) % 3 = 0"
    layer_etc = "0000" * 4  # layer, alternate_group, volume, reserved
    tkhd = (
        f"CASE WHEN {tkhd_v1} THEN concat("
        f"{_shex_be32('104')}, '746B6864', "
        "'01000007', "  # version 1 + enabled/in-movie/in-preview
        "repeat('00', 16), "  # 64-bit ctime + mtime
        "'0000000100000000', "  # track_ID, reserved
        f"'00000000', {_shex_be32(mdur)}, "  # 64-bit duration
        "repeat('00', 8), "  # reserved
        f"'{layer_etc}', "
        f"'{matrix}', "
        f"{_shex_be16(vw)}, '0000', "  # width  16.16
        f"{_shex_be16(vh)}, '0000'"  # height 16.16
        ") ELSE concat("
        f"{_shex_be32('92')}, '746B6864', "
        "'00000007', "
        "repeat('00', 8), "
        "'0000000100000000', "
        f"{_shex_be32(mdur)}, "
        "repeat('00', 8), "
        f"'{layer_etc}', "
        f"'{matrix}', "
        f"{_shex_be16(vw)}, '0000', "
        f"{_shex_be16(vh)}, '0000'"
        ") END"
    )
    tkhd_size = f"CAST(CASE WHEN {tkhd_v1} THEN 104 ELSE 92 END AS BIGINT)"
    # codec descent chain (r12): tkhd [edts] mdia(mdhd hdlr minf(vmhd
    # stbl(stsd(entry)))). Codec cycles on the q4 % 5 lattice (fresh —
    # unused by any other mp4 field) over the five formats a video
    # corpus actually carries; edts (body 4*(q4%3), present on
    # q4%2 == 1) exercises the trak child walk the way wav's JUNK
    # chunk exercises the RIFF walk. Fixed sizes: mdhd 32 (v0), hdlr
    # 33 ('vide' + empty null-terminated name), vmhd 20, stsd 32
    # (verflags + entry_count=1 + one minimal 16-byte sample entry),
    # stbl = 8 + stsd = 40, minf = 8 + vmhd + stbl = 68,
    # mdia = 8 + mdhd + hdlr + minf = 141.
    codec_hex = (
        f"CASE WHEN ({q4}) % 5 = 0 THEN '61766331'"   # avc1
        f" WHEN ({q4}) % 5 = 1 THEN '68766331'"       # hvc1
        f" WHEN ({q4}) % 5 = 2 THEN '6D703461'"       # mp4a
        f" WHEN ({q4}) % 5 = 3 THEN '61763031'"       # av01
        " ELSE '76703039' END"                        # vp09
    )
    stsd = (
        "concat("
        f"{_shex_be32('32')}, '73747364', "
        "'00000000', "  # version 0 + flags
        "'00000001', "  # entry_count
        f"{_shex_be32('16')}, {codec_hex}, "  # sample entry
        "repeat('00', 8))"  # 6 reserved bytes + data_ref_index
    )
    stbl = f"concat({_shex_be32('40')}, '7374626C', {stsd})"
    vmhd = (
        "concat("
        f"{_shex_be32('20')}, '766D6864', "
        "'00000001', "  # version 0 + flags = 1 (spec)
        "repeat('00', 8))"  # graphicsmode + opcolor
    )
    minf = f"concat({_shex_be32('68')}, '6D696E66', {vmhd}, {stbl})"
    mdhd = (
        "concat("
        f"{_shex_be32('32')}, '6D646864', "
        "'00000000', "  # version 0 + flags
        "repeat('00', 8), "  # ctime + mtime
        f"{_shex_be32(ts)}, "
        "'00000000', "  # duration (unread by the walk)
        "'55C40000')"  # language 'und' + pre_defined
    )
    hdlr = (
        "concat("
        f"{_shex_be32('33')}, '68646C72', "
        "'00000000', "  # version 0 + flags
        "'00000000', "  # pre_defined
        "'76696465', "  # handler_type 'vide'
        "repeat('00', 12), "  # reserved
        "'00')"  # empty null-terminated name
    )
    mdia = (
        f"concat({_shex_be32('141')}, '6D646961', {mdhd}, {hdlr}, {minf})"
    )
    edts_body = f"CAST(4 * (({q4}) % 3) AS BIGINT)"
    has_edts = f"({q4}) % 2 = 1"
    edts = (
        f"CASE WHEN {has_edts} THEN concat("
        f"{_shex_be32(f'({edts_body}) + 8')}, '65647473', "
        f"repeat('00', CAST(({edts_body}) AS INT))) ELSE '' END"
    )
    edts_size = (
        f"CAST(CASE WHEN {has_edts} THEN ({edts_body}) + 8 ELSE 0 END"
        " AS BIGINT)"
    )
    trak = (
        "concat("
        f"{_shex_be32(f'({tkhd_size}) + ({edts_size}) + 141 + 8')}, "
        f"'7472616B', {tkhd}, {edts}, {mdia})"
    )
    moov = (
        "concat("
        f"{_shex_be32(f'({mvhd_size}) + ({tkhd_size}) + ({edts_size}) + 141 + 16')}, "
        f"'6D6F6F76', {mvhd}, {trak})"
    )
    mdat = f"concat({_shex_be32(f'8 + ({pl})')}, '6D646174', {filler})"
    mp4 = f"concat({ftyp}, repeat({free_box}, {nfree}), {moov}, {mdat})"

    unknown = f"repeat('00', ({pl}) + 26)"

    blob_hex = (
        f"CASE WHEN ({i}) % 4 = 0 THEN {wav}"
        f" WHEN ({i}) % 4 = 1 THEN {webp}"
        f" WHEN ({i}) % 4 = 2 THEN {mp4}"
        f" ELSE {unknown} END"
    )
    return df.select(
        F.col(id_col), F.expr(f"unhex({blob_hex})").alias("blob")
    )
