"""Round-10 addition: the audio/video container census (VERDICT r9 #4)
— the mm_format_census byte-arithmetic technique extended to WAV/RIFF,
WebP (all three VP8 bitstream variants), and MP4/ISO-BMFF.

Kept deliberately tiny (ONE registration): round 10's primary job was
consolidation — 14 overlapping registrations merged into richer homes
(VERDICT r9 #1), buying the attestation-rotation ledger back to
163 + this + headroom 36 against the 200-query capacity ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table


@register(
    "mm_container_census",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'wav' WHEN 1 THEN 'webp'
                  WHEN 2 THEN 'mp4' ELSE 'unknown' END AS container,
             10 + n_chars % 100 AS pl
      FROM documents),
    v AS (
      SELECT container,
             CASE container
               WHEN 'wav'  THEN 8000 + ((doc_id // 4) % 8) * 4000
               WHEN 'webp' THEN 16 + doc_id % 240
               WHEN 'mp4'  THEN 3 + (doc_id // 4) % 4
             END AS d1,
             CASE container
               WHEN 'wav'  THEN 1 + (doc_id // 4) % 2
               WHEN 'webp' THEN 16 + (doc_id // 4) % 224
               WHEN 'mp4'  THEN 1
             END AS d2,
             CASE container
               WHEN 'wav'  THEN 12
                    + CASE WHEN doc_id % 5 = 0
                           THEN 12 + 2 * ((doc_id // 4) % 4) ELSE 0 END
                    + 24 + 8 + pl
               WHEN 'webp' THEN CASE doc_id % 3 WHEN 1 THEN 25
                                ELSE 30 END + pl
               WHEN 'mp4'  THEN 16 + 4 * (doc_id % 3)
                    + ((doc_id // 4) % 4) * (8 + 2 * (doc_id % 5))
                    + 16
                    + CASE WHEN (doc_id // 4) % 3 = 0 THEN 120 ELSE 108 END
                    + CASE WHEN doc_id % 3 = 0 THEN 104 ELSE 92 END
                    + CASE WHEN (doc_id // 4) % 2 = 1
                           THEN 8 + 4 * ((doc_id // 4) % 3) ELSE 0 END
                    + 141
                    + 8 + pl
               ELSE 26 + pl
             END AS n_bytes,
             CASE container
               WHEN 'wav' THEN (pl * 1000000)
                    // ((8000 + ((doc_id // 4) % 8) * 4000)
                        * (1 + (doc_id // 4) % 2) * 2)
               WHEN 'mp4' THEN ((600 * (1 + (doc_id // 4) % 4))
                                * (1 + doc_id % 7)
                                + (doc_id // 4) % 600) * 1000000
                    // (600 * (1 + (doc_id // 4) % 4))
             END AS dur_us,
             CASE container WHEN 'mp4'
                  THEN 320 + (doc_id % 64) * 4 END AS v_w,
             CASE container WHEN 'mp4'
                  THEN 180 + ((doc_id // 4) % 64) * 4 END AS v_h,
             CASE container WHEN 'mp4' THEN
                  CASE (doc_id // 4) % 5
                    WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1'
                    WHEN 2 THEN 'mp4a' WHEN 3 THEN 'av01'
                    ELSE 'vp09' END
             END AS codec
      FROM m)
    SELECT container,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(CASE WHEN d1 IS NOT NULL AND d2 IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(d1) AS BIGINT) AS min_d1,
           CAST(MAX(d1) AS BIGINT) AS max_d1,
           CAST(MIN(d2) AS BIGINT) AS min_d2,
           CAST(MAX(d2) AS BIGINT) AS max_d2,
           CAST(COUNT(dur_us) AS BIGINT) AS n_dur,
           CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us,
           CAST(MAX(v_w) AS BIGINT) AS max_vw,
           CAST(MAX(v_h) AS BIGINT) AS max_vh,
           CAST(COUNT(codec) AS BIGINT) AS n_codec,
           NULLIF(array_to_string(
             list_sort(list(DISTINCT codec) FILTER (WHERE codec IS NOT NULL)),
             ','), '') AS codecs
    FROM v GROUP BY container ORDER BY container
    """,
)
def mm_container_census(spark: SparkSession, sf: str) -> DataFrame:
    """Audio/video container census from RAW BYTES — the
    mm_format_census discipline (synth spec-true payloads from
    (doc_id, n_chars); parse them with pure codegen byte arithmetic;
    the DuckDB oracle states every expected value arithmetically and
    never touches the bytes, so a parse bug cannot cancel out) applied
    to the containers a multimodal training corpus actually carries:

    - wav: RIFF chunk walk to 'fmt ' (every 5th payload plants a JUNK
      preface chunk so the walk is exercised, not a fixed offset);
      d1 = sample rate, d2 = channels;
    - webp: all THREE bitstream variants cycle through the fixture —
      'VP8 ' lossy (14-bit le dims after the sync code), 'VP8L'
      lossless (dims packed into one le32), 'VP8X' extended (24-bit le
      canvas dims) — each with its own decode path in the sniffer;
      d1 = width, d2 = height;
    - mp4: top-level ISO-BMFF box walk (ftyp + a varying number of
      free boxes + moov + mdat); d1 = boxes seen, d2 = 1 iff BOTH moov
      and mdat present (structural completeness — a truncated upload
      misses one); one level DOWN (VERDICT r10 #5), the moov-child
      walk reads mvhd (both versions cycle in the fixture) for the
      movie duration and trak/tkhd (both versions) for the canvas
      dims — censused as n_dur / sum_dur_us / max_vw / max_vh; the
      wav rows contribute dur_us = declared data size over the fmt
      byte rate; FOUR levels further (r12), the codec descent walks
      trak -> mdia -> minf -> stbl -> stsd (an optional edts box
      exercises the trak child walk) and reads the leading
      sample-entry fourcc — five codecs cycle in the fixture and the
      census reports n_codec + the sorted distinct `codecs` roster,
      the "what codec is this corpus" curation answer;
    - unknown: counted loudly (n_parsed = 0), never dropped — the
      mm_format_census n_unparsed lesson.

    Scale shape: synth + sniff are shuffle-free per-row projections
    riding the scan (operators/multimodal.py sniff_container_meta);
    the census is ONE map-side-combined aggregation on a 4-value key.
    """
    from dns_log_transformer_spark.operators import multimodal
    from dns_log_transformer_spark.operators.text import rebalance_for_fanout

    # the synth+walk chain is pure per-row byte arithmetic riding the
    # scan — on the single-row-group fixture file that means ONE task
    # per walk stage (r15 profile: ~2 s serial). Rebalance the slim
    # 2-column input before the fan-out; no-op at scale.
    docs = rebalance_for_fanout(
        table(spark, sf, "documents").select("doc_id", "n_chars")
    )
    blobs = multimodal.synth_container_blob(docs)
    meta = multimodal.sniff_container_meta(blobs)
    return (
        meta.groupBy("container")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_payloads"),
            F.sum(F.col("parsed").cast("long")).cast("long").alias("n_parsed"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.min("d1").cast("long").alias("min_d1"),
            F.max("d1").cast("long").alias("max_d1"),
            F.min("d2").cast("long").alias("min_d2"),
            F.max("d2").cast("long").alias("max_d2"),
            F.count("dur_us").cast("long").alias("n_dur"),
            F.sum("dur_us").cast("long").alias("sum_dur_us"),
            F.max("v_w").cast("long").alias("max_vw"),
            F.max("v_h").cast("long").alias("max_vh"),
            F.count("codec").cast("long").alias("n_codec"),
            F.nullif(
                F.array_join(F.array_sort(F.collect_set("codec")), ","),
                F.lit(""),
            ).alias("codecs"),
        )
        .orderBy("container")
    )
