"""Multimodal-column pipeline queries (operators/multimodal.py).

The blob table is synthesized deterministically from documents (text
bytes as media bytes), so the JVM-side stages (metadata stats, frame
sampling) are DuckDB-oracle-checkable, while the mapInPandas feature
extraction — whose fake embedding is a Python md5 chain — gets the
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import blob_table_from_documents, sample_frames
from .qutil import compile_once_scalar
from .registry import query

_SQL_MEDIA = """
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         text,
         CAST(n_chars % 640 AS INT) AS width,
         CAST(n_chars % 480 AS INT) AS height,
         CAST(n_chars * 10 AS INT) AS duration_ms
  FROM documents
"""


@query(
    "multimodal_meta_stats",
    oracle=f"""
WITH media AS ({_SQL_MEDIA})
SELECT media_type,
       count(*) AS n,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       min(width) AS min_width, max(width) AS max_width,
       min(height) AS min_height, max(height) AS max_height,
       CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms
FROM media GROUP BY media_type
""",
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata profiling over the binary media table — the stats a
    pipeline prunes on before touching any bytes (nested-field pushdown:
    only meta.* and length(content) are read)."""
    m = blob_table_from_documents(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.min("meta.width").alias("min_width"),
        F.max("meta.width").alias("max_width"),
        F.min("meta.height").alias("min_height"),
        F.max("meta.height").alias("max_height"),
        F.sum("meta.duration_ms").alias("total_duration_ms"),
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH media AS ({_SQL_MEDIA})
SELECT media_id, off AS offset_ms,
       upper(hex(encode(substr(text, 1, 16)))) AS frame_hex
FROM media, unnest(generate_series(0, greatest(duration_ms - 1, 0), 1000)) AS g(off)
WHERE media_type = 'video'
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one row per 1000 ms offset (JVM-side explode;
    frame decode stubbed to a byte slice, hex-encoded for comparison)."""
    m = blob_table_from_documents(spark, sf_dir)
    return compile_once_scalar(sample_frames(m, every_ms=1000).select(
        "media_id",
        F.col("offset_ms").cast("long").alias("offset_ms"),
        F.hex(F.col("frame_stub")).alias("frame_hex"),
    ))


@query(
    "multimodal_features",
    # Round 8: oracled (was rows-only).  The oracle recomputes every
    # statistic from the closed-form pixel formula — it never parses a
    # byte, so agreement proves the WHOLE image binary path (synthesize
    # -> encode_bmp -> shuffle as binary -> decode_image -> numpy stats)
    # end-to-end, exactly like the multimodal_audio_features WAV row.
    oracle="""
WITH imgs AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 4 + n_chars % 11 AS h
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT i.doc_id, i.w, i.h,
         (i.doc_id * 7 + y * 31 + x * 13) % 256 AS r,
         (i.doc_id * 7 + y * 31 + x * 13 + 5) % 256 AS g,
         (i.doc_id * 7 + y * 31 + x * 13 + 10) % 256 AS b
  FROM imgs i,
       unnest(generate_series(0, i.h - 1)) AS gy(y),
       unnest(generate_series(0, i.w - 1)) AS gx(x)
)
SELECT doc_id AS media_id,
       CAST(54 + h * (w * 3 + (4 - (w * 3) % 4) % 4) AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(sum(r) AS BIGINT) AS r_sum,
       CAST(sum(g) AS BIGINT) AS g_sum,
       CAST(sum(b) AS BIGINT) AS b_sum,
       CAST(coalesce(sum(CASE WHEN r + g + b >= 384 THEN 1 END), 0) AS BIGINT)
         AS bright_px
FROM px GROUP BY doc_id, w, h
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image path (round 8, the WAV design applied to images):
    deterministic closed-form RGB patterns are encoded to 24bpp BMP
    executor-side, travel as an opaque binary column, and a second
    Arrow stage parses the container (operators/multimodal.py
    decode_image — the real bottom-up/BGR/padded reader) and computes
    integer image statistics.  Both Arrow stages are the deliberate
    Python path (a codec/model stage); everything around them is
    ordinary columnar plumbing.  The md5 fake-embedding fallback for
    undecodable payloads stays pytest-covered via extract_features
    (tests/test_operators.py::test_bmp_media_pipeline)."""
    from ..operators.multimodal import bmp_closed_form_media, image_features

    media = bmp_closed_form_media(spark, sf_dir)
    # Round 15: bmp_closed_form_media now spreads the starved scan, so
    # the plan carries an exchange and compile_once_scalar's honesty
    # guard (an exchange-bearing frozen plan would reuse its shuffle
    # map output across timed runs) correctly rejects it.  Paying the
    # ~10 ms per-action re-plan to run the two Python codec stages on
    # every core instead of ONE worker (0.35 s single-task wall
    # measured) is the right trade; the row also leaves the
    # plan_cached exclusion list.
    return image_features(media)


@query(
    "multimodal_audio_features",
    # the oracle recomputes every statistic from the closed-form sample
    # formula — it never parses a byte, so agreement proves the WHOLE
    # binary path (synthesize -> encode_wav -> shuffle as binary ->
    # decode_wav -> numpy stats) end-to-end
    oracle="""
WITH audio AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
s AS (
  SELECT doc_id, i, ((doc_id * 31 + i * 17) % 2048) - 1024 AS v,
         lag(((doc_id * 31 + i * 17) % 2048) - 1024)
           OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM audio, unnest(generate_series(0, 200 + doc_id % 97 - 1)) AS g(i)
)
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(coalesce(sum(CASE WHEN v * pv < 0 THEN 1 END), 0) AS BIGINT)
         AS zero_crossings
FROM s GROUP BY doc_id
""",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio path (round 4): deterministic int16 waveforms are
    encoded to RIFF/WAVE executor-side, travel as an opaque binary
    column, and a second Arrow stage parses the container and computes
    integer signal statistics (RMS energy, zero-crossing rate inputs) —
    operators/multimodal.py encode_wav/decode_wav/audio_features.  Both
    Arrow stages are the deliberate Python path (a codec/model stage);
    everything around them is ordinary columnar plumbing."""
    from ..operators.multimodal import audio_features, wav_media_from_documents

    media = wav_media_from_documents(spark, sf_dir)
    # Round 15: spread scan + exchange, so no plan cache — see
    # multimodal_features for the rationale.
    return audio_features(media)
