"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns + a typed metadata struct —
the lakehouse-standard layout (parquet stores the bytes; column stats
and pruning work on the metadata).  Decode/feature-extract run as
Arrow-batched ``mapInPandas`` stages: bytes never hit the Python driver,
batches flow executor-side, and the pipeline scales by partitioning
exactly like any other operator.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is STUBBED — ``decode_image`` raises NotImplementedError
unless a codec is importable, and ``extract_features`` substitutes a
deterministic hash-derived fake feature vector.  Everything around the
stub (schema, batch iteration, UDF signature, partitioning) is real and
tested; swapping the fake for a real model call changes one function.

Reference: no counterpart in Presto (varbinary + UDF would be the
closest) — this is §"beyond the reference" training-pipeline surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_DIM",
    "blob_table_from_documents",
    "decode_image",
    "extract_features",
    "sample_frames",
]

FEATURE_DIM = 16

# media_id + raw bytes + typed metadata: the multimodal table layout.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image/audio/video
        StructField("content", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def blob_table_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a deterministic multimodal table from the documents
    fixture (text bytes stand in for media bytes; metadata derived from
    doc stats).  Real pipelines read parquet with a binary column."""
    from ..catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Decode raw image bytes -> (H, W, 3) array.

    STUB: image codecs are not installed in this environment.  With PIL
    present this is Image.open(BytesIO(content)); the Spark-side call
    sites (extract_features) do not change.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow (not available in this container); "
            "extract_features substitutes a deterministic fake embedding"
        ) from e
    raise NotImplementedError("real decode path reserved for codec-enabled deployments")


def _fake_embedding(content: bytes) -> list[float]:
    """Deterministic stand-in for model(decode(bytes)): md5-seeded floats
    in [-1, 1).  Stable across runs/partitions — testable plumbing."""
    out: list[float] = []
    h = content
    while len(out) < FEATURE_DIM:
        h = hashlib.md5(h).digest()
        out.extend(int.from_bytes(h[i : i + 4], "big") / 2**31 - 1.0 for i in (0, 4, 8, 12))
    return out[:FEATURE_DIM]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: (media_id, media_type, content) ->
    (media_id, media_type, n_bytes, feature array<float>).

    The iterator-of-batches shape is the production contract: each Arrow
    batch is decoded + embedded in one vectorized call (model inference
    batches naturally); memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch, not partition size.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("media_type", StringType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("feature", ArrayType(FloatType()), False),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": pdf["content"].map(_fake_embedding),
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    offset (plumbing real — frame *content* decode is stubbed to a
    deterministic byte slice).  explode() keeps it JVM-side."""
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)),
        lambda off: F.struct(
            off.alias("offset_ms"),
            # stub: real impl decodes the frame at `off`; we slice bytes
            F.substring(F.col("content"), 1, 16).alias("frame_stub"),
        ),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", "f.offset_ms", "f.frame_stub")
    )
