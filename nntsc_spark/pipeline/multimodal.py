"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
(the only sanctioned Python-in-the-loop path in this engine).  The actual
codec work is STUBBED — the container has no image/audio libraries — behind
``decode_image_batch``'s ``_decode_pixels`` seam, which raises
``NotImplementedError`` unless a deterministic fake is requested.  The
Spark-side plumbing (schema, batching, partitioning, UDF signatures) is
real and tested.

Scale notes: media rows are large; ``media_repartition`` sizes partitions by
byte budget (not row count) so Arrow batches stay within executor memory,
and metadata-only queries never touch the binary column (column pruning
keeps the scan cheap — SELECT of metadata fields reads only those parquet
columns).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
        StructField("feat_mean", LongType(), True),
    ]
)


def _decode_pixels(content: bytes, fake: bool) -> list[int]:
    """Codec seam.  Real decoders (PIL/libav/...) are not available in this
    container; ``fake=True`` derives deterministic pseudo-pixels from the
    bytes so the pipeline shape is testable end to end."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    return [b for b in content[:64]]


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas keeps the binary payloads inside Arrow record batches
    (no per-row Python call overhead); the output schema is fixed so the
    optimizer can prune upstream columns to (media_id, content).
    """
    import hashlib

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": pdf["content"].map(
                    lambda c: len(c) if c is not None else None
                ),
                "checksum": pdf["content"].map(
                    lambda c: hashlib.md5(c).hexdigest() if c is not None else None
                ),
            }
            def mean_or_none(c):
                if c is None:
                    return None
                px = _decode_pixels(bytes(c), fake_decode)
                return int(sum(px) / len(px)) if px else None

            out["feat_mean"] = pdf["content"].map(mean_or_none)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def media_repartition(media: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition by payload byte budget so each Arrow batch / task holds
    ~target_bytes of media, regardless of row count."""
    total = media.select(
        F.sum(F.length("content")).alias("b")
    ).collect()[0]["b"] or 0
    parts = max(1, int(total / target_bytes) + 1)
    return media.repartition(parts, "media_id")


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as opaque binary payloads (the testdata
    has no real media; this exercises the full binary pipeline)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("fake/raw").alias("format"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
