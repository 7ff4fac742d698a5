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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)

#: the fake decoder yields 64 pseudo-pixels, modeled as an 8x8 grid
_FAKE_SIDE = 8


def resize_media(
    media: DataFrame, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode, Arrow-batched.

    The resize itself runs on the decoded pixel grid inside mapInPandas —
    with a real codec the seam swaps to PIL/libav and the Spark-side shape
    (column pruning to (media_id, content), fixed output schema, byte-
    budget partitioning upstream) is identical.  The fake decoder's 8x8
    grid makes the sampling arithmetic deterministic and testable.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        def one(c):
            if c is None:
                return None
            px = _decode_pixels(bytes(c), fake_decode)
            if not px:
                return None
            side = _FAKE_SIDE
            px = (px + [0] * (side * side))[: side * side]
            out = bytearray()
            for y in range(height):
                sy = min(side - 1, y * side // height)
                for x in range(width):
                    sx = min(side - 1, x * side // width)
                    out.append(px[sy * side + sx])
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].map(one),
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    every_n: int = 2,
    max_frames: int = 8,
    frame_bytes: int = 64,
    fake_decode: bool = True,
) -> DataFrame:
    """Video frame sampling: one output ROW per sampled frame.

    mapInPandas fans each video out to its sampled frames (row-multiplying
    UDF — the output iterator is not 1:1 with the input, which is exactly
    why this is mapInPandas and not a scalar pandas UDF).  The fake
    "container" treats the payload as consecutive ``frame_bytes`` chunks;
    a real demuxer slots into the same seam.  Downstream per-frame feature
    extraction reuses :func:`extract_features` unchanged (frames are just
    media rows).
    """
    if not fake_decode:
        raise NotImplementedError(
            "frame sampling requires demux libraries not present in this "
            "environment; pass fake_decode=True for the chunking demuxer"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                raw = bytes(c)
                n = max(1, (len(raw) + frame_bytes - 1) // frame_bytes)
                for k, f in enumerate(range(0, n, every_n)):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(raw[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "content": frames}
            )

    return media.select("media_id", "content").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def media_repartition(media: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition by payload byte budget so each Arrow batch / task holds
    ~target_bytes of media, regardless of row count.

    The byte total comes from DRIVER-SIDE file metadata (`inputFiles` +
    filesystem stat — the same listing the planner already does), never
    from a ``sum(length(content))`` job: that would be a full extra pass
    over the binary corpus, doubling the most expensive scan at 100 TB.
    On-disk (compressed) size slightly undercounts in-memory Arrow bytes,
    which errs toward MORE partitions — the safe direction for memory.
    For non-file-backed frames (post-shuffle intermediates, in-memory
    frames) there is no metadata to consult, so the byte budget is
    enforced the only way possible: one ``sum(length(content))`` pass.
    That pass exists ONLY on this path — the file-backed case (every
    registered query, and any table-reading production pipeline) never
    rescans the corpus.
    """
    spark = media.sparkSession
    try:
        files = media.inputFiles()
    except Exception:
        files = []
    total = 0
    if files:
        # one listStatus per parent DIRECTORY, not one stat per file: a
        # 100 TB corpus has ~10^6 files and per-file py4j roundtrips would
        # make the driver the bottleneck; directories number ~10^3
        import re

        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        # Hadoop Path.toString() renders an empty authority as scheme:/path
        # while inputFiles() reports scheme:///path — normalize before
        # comparing
        norm = lambda u: re.sub(r"^([A-Za-z0-9+.-]+):///", r"\1:/", u)
        wanted = {norm(uri) for uri in files}
        parents = {uri.rsplit("/", 1)[0] for uri in files}
        for d in parents:
            p = jvm.org.apache.hadoop.fs.Path(d)
            for st in p.getFileSystem(hconf).listStatus(p):
                if norm(st.getPath().toString()) in wanted:
                    total += st.getLen()
    if not files:
        # non-file-backed: the budget contract still holds — pay the one
        # aggregation pass (there is no cheaper source of truth)
        total = (
            media.select(F.sum(F.length("content")).alias("b")).collect()[0]["b"]
            or 0
        )
    if files and not total:
        # files exist but none stat-matched (a URI rendering this
        # normalization doesn't cover) or all are empty: DON'T funnel an
        # unknown-size corpus into one partition — session parallelism is
        # the safe unknown-size default
        parts = max(1, spark.sparkContext.defaultParallelism)
    else:
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


def media_exact_dedup(
    media: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Exact duplicate media blobs: group by md5 over the RAW BYTES (no
    decode — byte-identical files dedup regardless of what's inside
    them, the first and cheapest pass every multimodal pipeline runs
    before any perceptual hashing), keep the smallest id as survivor.

    Same contract as the text-side ``exact_duplicates``: one hash
    groupBy, map-side combinable, skew-proof key (md5 is uniform), and
    the hash rides the shuffle instead of the blob — a 10 MB image
    contributes 32 bytes to the exchange.  Per-``kind`` counts ride the
    same aggregate so the dedup report needs no second scan.

    NULL-content rows are EXCLUDED: md5(NULL) is NULL and a groupBy
    unifies NULL keys, so two unrelated rows that merely both lack bytes
    would otherwise be reported as copies of each other.

    Output: (content_hash, kind, survivor_media_id, n_copies).
    """
    return media.where(F.col(content_col).isNotNull()).groupBy(
        F.md5(F.col(content_col)).alias("content_hash"),
        F.col("kind"),
    ).agg(
        F.min(id_col).alias("survivor_media_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
