"""Direct-mapping ingest transforms: http and youtube.

These two reference parsers emit one fact row per message with straight
column copies (amp_http.py:94-130, amp_youtube.py:90-120) — the transforms
are thin projections; stream identity comes from each collection's unique
columns (see ``nntsc_spark.schemas``).

The families with nested per-result payloads live in their own modules:
``amp_udpstream`` (per-direction explosion + percentile resample),
``amp_sip`` (rx/tx fan-out), ``amp_external`` (result explosion +
destination fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import COLLECTIONS


def _project(raw: DataFrame, collection: str, renames: dict[str, str],
             pad_unused: bool) -> DataFrame:
    cs = COLLECTIONS[collection]
    stream_cols = [f.name for f in cs.stream_fields]
    data_cols = [f.name for f in cs.data_fields]
    df = raw
    for src, dst in renames.items():
        if src in df.columns:
            df = df.withColumnRenamed(src, dst)
    if pad_unused and "unused" not in df.columns:
        df = df.withColumn("unused", F.lit(True))
    keep = [c for c in [*stream_cols, "timestamp", *data_cols] if c in df.columns]
    return df.select(*keep)


def process_http(raw: DataFrame) -> DataFrame:
    return _project(raw, "amp-http", {"target": "destination"}, pad_unused=False)


def process_youtube(raw: DataFrame) -> DataFrame:
    """amp_youtube.py:110-130 _mangle_result: AMPsave names ``video`` /
    ``requested_quality`` map onto ``destination`` / ``quality``; the
    renames only fire when the source column is present, so already-mangled
    input passes through (the reference's ``in`` checks, amp_youtube.py:87-96).
    """
    return _project(
        raw,
        "amp-youtube",
        {"video": "destination", "requested_quality": "quality"},
        pad_unused=False,
    )
