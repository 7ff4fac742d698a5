"""Direct-mapping ingest transforms: http, youtube, udpstream, sip, external.

These reference parsers emit one fact row per result with straight column
copies (and an ``unused=True`` pad where the schema declares it):
amp_http.py:94-130, amp_youtube.py:90-120, amp_udpstream.py:140-190,
amp_sip.py:120-190, amp_external.py:80-110.  The transforms are thin
projections; stream identity comes from each collection's unique columns
(see ``nntsc_spark.schemas``).
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
    return _project(raw, "amp-youtube", {"target": "destination"}, pad_unused=False)


def process_udpstream(raw: DataFrame) -> DataFrame:
    return _project(
        raw,
        "amp-udpstream",
        {"target": "destination", "packets_received": "packets_recvd"},
        pad_unused=True,
    )


def process_sip(raw: DataFrame) -> DataFrame:
    return _project(raw, "amp-sip", {"target": "destination"}, pad_unused=True)


def process_external(raw: DataFrame) -> DataFrame:
    return _project(raw, "amp-external", {"target": "destination"}, pad_unused=False)
