"""Stream-activity pruning — SURVEY.md §2.8 T8 / §4 "stream-activity pruning".

The reference memoizes per-stream first/last timestamps in memcached and
skips streams with no data in the query range, with a 10-minute freshness
slack on the last-seen side (libnntsc/dbselect.py:576-612,
streamcache.py:38-142).

Spark-first: a ``stream_stats`` table (one groupBy at ingest/maintenance
time; at 100 TB it is maintained incrementally per micro-batch) anti-filters
the label's stream list *before* the fact scan, shrinking both the broadcast
side and the IN-list pushed to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRESHNESS_SLACK = 600  # seconds (libnntsc/dbselect.py:609)


def build_stream_stats(fact: DataFrame) -> DataFrame:
    """stream_id -> (first_ts, last_ts, rows)."""
    return fact.groupBy("stream_id").agg(
        F.min("timestamp").alias("first_ts"),
        F.max("timestamp").alias("last_ts"),
        F.count(F.lit(1)).alias("rows"),
    )


def active_streams(
    stats: DataFrame,
    start: int,
    stop: int,
    now: int | None = None,
) -> DataFrame:
    """Streams considered active for [start, stop]:
    ``first_ts <= stop AND (last_ts >= start OR last_ts within 10 min of now)``
    (libnntsc/dbselect.py:576-612).  ``now`` is injectable for determinism.
    """
    cond = (F.col("first_ts") <= int(stop)) & (F.col("last_ts") >= int(start))
    if now is not None:
        cond = (F.col("first_ts") <= int(stop)) & (
            (F.col("last_ts") >= int(start))
            | (F.col("last_ts") >= int(now) - FRESHNESS_SLACK)
        )
    return stats.where(cond).select("stream_id", "first_ts", "last_ts", "rows")


def prune_label_map(label_map: DataFrame, stats: DataFrame, start: int, stop: int) -> DataFrame:
    """Drop inactive streams from a label map before the fact scan."""
    act = active_streams(stats, start, stop).select("stream_id")
    return label_map.join(F.broadcast(act), "stream_id", "inner")
