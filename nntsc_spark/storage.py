"""Time-series storage layout: one date-partitioned fact table per collection.

Replaces the reference's per-stream physical table clones + UNION ALL
reassembly (libnntsc/database.py:621-632, dbselect.py:633-647) with a single
columnar table per collection:

- partitioned by ``date`` (derived from the integer epoch ``timestamp``) —
  directory-level pruning for time-range queries, the dominant predicate;
- sorted within partitions by (stream_id, timestamp) at write time so
  parquet row-group min/max stats prune stream_id IN (...) predicates
  (the reference's per-stream tables become row-group locality);
- appends are new files per micro-batch (blind append, no read-modify-write)
  — at 1000-executor scale writers never contend.

Retention (SURVEY.md §2.8 T7): whole date partitions older than the cutoff
are dropped, mirroring Influx retention policies (influx.py:236-274) — a
directory delete, not a rewrite.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_COL = "date"


def with_date(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    return df.withColumn(
        DATE_COL, F.date_format(F.col(ts_col).cast("timestamp"), "yyyy-MM-dd")
    )


def write_fact(
    df: DataFrame,
    path: str,
    mode: str = "append",
    sort_within: bool = True,
) -> None:
    """Append fact rows date-partitioned, sorted for row-group pruning."""
    out = with_date(df)
    if sort_within:
        out = out.sortWithinPartitions("stream_id", "timestamp")
    out.write.partitionBy(DATE_COL).mode(mode).parquet(path)


def read_fact(spark: SparkSession, path: str) -> DataFrame:
    """Single scan; Catalyst prunes date partitions from timestamp-derived
    predicates pushed by the query layer."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).drop(DATE_COL)


def write_dimension(df: DataFrame, path: str) -> None:
    """Dimensions (streams, path dictionaries) are tiny: full overwrite per
    micro-batch keeps them a single coherent snapshot."""
    df.write.mode("overwrite").parquet(path)


def apply_retention(path: str, keep_seconds: int, now: int) -> list[str]:
    """Drop whole date partitions strictly older than the cutoff.

    Returns the dropped partition names.  Mirrors the reference's Influx
    retention policy semantics (keepdata, influx.py:255-260) at directory
    granularity — a partition is dropped only when its entire day is past
    the cutoff, so the boundary day survives until fully expired.
    """
    import datetime as dt

    cutoff_day = dt.datetime.fromtimestamp(
        now - keep_seconds, tz=dt.timezone.utc
    ).strftime("%Y-%m-%d")
    dropped = []
    root = Path(path)
    if not root.exists():
        return dropped
    for part in sorted(root.glob(f"{DATE_COL}=*")):
        day = part.name.split("=", 1)[1]
        if day < cutoff_day:
            shutil.rmtree(part)
            dropped.append(part.name)
    return dropped


def write_fact_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    buckets: int = 32,
    bucket_col: str = "stream_id",
) -> None:
    """Bucketed fact layout for shuffle-free stream-keyed joins/aggs.

    ``bucketBy(stream_id) + sortBy(stream_id, timestamp)`` persists the
    hash distribution in the catalog: joins and aggregations keyed on
    stream_id read co-located buckets and skip the Exchange entirely —
    the cluster-scale replacement for the reference's per-stream physical
    tables.  Written as an external table so the path is caller-owned.
    """
    (
        df.write.bucketBy(buckets, bucket_col)
        .sortBy(bucket_col, "timestamp")
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )
