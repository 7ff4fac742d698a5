"""amp-icmp ingest transform.

Reference behavior (libnntsc/parsers/amp_icmp.py:100-217): each batch row is
one probe result; results are grouped per stream within a (timestamp, source)
batch and aggregated: sorted non-null rtts, integer median, loss count,
results count (truthy rtt/loss only), lossrate = loss/results, then the rtt
array is None-padded once per lost measurement.

Raw input schema (one row per result):
``source string, timestamp long, rtt long, loss long, random boolean,
target string, address string, packet_size long``
(ttl/error_type/error_code/dscp are accepted and ignored, as the reference
stores none of them for icmp.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import (
    family_expr,
    int_median_expr,
    lossrate_expr,
    pad_nulls_expr,
    packet_size_str_expr,
    results_count_expr,
)

#: stream identity columns (amp_icmp.py:53-55, order matches unique key)
UNIQUE_COLS = ["source", "destination", "family", "packet_size"]


def icmp_stream_props(raw: DataFrame) -> DataFrame:
    """Derive stream-property columns from raw results
    (amp_icmp.py:86-130 _stream_properties)."""
    return (
        raw.withColumn("destination", F.col("target"))
        .withColumn("family", family_expr("address"))
        .withColumn("packet_size_int", F.col("packet_size"))
        .withColumn("packet_size", packet_size_str_expr("random", "packet_size_int"))
    )


def process_icmp(raw: DataFrame) -> DataFrame:
    """Aggregate raw icmp results into fact rows keyed by stream + timestamp.

    Output: stream property cols (UNIQUE_COLS) + timestamp + data columns
    (median, packet_size_int, loss, results, lossrate, rtts).
    """
    props = icmp_stream_props(raw)
    agg = props.groupBy(*UNIQUE_COLS, "timestamp").agg(
        F.array_sort(F.collect_list("rtt")).alias("_rtts_sorted"),
        F.sum("loss").alias("loss"),
        results_count_expr(F.col("rtt"), F.col("loss")).alias("results"),
        F.first("packet_size_int").alias("packet_size_int"),
    )
    return agg.select(
        *UNIQUE_COLS,
        "timestamp",
        int_median_expr(F.col("_rtts_sorted")).alias("median"),
        "packet_size_int",
        "loss",
        "results",
        lossrate_expr(F.col("loss"), F.col("results")).alias("lossrate"),
        pad_nulls_expr(F.col("_rtts_sorted"), F.coalesce(F.col("loss"), F.lit(0))).alias(
            "rtts"
        ),
    )
