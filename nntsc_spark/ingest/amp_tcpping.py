"""amp-tcpping ingest transform.

Like amp-icmp plus: a ``port`` stream column, and ``icmperrors`` = count of
results with a non-zero icmptype; icmp errors are None-padded into the rtt
array AFTER the loss padding (reference: libnntsc/parsers/
amp_tcpping.py:128-175).

Raw input adds ``port long, icmptype long`` to the icmp raw schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .amp_icmp import icmp_stream_props
from .base import (
    int_median_expr,
    lossrate_expr,
    pad_nulls_expr,
    results_count_expr,
)

UNIQUE_COLS = ["source", "destination", "port", "family", "packet_size"]


def process_tcpping(raw: DataFrame) -> DataFrame:
    props = icmp_stream_props(raw).withColumn(
        "port", F.col("port").cast("string")
    )
    agg = props.groupBy(*UNIQUE_COLS, "timestamp").agg(
        F.array_sort(F.collect_list("rtt")).alias("_rtts_sorted"),
        F.sum("loss").alias("loss"),
        # icmperrors: int(bool(icmptype)) summed over non-null icmptypes
        # (amp_tcpping.py:141-144); all-null -> NULL via SUM semantics
        F.sum(
            F.when(F.col("icmptype").isNotNull(), (F.col("icmptype") != 0).cast("long"))
        ).alias("icmperrors"),
        results_count_expr(F.col("rtt"), F.col("loss")).alias("results"),
        F.first("packet_size_int").alias("packet_size_int"),
    )
    rtts_loss_padded = pad_nulls_expr(
        F.col("_rtts_sorted"), F.coalesce(F.col("loss"), F.lit(0))
    )
    rtts_full = pad_nulls_expr(
        rtts_loss_padded, F.coalesce(F.col("icmperrors"), F.lit(0))
    )
    return agg.select(
        *UNIQUE_COLS,
        "timestamp",
        int_median_expr(F.col("_rtts_sorted")).alias("median"),
        "packet_size_int",
        "loss",
        "results",
        lossrate_expr(F.col("loss"), F.col("results")).alias("lossrate"),
        rtts_full.alias("rtts"),
        "icmperrors",
    )
