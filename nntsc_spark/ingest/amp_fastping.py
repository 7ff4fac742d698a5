"""amp-fastping ingest transform.

Reference behavior (libnntsc/parsers/amp_fastping.py:111-140 _mangle_result):

- runtime truthy and rtt present -> median = int(percentiles[8]),
  lossrate = 1 - samples/packet_count, percentiles kept
- runtime truthy but rtt NULL    -> median NULL, lossrate 1.0, percentiles []
- runtime falsy                  -> everything NULL

Raw input: source, timestamp, destination, address, packet_size,
packet_rate, packet_count, preprobe, runtime, samples,
percentiles array<double> (nullable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import family_expr, truthy

UNIQUE_COLS = [
    "source",
    "destination",
    "family",
    "packet_size",
    "packet_rate",
    "packet_count",
    "preprobe",
]


def process_fastping(raw: DataFrame) -> DataFrame:
    ran = truthy(F.col("runtime"))
    has_rtt = F.col("percentiles").isNotNull()
    return raw.select(
        "source",
        "destination",
        family_expr("address").alias("family"),
        "packet_size",
        "packet_rate",
        "packet_count",
        "preprobe",
        "timestamp",
        F.when(ran & has_rtt, F.element_at("percentiles", 9).cast("long")).alias(
            "median"
        ),
        F.when(ran & has_rtt, F.transform("percentiles", lambda x: x.cast("long")))
        .when(ran & ~has_rtt, F.array().cast("array<long>"))
        .alias("percentiles"),
        F.when(
            ran & has_rtt,
            1.0 - F.col("samples") / F.col("packet_count").cast("double"),
        )
        .when(ran & ~has_rtt, F.lit(1.0))
        .alias("lossrate"),
    )
