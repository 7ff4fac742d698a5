"""amp-throughput ingest transform.

Reference behavior (libnntsc/parsers/amp_throughput.py:101-160): one fact
row per result; ``rate = bytes / runtime`` with the 0-vs-None distinction:
runtime NULL -> rate NULL; runtime == 0 -> rate 0.0; else bytes/runtime.
``unused`` pads all-null rows for the Influx path (amp_throughput.py:70-72)
and is always True.

Raw input: source, timestamp, target, address, protocol, direction,
duration, runtime, bytes, packets, write_size, tcpreused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIQUE_COLS = [
    "source",
    "destination",
    "direction",
    "duration",
    "writesize",
    "tcpreused",
    "protocol",
]


def process_throughput(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("source"),
        F.col("target").alias("destination"),
        F.col("address"),
        F.col("direction"),
        F.col("duration"),
        F.col("write_size").alias("writesize"),
        F.col("tcpreused"),
        F.col("protocol"),
        F.col("timestamp"),
        F.col("bytes"),
        F.col("packets"),
        F.when(F.col("runtime").isNull(), F.lit(None).cast("double"))
        .when(F.col("runtime") == 0, F.lit(0.0))
        .otherwise(F.col("bytes") / F.col("runtime").cast("double"))
        .alias("rate"),
        F.col("runtime"),
        F.lit(True).alias("unused"),
    )
