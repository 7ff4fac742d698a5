"""rrd-smokeping ingest transform.

Reference behavior (libnntsc/parsers/rrd_smokeping.py:99-136 process_data):
each RRD fetch row is ``(uptime, loss, median, ping1..ping20)`` in SECONDS;
median and pings are converted to milliseconds via ``round(x * 1000, 6)``;
``pingsent`` = number of ping slots in the row; lossrate = loss/pingsent
(NULL when no pings or loss is NULL).  Ping slots may be NULL and stay NULL
(kept in position, unlike the icmp sort-and-pad scheme).

Raw input: stream identity cols (filename, source, host, family, minres,
highrows) + timestamp + loss double, median double,
pings array<double> (element per slot, nullable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIQUE_COLS = ["filename"]


def process_smokeping(raw: DataFrame) -> DataFrame:
    sent = F.coalesce(F.size("pings"), F.lit(0))
    return raw.select(
        "filename",
        "source",
        "host",
        "family",
        "minres",
        "highrows",
        "timestamp",
        F.col("loss").cast("double").cast("long").alias("loss"),
        sent.cast("long").alias("pingsent"),
        F.round(F.col("median") * 1000.0, 6).alias("median"),
        F.transform("pings", lambda p: F.round(p * 1000.0, 6)).alias("pings"),
        F.when(
            (sent > 0) & F.col("loss").isNotNull(),
            F.col("loss").cast("double").cast("long") / sent.cast("double"),
        ).alias("lossrate"),
    )
