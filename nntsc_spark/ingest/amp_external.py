"""amp-external ingest transform (result explosion + destination fallback).

Reference behavior (libnntsc/parsers/amp_external.py:90-117 process_data):
each result in ``data['results']`` becomes one fact row carrying

- ``source``      = the message source
- ``command``     = ``data['command']``
- ``destination`` = ``result['destination']``, falling back to the source
  when NULL ("if the test had no destination, use the source as the
  destination", amp_external.py:96-99)
- ``value``       = ``result['value']`` (nullable integer — the only data
  column, amp_external.py:60-62)

Spark-first: ``explode(results)`` + ``coalesce(destination, source)`` —
pure codegen projection.

Raw input schema (one row per AMP message):
``source string, timestamp long, command string,
results array<struct<destination string, value bigint>>``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stream identity columns (amp_external.py:30-35 uniquecolumns)
UNIQUE_COLS = ["source", "destination", "command"]


def process_external(raw: DataFrame) -> DataFrame:
    """Explode nested external results into one fact row per result."""
    res = raw.select(
        "source", "timestamp", "command", F.explode("results").alias("res")
    )
    return res.select(
        "source",
        F.coalesce(F.col("res.destination"), F.col("source")).alias("destination"),
        "command",
        "timestamp",
        F.col("res.value").alias("value"),
    )
