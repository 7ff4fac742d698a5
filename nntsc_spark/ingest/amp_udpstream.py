"""amp-udpstream ingest transform (nested result explosion).

Reference behavior (libnntsc/parsers/amp_udpstream.py:140-205 process_data):
each AMP message carries ``data['results']`` — one entry per direction — and
the parser emits one fact row per entry:

- ``mean_rtt``    = ``result['rtt']['mean']``            (NULL if rtt absent)
- ``mean/min/max_jitter`` from the ``jitter`` struct     (NULL if absent)
- ``packets_recvd`` = ``result['packets_received']``     (may be NULL)
- ``packets_sent``  = ``data['packet_count']`` when packets_recvd is not
  NULL, else NULL (amp_udpstream.py:166-173 — "no packets received with no
  loss periods means none were sent")
- ``lossrate``    = ``result['loss_percent']``
- ``itu_mos``     = ``result['voip']['itu_mos']``        (NULL if absent)
- ``jitter_percentile_10..100``: when the result carries >= 10 percentiles
  the first ten are taken verbatim (amp_udpstream.py:196-205); when it
  carries 1..9 they are resampled by index ``int(k * step)`` with
  ``step = len/10`` (amp_udpstream.py:184-195 — the float accumulation
  ``ind += step`` is exactly ``k*len//10`` for len < 10, verified against
  the reference loop for every length); when empty, all ten are NULL.

Spark-first: the per-message Python loop becomes a single
``posexplode``-free ``explode(results)`` projection — all column extraction
is struct field access that stays in whole-stage codegen, and NULL structs
propagate NULL fields for free (matching the reference's "key absent" rows).

Raw input schema (one row per AMP message):
``source string, timestamp long, target string, address string,
packet_size long, packet_spacing long, packet_count long, dscp string,
results array<struct<direction string, rtt struct<mean bigint>,
jitter struct<mean bigint, minimum bigint, maximum bigint>,
packets_received bigint, loss_percent double,
voip struct<itu_mos double>, percentiles array<bigint>>>``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stream identity columns (amp_udpstream.py:105-117 _construct_key)
UNIQUE_COLS = [
    "source", "destination", "address", "direction",
    "packet_size", "packet_spacing", "packet_count", "dscp",
]

DATA_COLS = [
    "mean_rtt", "mean_jitter", "min_jitter", "max_jitter",
    *[f"jitter_percentile_{p}" for p in range(10, 101, 10)],
    "packets_sent", "packets_recvd", "itu_mos", "lossrate", "unused",
]


def _pct(k: int):
    """jitter_percentile_{(k+1)*10} extraction (amp_udpstream.py:184-205).

    Built as parsed SQL text: the when/when Column form cost ~8 Py4J round
    trips per bucket × 10 buckets, a measurable slice of plan-construction
    time for a transform that is otherwise pure field access."""
    return F.expr(
        f"CAST(CASE WHEN size(res.percentiles) >= 10"
        f" THEN element_at(res.percentiles, {k + 1})"
        f" WHEN size(res.percentiles) > 0"
        f" THEN element_at(res.percentiles, CAST("
        f"floor({k} * size(res.percentiles) / 10) + 1 AS INT))"
        f" END AS BIGINT)"
    )


def process_udpstream(raw: DataFrame) -> DataFrame:
    """Explode nested udpstream results into one fact row per direction."""
    res = raw.select(
        "source",
        "timestamp",
        F.col("target").alias("destination"),
        "address",
        "packet_size",
        "packet_spacing",
        "packet_count",
        "dscp",
        F.explode("results").alias("res"),
    )
    recvd = F.col("res.packets_received")
    return res.select(
        "source",
        "destination",
        "address",
        F.col("res.direction").cast("string").alias("direction"),
        "packet_size",
        "packet_spacing",
        "packet_count",
        "dscp",
        "timestamp",
        F.col("res.rtt.mean").alias("mean_rtt"),
        F.col("res.jitter.mean").alias("mean_jitter"),
        F.col("res.jitter.minimum").alias("min_jitter"),
        F.col("res.jitter.maximum").alias("max_jitter"),
        *[_pct(k).alias(f"jitter_percentile_{(k + 1) * 10}") for k in range(10)],
        F.when(recvd.isNotNull(), F.col("packet_count")).alias("packets_sent"),
        recvd.alias("packets_recvd"),
        F.col("res.voip.itu_mos").alias("itu_mos"),
        F.col("res.loss_percent").cast("double").alias("lossrate"),
        F.lit(True).alias("unused"),
    )
