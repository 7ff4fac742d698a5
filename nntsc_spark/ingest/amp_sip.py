"""amp-sip ingest transform (per-direction result fan-out).

Reference behavior (libnntsc/parsers/amp_sip.py:157-200 process_data): each
result in ``data['results']`` fans out into TWO fact rows — one per
direction in ``['rx', 'tx']`` ("fake two different result blocks, one for
each direction").  Shared fields (response_time/connect_time/duration and
the four rtt stats) repeat on both rows; the packets/bytes/lost/discarded/
reordered/duplicated/mos block comes from ``result['rx']`` or
``result['tx']`` respectively and is NULL when that direction's struct is
absent (amp_sip.py:185-193).

- ``destination``   = ``data['uri']``          (amp_sip.py:166)
- ``proxy``         = ``",".join(data['proxy'])`` (amp_sip.py:167)
- ``response_time`` = ``result['time_till_first_response']``
- ``connect_time``  = ``result['time_till_connected']``
- ``rtt_max/min/mean/sd`` from the ``rtt`` struct (NULL if absent)
- ``mos``           = ``result[direction]['mos']['itu_mos']``

Spark-first: the direction loop becomes ``explode(array(struct('rx', rx),
struct('tx', tx)))`` — one codegen projection, no Python row loop; NULL
structs propagate NULL fields exactly like the reference's absent keys.

Raw input schema (one row per AMP message):
``source string, timestamp long, uri string, proxy array<string>,
address string, filename string, repeat boolean, max_duration bigint,
dscp string, results array<struct<time_till_first_response bigint,
time_till_connected bigint, duration bigint,
rtt struct<maximum bigint, minimum bigint, mean bigint, sd bigint>,
rx struct<packets bigint, bytes bigint, lost bigint, discarded bigint,
reordered bigint, duplicated bigint, mos struct<itu_mos double>>,
tx <same as rx>>>``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stream identity columns (amp_sip.py:123-135 _construct_key)
UNIQUE_COLS = [
    "source", "destination", "proxy", "address", "direction",
    "filename", "repeat", "max_duration", "dscp",
]

_DIR_FIELDS = ["packets", "bytes", "lost", "discarded", "reordered", "duplicated"]


def process_sip(raw: DataFrame) -> DataFrame:
    """Explode nested sip results into one fact row per result x direction."""
    res = raw.select(
        "source",
        "timestamp",
        F.col("uri").alias("destination"),
        F.array_join("proxy", ",").alias("proxy"),
        "address",
        "filename",
        "repeat",
        "max_duration",
        "dscp",
        F.explode("results").alias("res"),
    )
    fanned = res.select(
        "*",
        F.explode(
            F.array(
                F.struct(F.lit("rx").alias("direction"), F.col("res.rx").alias("d")),
                F.struct(F.lit("tx").alias("direction"), F.col("res.tx").alias("d")),
            )
        ).alias("dir"),
    )
    return fanned.select(
        "source",
        "destination",
        "proxy",
        "address",
        F.col("dir.direction").alias("direction"),
        "filename",
        "repeat",
        "max_duration",
        "dscp",
        "timestamp",
        F.col("res.time_till_first_response").alias("response_time"),
        F.col("res.time_till_connected").alias("connect_time"),
        F.col("res.duration").alias("duration"),
        F.col("res.rtt.maximum").alias("rtt_max"),
        F.col("res.rtt.minimum").alias("rtt_min"),
        F.col("res.rtt.mean").alias("rtt_mean"),
        F.col("res.rtt.sd").alias("rtt_sd"),
        *[F.col(f"dir.d.{f}").alias(f) for f in _DIR_FIELDS],
        F.col("dir.d.mos.itu_mos").alias("mos"),
        F.lit(True).alias("unused"),
    )
