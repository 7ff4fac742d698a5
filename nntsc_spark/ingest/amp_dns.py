"""amp-dns ingest transform.

Reference behavior (libnntsc/parsers/amp_dns.py:118-160): one fact row per
result (no batch aggregation), with the tri-state requests/lossrate rule:

- query_len not NULL and response_size not NULL -> requests=1, lossrate=0.0
- query_len not NULL and response_size NULL     -> requests=1, lossrate=1.0
- query_len NULL (query never sent)             -> requests=0, lossrate=NULL

and only the FIRST result per stream per batch is kept (``if stream_id in
done: continue``, amp_dns.py:126-129).

Raw input: one row per result with stream cols (source, destination,
instance, address, query, query_type, query_class, udp_payload_size,
recurse, dnssec, nsid) + data cols (response_size, rtt, ttl, query_len,
total_answer, total_authority, total_additional, opcode, rcode, flag_*).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

UNIQUE_COLS = [
    "source",
    "destination",
    "query",
    "address",
    "query_type",
    "query_class",
    "udp_payload_size",
    "recurse",
    "dnssec",
    "nsid",
    "instance",
]

DATA_COLS = [
    "response_size",
    "rtt",
    "ttl",
    "query_len",
    "total_answer",
    "total_authority",
    "total_additional",
    "opcode",
    "rcode",
    "flag_rd",
    "flag_tc",
    "flag_aa",
    "flag_qr",
    "flag_cd",
    "flag_ad",
    "flag_ra",
]


def process_dns(raw: DataFrame) -> DataFrame:
    if "_msg_order" not in raw.columns:
        # surfaced, not silent (r5 advice): without a real arrival-order
        # column the (stream, timestamp) collision winner is the
        # lexicographically-smallest result by content, which can differ
        # from the reference's first-received-wins on replayed data.
        # Sources that care thread one through — decode_kafka_batch emits
        # _msg_order = struct(partition, offset) automatically.
        log.warning(
            "process_dns: no _msg_order column on input; first-result-wins "
            "falls back to deterministic content order (may differ from "
            "arrival order)"
        )
    sent = F.col("query_len").isNotNull()
    answered = F.col("response_size").isNotNull()
    derived = raw.select(
        *UNIQUE_COLS,
        "timestamp",
        *[c for c in DATA_COLS if c in raw.columns],
        F.when(sent, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("requests"),
        F.when(sent & answered, F.lit(0.0))
        .when(sent & ~answered, F.lit(1.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("lossrate"),
        # "first result" order: the source's message-order column when it
        # provides one (e.g. a kafka offset threaded through as
        # _msg_order), else a CONTENT-based total order.  The previous
        # monotonically_increasing_id encoded (partition, row) — not input
        # order, and a task retry could elect a different winner than the
        # first attempt (r5 review finding).
        (
            F.col("_msg_order")
            if "_msg_order" in raw.columns
            else F.struct(*[F.col(c) for c in DATA_COLS if c in raw.columns])
        ).alias("_order"),
    )
    # first result per (stream, timestamp) wins (amp_dns.py:126-129)
    w = Window.partitionBy(*UNIQUE_COLS, "timestamp").orderBy("_order")
    return (
        derived.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_order")
    )
