"""Kafka streaming source — the production stand-in for the reference's
RabbitMQ consumer (libnntsc/nntsc.py + parsers/amp.py:181-273: one queue per
collection family, bodies are serialized result dicts, commitfreq messages
per transaction).

Spark-first mapping:

- RabbitMQ queue        -> Kafka topic (one per collection family)
- pika consume loop     -> ``spark.readStream.format("kafka")``
- commitfreq batching   -> micro-batch boundaries (maxOffsetsPerTrigger)
- channel ack on commit -> checkpointed offsets (exactly-once into the
                           foreachBatch ingest, which dedups on
                           (stream_id, timestamp) for T4/T5 idempotence)

The connector jar (``spark-sql-kafka-0-10``) is not bundled in this
container, so ``kafka_raw_stream`` only *configures* the reader; the
decode step (Kafka's fixed binary envelope -> typed result rows) is pure
DataFrame logic and is fully tested against a static frame with the same
envelope schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_raw_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 10_000,
):
    """Configured (unstarted) Kafka reader.

    ``maxOffsetsPerTrigger`` is the commitfreq analogue: it bounds
    micro-batch size so foreachBatch transactions stay small and the
    rollup maintainer's touched-bin recompute stays cheap.  Call
    ``.load()`` on the result where the Kafka connector is available.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .options(
            **(
                {"maxOffsetsPerTrigger": str(max_offsets_per_trigger)}
                if max_offsets_per_trigger
                else {}
            )
        )
    )


def decode_kafka_batch(df: DataFrame, schema: StructType) -> DataFrame:
    """Kafka envelope -> typed raw-result rows.

    Input carries Kafka's fixed sink schema (key binary, value binary,
    topic, partition, offset, timestamp, ...); values are JSON-encoded
    result dicts as the reference's queue bodies are serialized dicts.
    Malformed bodies decode to all-NULL structs (from_json PERMISSIVE
    mode) and are dropped (the reference logs-and-skips undecodable
    messages, parsers/amp.py:202-210) — the any-field-present filter stays
    JVM-side end to end.

    The output carries ``_msg_order`` = struct(partition, offset): a REAL
    arrival-order column for first-result-wins parsers (amp_dns,
    amp_traceroute's modal-aspath tie-break).  Kafka offsets are the
    broker's per-partition arrival sequence — with key-partitioned
    streams (a stream's messages share a partition) this reproduces the
    reference's in-order RabbitMQ consumption; cross-partition order is
    arbitrary but stable.  Parsers that don't care ignore it (their
    output selects are explicit).
    """
    decoded = df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r"),
        F.struct("partition", "offset").alias("_msg_order"),
    )
    any_field = None
    for name in schema.fieldNames():
        c = F.col(f"r.{name}").isNotNull()
        any_field = c if any_field is None else (any_field | c)
    return decoded.where(any_field).select("r.*", "_msg_order")
