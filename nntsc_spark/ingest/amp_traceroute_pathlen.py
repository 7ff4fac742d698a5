"""amp-traceroute_pathlen ingest: per-batch modal path length.

Reference behavior (libnntsc/parsers/amp_traceroute_pathlen.py:63-155):
each result's path length gets a half-step marker for incomplete paths —

- empty path                      -> 0.5
- trailing unresponsive hops      -> length + 0.5 - trailing_null_count
- complete path                   -> length + 0.0
- no path at all (test failed)    -> NULL

then one fact row per (stream, batch) with the most frequent length.
Tie-break deviation (documented): the reference breaks count ties by dict
insertion order (first length to reach the max count); we break ties by the
smallest length, which is deterministic under distribution.  NULL lengths
never win (the reference only assigns ``modelen`` from non-None values).

Raw input: source, timestamp, target, address, packet_size, random,
length long, path array<string> (nullable elements), ip long, as long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .amp_icmp import icmp_stream_props

UNIQUE_COLS = ["source", "destination", "family", "packet_size"]


def path_length_expr() -> Column:
    """The half-step length marker (amp_traceroute_pathlen.py:95-121)."""
    path = F.col("path")
    # count trailing NULL hops via a fold over the reversed path
    trailing = F.aggregate(
        F.reverse(path),
        F.struct(F.lit(0).alias("n"), F.lit(True).alias("run")),
        lambda acc, x: F.struct(
            F.when(acc["run"] & x.isNull(), acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            (acc["run"] & x.isNull()).alias("run"),
        ),
    )["n"]
    return (
        F.when(path.isNull(), F.lit(None).cast("double"))
        .when(F.size(path) == 0, F.lit(0.5))
        .when(
            F.element_at(path, -1).isNull(),
            F.col("length").cast("double") + 0.5 - trailing.cast("double"),
        )
        .otherwise(F.col("length").cast("double"))
    )


def process_pathlen(raw: DataFrame) -> DataFrame:
    """One row per (stream, timestamp): modal path_length + unused pad."""
    df = icmp_stream_props(raw)
    ip_mode = F.col("ip").isNull() | (F.col("ip") != 0)
    df = df.where(ip_mode).withColumn("path_length_val", path_length_expr())
    keys = [*UNIQUE_COLS, "timestamp"]
    counted = (
        df.groupBy(*keys, "path_length_val")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    nonnull = counted.where(F.col("path_length_val").isNotNull())
    winner = nonnull.groupBy(*keys).agg(
        F.min_by(
            F.col("path_length_val"),
            F.struct((-F.col("_cnt")).alias("n"), F.col("path_length_val")),
        ).alias("path_length")
    )
    # keys with only-NULL lengths still emit a row with NULL path_length
    all_keys = counted.select(*keys).dropDuplicates(keys)
    return (
        all_keys.join(winner, keys, "left")
        .withColumn("unused", F.lit(True))
    )
