"""Driver-level oracle checks for the INGEST math (A13/A14/F5).

The parser transforms have golden unit tests, but the driver gate only sees
the ten parquet tables — so this module derives a deterministic raw-icmp
batch FROM the events table and runs the real ``process_icmp`` transform on
it; the DuckDB oracle recomputes the exact same semantics in SQL (integer
truncating median over sorted non-null rtts, loss-padded rtt arrays,
truthy-results counting, lossrate null propagation).

Derivation (pure, engine-independent):
- one raw result per event; batch key = hourly bin
- target  = 'dst' || (stream_id % 5)     (a few streams per batch)
- address = even stream -> '192.0.2.x' (ipv4), odd -> 'fe80::x' (ipv6)
- error events are lost probes (rtt NULL, loss 1); others rtt = value*100
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.amp_icmp import process_icmp
from ..sources.tables import EVENTS_FACT_SQL, events_fact
from .queries import START, STOP

HOUR = 3600


def _derive_raw_icmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = events_fact(spark, sf_dir, START, STOP)
    return fact.select(
        F.lit("amp").alias("source"),
        (F.col("timestamp") - F.col("timestamp") % HOUR).alias("timestamp"),
        F.when(
            F.col("event_type") != "error", F.floor(F.col("value") * 100).cast("long")
        ).alias("rtt"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).cast("long").alias("loss"),
        F.lit(False).alias("random"),
        F.concat(F.lit("dst"), (F.col("stream_id") % 5).cast("string")).alias(
            "target"
        ),
        F.when(
            F.col("stream_id") % 2 == 0,
            F.concat(F.lit("192.0.2."), F.col("stream_id").cast("string")),
        )
        .otherwise(F.concat(F.lit("fe80::"), F.col("stream_id").cast("string")))
        .alias("address"),
        F.lit(84).cast("long").alias("packet_size"),
    )


def q_ingest_icmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13/A14/F5 through the REAL icmp ingest transform."""
    out = process_icmp(_derive_raw_icmp(spark, sf_dir))
    # array_join with null_replacement is the codegen form of the
    # per-element coalesce transform (interpreted HOF)
    rtts_str = F.coalesce(
        F.array_join(F.col("rtts").cast("array<string>"), ",", "null"),
        F.lit(""),
    )
    return out.select(
        "source",
        "destination",
        "family",
        "packet_size",
        "timestamp",
        "median",
        "loss",
        "results",
        F.round("lossrate", 4).alias("lossrate"),
        rtts_str.alias("rtts_str"),
    )


SQL_INGEST_ICMP = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
raw AS (
  SELECT 'amp' AS source,
         timestamp - (timestamp % {HOUR}) AS timestamp,
         CASE WHEN event_type != 'error' THEN CAST(floor(value * 100) AS BIGINT) END AS rtt,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS loss,
         'dst' || CAST(stream_id % 5 AS VARCHAR) AS target,
         CASE WHEN stream_id % 2 = 0
              THEN '192.0.2.' || CAST(stream_id AS VARCHAR)
              ELSE 'fe80::' || CAST(stream_id AS VARCHAR) END AS address
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
), agg AS (
  SELECT source, target AS destination,
         CASE WHEN contains(address, '.') THEN 'ipv4' ELSE 'ipv6' END AS family,
         '84' AS packet_size, timestamp,
         list(rtt ORDER BY rtt) FILTER (WHERE rtt IS NOT NULL) AS sorted_rtts,
         CAST(sum(loss) AS BIGINT) AS loss,
         CAST(sum(CASE WHEN (rtt IS NOT NULL AND rtt != 0) OR loss != 0
                       THEN 1 END) AS BIGINT)
           AS results
  FROM raw
  GROUP BY source, destination, family, packet_size, timestamp
)
SELECT source, destination, family, packet_size, timestamp,
       CASE WHEN len(sorted_rtts) = 0 THEN NULL
            WHEN len(sorted_rtts) % 2 = 1
              THEN sorted_rtts[len(sorted_rtts) // 2 + 1]
            ELSE (sorted_rtts[len(sorted_rtts) // 2]
                  + sorted_rtts[len(sorted_rtts) // 2 + 1]) // 2
       END AS median,
       loss, results,
       round(CASE WHEN results IS NOT NULL AND results != 0
                  THEN loss / CAST(results AS DOUBLE) END, 4) AS lossrate,
       ltrim(coalesce(array_to_string(sorted_rtts, ','), '')
             || repeat(',null', CAST(CASE WHEN loss > 0 THEN loss ELSE 0 END AS BIGINT)),
             ',') AS rtts_str
FROM agg
"""

REGISTRY = {
    "ingest_icmp": (q_ingest_icmp, SQL_INGEST_ICMP),
}


def q_ingest_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 rate semantics through the REAL throughput transform:
    runtime NULL -> rate NULL; runtime 0 -> 0.0; else bytes/runtime."""
    from ..ingest.amp_throughput import process_throughput

    fact = events_fact(spark, sf_dir, START, STOP)
    raw = fact.select(
        F.lit("amp").alias("source"),
        F.col("timestamp"),
        F.concat(F.lit("t"), (F.col("stream_id") % 3).cast("string")).alias("target"),
        F.lit("192.0.2.9").alias("address"),
        F.lit("default").alias("protocol"),
        F.when(F.col("event_type") == "click", "in").otherwise("out").alias("direction"),
        F.lit(10000).cast("long").alias("duration"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("long"))
        .when(F.col("event_type") == "signup", F.lit(0).cast("long"))
        .otherwise(F.floor(F.col("value") * 10).cast("long"))
        .alias("runtime"),
        F.floor(F.col("value") * 1000).cast("long").alias("bytes"),
        F.lit(None).cast("long").alias("packets"),
        F.lit(131072).cast("long").alias("write_size"),
        F.lit(False).alias("tcpreused"),
    )
    out = process_throughput(raw)
    return out.select(
        "destination",
        "direction",
        "timestamp",
        "bytes",
        "runtime",
        F.round("rate", 4).alias("rate"),
        "unused",
    )


SQL_INGEST_THROUGHPUT = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
raw AS (
  SELECT 't' || CAST(stream_id % 3 AS VARCHAR) AS destination,
         CASE WHEN event_type = 'click' THEN 'in' ELSE 'out' END AS direction,
         timestamp,
         CAST(floor(value * 1000) AS BIGINT) AS bytes,
         CASE WHEN event_type = 'error' THEN NULL
              WHEN event_type = 'signup' THEN 0
              ELSE CAST(floor(value * 10) AS BIGINT) END AS runtime
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
)
SELECT destination, direction, timestamp, bytes, runtime,
       round(CASE WHEN runtime IS NULL THEN NULL
                  WHEN runtime = 0 THEN 0.0
                  ELSE bytes / CAST(runtime AS DOUBLE) END, 4) AS rate,
       TRUE AS unused
FROM raw
"""


def q_ingest_dns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 DNS tri-state through the REAL dns transform (unique stream keys
    per event via the instance column, so first-result dedup is a no-op and
    the output is deterministic)."""
    from ..ingest.amp_dns import process_dns

    fact = events_fact(spark, sf_dir, START, STOP)
    raw = fact.select(
        F.lit("amp").alias("source"),
        F.col("timestamp"),
        F.concat(F.lit("ns"), (F.col("stream_id") % 7).cast("string")).alias(
            "destination"
        ),
        F.col("event_id").cast("string").alias("instance"),
        F.lit("192.0.2.53").alias("address"),
        F.lit("example.com").alias("query"),
        F.lit("AAAA").alias("query_type"),
        F.lit("IN").alias("query_class"),
        F.lit(4096).cast("long").alias("udp_payload_size"),
        F.lit(True).alias("recurse"),
        F.lit(False).alias("dnssec"),
        F.lit(False).alias("nsid"),
        F.when(F.col("event_type") != "error", F.lit(40).cast("long")).alias(
            "query_len"
        ),
        F.when(
            ~F.col("event_type").isin("error", "signup"), F.lit(100).cast("long")
        ).alias("response_size"),
        F.floor(F.col("value") * 1000).cast("long").alias("rtt"),
    )
    out = process_dns(raw)
    return out.select(
        "destination",
        "instance",
        "timestamp",
        "requests",
        "lossrate",
        "rtt",
    )


SQL_INGEST_DNS = f"""
WITH fact AS ({EVENTS_FACT_SQL})
SELECT 'ns' || CAST(stream_id % 7 AS VARCHAR) AS destination,
       CAST(event_id AS VARCHAR) AS instance,
       timestamp,
       CASE WHEN event_type != 'error' THEN 1 ELSE 0 END AS requests,
       CAST(CASE WHEN event_type NOT IN ('error', 'signup') THEN 0.0
                 WHEN event_type = 'signup' THEN 1.0
                 ELSE NULL END AS DOUBLE) AS lossrate,
       CAST(floor(value * 1000) AS BIGINT) AS rtt
FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
"""

REGISTRY.update(
    {
        "ingest_throughput": (q_ingest_throughput, SQL_INGEST_THROUGHPUT),
        "ingest_dns": (q_ingest_dns, SQL_INGEST_DNS),
    }
)


def q_ingest_fastping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """amp_fastping.py:111-140 tri-state through the REAL fastping
    transform: runtime falsy -> all NULL; runtime truthy + percentiles NULL
    -> median NULL / lossrate 1.0 / percentiles []; else median =
    percentiles[8] and lossrate = 1 - samples/packet_count."""
    from ..ingest.amp_fastping import process_fastping

    fact = events_fact(spark, sf_dir, START, STOP)
    raw = fact.select(
        F.lit("amp").alias("source"),
        F.col("timestamp"),
        F.concat(F.lit("fp"), (F.col("stream_id") % 4).cast("string")).alias(
            "destination"
        ),
        F.when(F.col("stream_id") % 2 == 0, F.lit("198.51.100.7"))
        .otherwise(F.lit("2001:db8::7"))
        .alias("address"),
        F.lit(64).cast("long").alias("packet_size"),
        F.lit(1000).cast("long").alias("packet_rate"),
        F.lit(64).cast("long").alias("packet_count"),
        F.lit(False).alias("preprobe"),
        F.when(F.col("event_type") == "error", F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("runtime"),
        (F.floor(F.col("value") * 10) % 65).cast("long").alias("samples"),
        F.when(
            F.col("event_type") != "signup",
            # literal-index array stays in codegen (vs interpreted
            # transform(sequence))
            F.array(
                *[
                    (F.floor(F.col("value") * 1000) + i * 3).cast("double")
                    for i in range(24)
                ]
            ),
        ).alias("percentiles"),
    )
    out = process_fastping(raw)
    return out.select(
        "destination",
        "family",
        "timestamp",
        "median",
        F.round("lossrate", 4).alias("lossrate"),
        F.coalesce(
            F.array_join(F.col("percentiles").cast("array<string>"), ","),
            F.lit(""),
        ).alias("perc_str"),
    )


SQL_INGEST_FASTPING = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
raw AS (
  SELECT 'fp' || CAST(stream_id % 4 AS VARCHAR) AS destination,
         CASE WHEN stream_id % 2 = 0 THEN 'ipv4' ELSE 'ipv6' END AS family,
         timestamp, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS base,
         CAST(floor(value * 10) AS BIGINT) % 65 AS samples
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
)
SELECT destination, family, timestamp,
       CASE WHEN event_type NOT IN ('error', 'signup') THEN base + 24
            END AS median,
       round(CASE WHEN event_type = 'error' THEN NULL
                  WHEN event_type = 'signup' THEN 1.0
                  ELSE 1.0 - samples / 64.0 END, 4) AS lossrate,
       CASE WHEN event_type = 'error' OR event_type = 'signup' THEN ''
            ELSE array_to_string(
              list_transform(generate_series(0, 23), i -> base + i * 3), ',')
            END AS perc_str
FROM raw
"""

REGISTRY["ingest_fastping"] = (q_ingest_fastping, SQL_INGEST_FASTPING)


def q_ingest_smokeping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 seconds->ms conversion through the REAL smokeping transform:
    round(x*1000, 6) on median and every ping slot, NULL slots kept in
    position, pingsent = slot count, lossrate tri-state."""
    from ..ingest.rrd_smokeping import process_smokeping

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    raw = fact.select(
        F.concat(F.lit("sp"), (sid % 3).cast("string"), F.lit(".rrd")).alias(
            "filename"
        ),
        F.lit("smokesrv").alias("source"),
        F.concat(F.lit("h"), (sid % 3).cast("string")).alias("host"),
        F.lit("ipv4").alias("family"),
        F.lit(300).cast("long").alias("minres"),
        F.lit(1008).cast("long").alias("highrows"),
        F.col("timestamp"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .when(F.col("event_type") == "signup", F.lit(20.0))
        .otherwise((F.floor(F.col("value")) % 5).cast("double"))
        .alias("loss"),
        F.when(F.col("event_type") != "error", F.col("value") / 1000).alias(
            "median"
        ),
        F.when(F.col("event_type") == "signup", F.array().cast("array<double>"))
        .when(F.col("event_type") == "error", F.lit(None).cast("array<double>"))
        .otherwise(
            F.array(
                *[
                    F.when((sid + i) % 7 != 0, F.col("value") / 1000 + i * 0.001)
                    for i in range(20)
                ]
            )
        )
        .alias("pings"),
    )
    out = process_smokeping(raw)
    return out.select(
        "filename",
        "timestamp",
        "loss",
        "pingsent",
        F.col("median").alias("median_ms"),
        F.round("lossrate", 4).alias("lossrate"),
        F.round(F.get("pings", 0), 6).alias("ping_first"),
        F.round(F.get("pings", 19), 6).alias("ping_last"),
        F.when(
            F.col("pings").isNotNull(),
            F.size("pings") - F.size(F.array_compact("pings")),
        ).alias("n_null_pings"),
    )


SQL_INGEST_SMOKEPING = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
raw AS (
  SELECT 'sp' || CAST(stream_id % 3 AS VARCHAR) || '.rrd' AS filename,
         timestamp, stream_id, event_type, value
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
)
SELECT filename, timestamp,
       CASE WHEN event_type = 'error' THEN NULL
            WHEN event_type = 'signup' THEN 20
            ELSE CAST(floor(value) % 5 AS BIGINT) END AS loss,
       CASE WHEN event_type = 'signup' THEN 0
            WHEN event_type = 'error' THEN 0
            ELSE 20 END AS pingsent,
       CASE WHEN event_type != 'error'
            THEN round((value / 1000) * 1000, 6) END AS median_ms,
       round(CASE WHEN event_type NOT IN ('error', 'signup')
                  THEN CAST(floor(value) % 5 AS BIGINT) / 20.0
             END, 4) AS lossrate,
       CASE WHEN event_type NOT IN ('error', 'signup') AND stream_id % 7 != 0
            THEN round((value / 1000 + 0 * 0.001) * 1000, 6) END AS ping_first,
       CASE WHEN event_type NOT IN ('error', 'signup')
                 AND (stream_id + 19) % 7 != 0
            THEN round((value / 1000 + 19 * 0.001) * 1000, 6) END AS ping_last,
       CASE WHEN event_type = 'signup' THEN 0
            WHEN event_type = 'error' THEN NULL
            ELSE len(list_filter(generate_series(0, 19),
                                 i -> (stream_id + i) % 7 = 0)) END
         AS n_null_pings
FROM raw
"""

REGISTRY["ingest_smokeping"] = (q_ingest_smokeping, SQL_INGEST_SMOKEPING)


def q_ingest_tcpping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """amp_tcpping.py:128-175 through the REAL tcpping transform: per-batch
    integer median, icmperrors = count of non-zero icmptypes, rtt array
    padded with NULLs for losses THEN for icmp errors."""
    from ..ingest.amp_tcpping import process_tcpping

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    raw = fact.select(
        F.lit("amp").alias("source"),
        (F.col("timestamp") - F.col("timestamp") % HOUR).alias("timestamp"),
        F.when(
            ~F.col("event_type").isin("error", "signup"),
            F.floor(F.col("value") * 100).cast("long"),
        ).alias("rtt"),
        F.when(F.col("event_type") == "error", 1)
        .otherwise(0)
        .cast("long")
        .alias("loss"),
        F.lit(False).alias("random"),
        F.concat(F.lit("tp"), (sid % 5).cast("string")).alias("target"),
        F.when(
            sid % 2 == 0,
            F.concat(F.lit("192.0.2."), sid.cast("string")),
        )
        .otherwise(F.concat(F.lit("fe80::"), sid.cast("string")))
        .alias("address"),
        F.lit(64).cast("long").alias("packet_size"),
        (80 + sid % 3).cast("long").alias("port"),
        F.when(F.col("event_type") == "signup", 3)
        .otherwise(0)
        .cast("long")
        .alias("icmptype"),
    )
    out = process_tcpping(raw)
    rtts_str = F.coalesce(
        F.array_join(F.col("rtts").cast("array<string>"), ",", "null"),
        F.lit(""),
    )
    return out.select(
        "destination",
        "port",
        "family",
        "timestamp",
        "median",
        "loss",
        "icmperrors",
        "results",
        F.round("lossrate", 4).alias("lossrate"),
        rtts_str.alias("rtts_str"),
    )


SQL_INGEST_TCPPING = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
raw AS (
  SELECT timestamp - (timestamp % {HOUR}) AS timestamp,
         CASE WHEN event_type NOT IN ('error', 'signup')
              THEN CAST(floor(value * 100) AS BIGINT) END AS rtt,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS loss,
         'tp' || CAST(stream_id % 5 AS VARCHAR) AS destination,
         CAST(80 + stream_id % 3 AS VARCHAR) AS port,
         CASE WHEN stream_id % 2 = 0 THEN 'ipv4' ELSE 'ipv6' END AS family,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS icmperr
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
), agg AS (
  SELECT destination, port, family, timestamp,
         list(rtt ORDER BY rtt) FILTER (WHERE rtt IS NOT NULL) AS sorted_rtts,
         CAST(sum(loss) AS BIGINT) AS loss,
         CAST(sum(icmperr) AS BIGINT) AS icmperrors,
         CAST(sum(CASE WHEN (rtt IS NOT NULL AND rtt != 0) OR loss != 0
                       THEN 1 END) AS BIGINT)
           AS results
  FROM raw
  GROUP BY destination, port, family, timestamp
)
SELECT destination, port, family, timestamp,
       CASE WHEN len(sorted_rtts) = 0 THEN NULL
            WHEN len(sorted_rtts) % 2 = 1
              THEN sorted_rtts[len(sorted_rtts) // 2 + 1]
            ELSE (sorted_rtts[len(sorted_rtts) // 2]
                  + sorted_rtts[len(sorted_rtts) // 2 + 1]) // 2
       END AS median,
       loss, icmperrors, results,
       round(CASE WHEN results IS NOT NULL AND results != 0
                  THEN loss / CAST(results AS DOUBLE) END, 4) AS lossrate,
       ltrim(coalesce(array_to_string(sorted_rtts, ','), '')
             || repeat(',null', CAST(CASE WHEN loss > 0 THEN loss ELSE 0 END AS BIGINT))
             || repeat(',null', CAST(CASE WHEN icmperrors > 0 THEN icmperrors ELSE 0 END AS BIGINT)),
             ',') AS rtts_str
FROM agg
"""

REGISTRY["ingest_tcpping"] = (q_ingest_tcpping, SQL_INGEST_TCPPING)


EMPTY_HOPS = "array<struct<address:string,rtt:bigint,asn:bigint>>"


def q_ingest_pathlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/F7 through the REAL pathlen transform: half-step markers for
    incomplete paths (empty -> 0.5, trailing unresponsive hops ->
    length + 0.5 - trailing) and per-batch modal length with
    smallest-length tie-break (amp_traceroute_pathlen.py:63-155).

    Derivation: path shape varies per event (n = 1 + floor(value*100)%5
    hops, t = min(floor(value*10)%3, n) trailing NULL hops; 'error'
    events have no path, 'signup' events an empty path) so each batch
    genuinely votes among several candidate lengths.
    """
    from ..ingest.amp_traceroute_pathlen import process_pathlen

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    n = (F.lit(1).cast("long") + F.floor(F.col("value") * 100) % 5).alias("n")
    t = F.least(F.floor(F.col("value") * 10) % 3, n)
    # slice of a literal max-length array (n <= 5, t <= 2) stays in codegen;
    # slice length 0 yields the empty array the old otherwise() produced
    real_part = F.slice(
        F.array(*[F.lit(f"hop{i}") for i in range(1, 6)]), 1, (n - t).cast("int")
    )
    null_part = F.slice(
        F.array(*[F.lit(None).cast("string")] * 2), 1, t.cast("int")
    )
    raw = fact.select(
        F.lit("amp").alias("source"),
        (F.col("timestamp") - F.col("timestamp") % HOUR).alias("timestamp"),
        F.concat(F.lit("dst"), (sid % 5).cast("string")).alias("target"),
        F.when(
            sid % 2 == 0, F.concat(F.lit("192.0.2."), sid.cast("string"))
        )
        .otherwise(F.concat(F.lit("fe80::"), sid.cast("string")))
        .alias("address"),
        F.lit(60).cast("long").alias("packet_size"),
        F.lit(False).alias("random"),
        F.lit(1).cast("long").alias("ip"),
        F.when(F.col("event_type") == "signup", F.lit(0).cast("long"))
        .when(F.col("event_type") != "error", n)
        .alias("length"),
        F.when(
            F.col("event_type") == "signup", F.array().cast("array<string>")
        )
        .when(F.col("event_type") != "error", F.concat(real_part, null_part))
        .alias("path"),
    )
    out = process_pathlen(raw)
    return out.select(
        "source",
        "destination",
        "family",
        "packet_size",
        "timestamp",
        F.col("path_length").cast("double").alias("path_length"),
        "unused",
    )


SQL_INGEST_PATHLEN = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
plens AS (
  SELECT 'amp' AS source,
         'dst' || CAST(stream_id % 5 AS VARCHAR) AS destination,
         CASE WHEN stream_id % 2 = 0 THEN 'ipv4' ELSE 'ipv6' END AS family,
         '60' AS packet_size,
         timestamp - (timestamp % {HOUR}) AS timestamp,
         CASE WHEN event_type = 'error' THEN NULL
              WHEN event_type = 'signup' THEN 0.5
              WHEN least(CAST(floor(value * 10) AS BIGINT) % 3,
                         1 + CAST(floor(value * 100) AS BIGINT) % 5) > 0
                THEN (1 + CAST(floor(value * 100) AS BIGINT) % 5) + 0.5
                     - least(CAST(floor(value * 10) AS BIGINT) % 3,
                             1 + CAST(floor(value * 100) AS BIGINT) % 5)
              ELSE CAST(1 + CAST(floor(value * 100) AS BIGINT) % 5 AS DOUBLE)
         END AS plen
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
), counted AS (
  SELECT source, destination, family, packet_size, timestamp, plen,
         count(*) AS c
  FROM plens
  GROUP BY ALL
), winner AS (
  SELECT source, destination, family, packet_size, timestamp, plen,
         row_number() OVER (
           PARTITION BY source, destination, family, packet_size, timestamp
           ORDER BY c DESC, plen ASC) AS rn
  FROM counted WHERE plen IS NOT NULL
)
SELECT k.source, k.destination, k.family, k.packet_size, k.timestamp,
       CAST(w.plen AS DOUBLE) AS path_length, TRUE AS unused
FROM (SELECT DISTINCT source, destination, family, packet_size, timestamp
      FROM counted) k
LEFT JOIN (SELECT * FROM winner WHERE rn = 1) w
  USING (source, destination, family, packet_size, timestamp)
"""

REGISTRY["ingest_pathlen"] = (q_ingest_pathlen, SQL_INGEST_PATHLEN)


def q_ingest_astraceroute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/A16 through the REAL astraceroute transform: RLE AS-path encoding
    (run merge across hop groups, trailing -1 null-AS run excluded from
    ``responses``), dictionary interning, per-batch most-common path, and
    the addresses/errors counters (amp_traceroute.py:588-659).

    Derivation: run shape depends only on the stream key (d = stream %% 5,
    p = parity) so every result in a batch carries the SAME AS path — the
    most-common winner is unique and the oracle can build the RLE string
    analytically.  Even streams repeat one ASN across both hop groups
    (runs merge); odd streams switch ASN (two runs); d %% 3 == 0 streams
    append an unresponsive -1 hop (trailing run trimmed from responses).
    """
    from ..ingest.amp_traceroute import process_astraceroute

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    d = sid % 5
    p = sid % 2
    a = (F.lit(100).cast("long") + d).alias("a")
    r1 = (F.lit(1).cast("long") + d % 3).alias("r1")
    r2 = ((d + p) % 4).alias("r2")
    basn = F.when(p == 0, a).otherwise(a + 1)
    errhop = d % 3 == 0
    is_err = F.col("event_type") == "error"

    def hop_group(count, prefix, asn):
        # slice(array(...)) of the max-3 hop structs stays in codegen
        structs = [
            F.struct(
                F.concat(F.lit(prefix), d.cast("string"), F.lit(f".{i}")).alias(
                    "address"
                ),
                F.lit(i * 10).cast("bigint").alias("rtt"),
                asn.cast("bigint").alias("asn"),
            )
            for i in range(1, 4)
        ]
        return F.slice(F.array(*structs), 1, count.cast("int"))

    hops = F.concat(
        hop_group(r1, "10.0.", a),
        F.when(r2 > 0, hop_group(r2, "10.1.", basn)).otherwise(
            F.array().cast(EMPTY_HOPS)
        ),
        F.when(
            errhop,
            F.array(
                F.struct(
                    F.lit(None).cast("string").alias("address"),
                    F.lit(None).cast("bigint").alias("rtt"),
                    F.lit(-1).cast("bigint").alias("asn"),
                )
            ),
        ).otherwise(F.array().cast(EMPTY_HOPS)),
    )
    raw = fact.select(
        F.lit("amp").alias("source"),
        (F.col("timestamp") - F.col("timestamp") % HOUR).alias("timestamp"),
        F.concat(F.lit("dst"), d.cast("string")).alias("target"),
        F.when(is_err, F.when(p == 0, F.lit("0.0.0.0")).otherwise(F.lit("::")))
        .otherwise(
            F.when(
                p == 0, F.concat(F.lit("192.0.2."), d.cast("string"))
            ).otherwise(F.concat(F.lit("fe80::"), d.cast("string")))
        )
        .alias("address"),
        F.lit(60).cast("long").alias("packet_size"),
        F.lit(False).alias("random"),
        F.when(is_err, F.lit(1).cast("long")).alias("error_type"),
        F.lit(None).cast("long").alias("error_code"),
        F.lit(0).cast("long").alias("ip"),
        F.lit(1).cast("long").alias("as"),
        hops.alias("hops"),
    )
    out_fact, aspaths_dim = process_astraceroute(raw)
    dim = aspaths_dim.select(
        "aspath_id", "aspath", "aspath_length", "uniqueas", "responses"
    )
    out = out_fact.join(F.broadcast(dim), ["aspath_id"], "left")
    return out.select(
        "source",
        "destination",
        "family",
        "packet_size",
        "timestamp",
        F.array_join("aspath", ",").alias("aspath_str"),
        F.col("aspath_length").cast("long").alias("aspath_length"),
        F.col("uniqueas").cast("long").alias("uniqueas"),
        F.col("responses").cast("long").alias("responses"),
        F.col("errors").cast("long").alias("errors"),
        F.col("addresses").cast("long").alias("addresses"),
    )


SQL_INGEST_ASTRACEROUTE = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
agg AS (
  SELECT 'amp' AS source,
         'dst' || CAST(stream_id % 5 AS VARCHAR) AS destination,
         CASE WHEN stream_id % 2 = 0 THEN 'ipv4' ELSE 'ipv6' END AS family,
         '60' AS packet_size,
         timestamp - (timestamp % {HOUR}) AS timestamp,
         stream_id % 5 AS d, stream_id % 2 AS p,
         sum(CASE WHEN event_type != 'error' THEN 1 END) AS addresses,
         coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
           AS errors
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
  GROUP BY ALL
)
SELECT source, destination, family, packet_size, timestamp,
       CASE WHEN p = 0
            THEN CAST(r1 + r2 AS VARCHAR) || '.' || CAST(a AS VARCHAR)
            ELSE CAST(r1 AS VARCHAR) || '.' || CAST(a AS VARCHAR) ||
                 CASE WHEN r2 > 0
                      THEN ',' || CAST(r2 AS VARCHAR) || '.'
                           || CAST(a + 1 AS VARCHAR)
                      ELSE '' END
       END || CASE WHEN d % 3 = 0 THEN ',1.-1' ELSE '' END AS aspath_str,
       CAST(r1 + r2 + CASE WHEN d % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS aspath_length,
       CAST(CASE WHEN p = 0 OR r2 = 0 THEN 1 ELSE 2 END AS BIGINT)
         AS uniqueas,
       CAST(r1 + r2 AS BIGINT) AS responses,
       CAST(errors AS BIGINT) AS errors,
       CAST(addresses AS BIGINT) AS addresses
FROM (SELECT *, 100 + d AS a, 1 + d % 3 AS r1, (d + p) % 4 AS r2 FROM agg)
"""

REGISTRY["ingest_astraceroute"] = (q_ingest_astraceroute, SQL_INGEST_ASTRACEROUTE)


def q_ingest_udpstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-result explosion through the REAL udpstream transform
    (amp_udpstream.py:140-205): each raw message carries a results array
    with one struct per direction; the transform emits one fact row per
    entry.  The fixture exercises every branch: NULL rtt/jitter/voip
    structs (NULL field propagation), NULL packets_received (packets_sent
    gating, amp_udpstream.py:166-173), and percentile arrays of length
    0 (all NULL), 1..9 (index resample floor(k*n/10)) and 10..11 (first
    ten verbatim, amp_udpstream.py:184-205).  Columns outside the declared
    schema are pruned (junkcol must vanish)."""
    from ..ingest.amp_udpstream import process_udpstream

    fact = events_fact(spark, sf_dir, START, STOP)

    # The nested-struct fixture is built as ONE parsed SQL projection rather
    # than via the Python Column API: the Column form spent ~0.75 s/rep in
    # Py4J expression construction (hundreds of round trips, two lambda HOF
    # conversions) against ~0.3 s of actual execution — the lone >2×
    # per-query regression in BENCH_r04.  selectExpr text parses JVM-side
    # in one shot (same trick as dedup_simhash, commit 09bf0a1).
    def entry(d: int) -> str:
        w = f"(v + {d})"
        return f"""named_struct(
          'direction', '{"out" if d == 0 else "in"}',
          'rtt', IF({w} % 5 != 0, named_struct('mean', {w}), NULL),
          'jitter', IF({w} % 6 != 0, named_struct(
              'mean', {w} % 50, 'minimum', {w} % 10, 'maximum', {w} % 200),
              NULL),
          'packets_received',
              IF({w} % 7 != 0, CAST(11 AS BIGINT) - {w} % 3, NULL),
          'loss_percent', round(CAST({w} % 3 AS DOUBLE) / 11.0, 4),
          'voip', IF({w} % 4 != 0, named_struct(
              'itu_mos', round(CAST({w} % 500 AS DOUBLE) / 100.0, 4)), NULL),
          'percentiles', IF(CAST({w} % 12 AS INT) > 0,
              transform(sequence(1, CAST({w} % 12 AS INT)),
                        i -> CAST({w} % 90 + i * 7 AS BIGINT)),
              CAST(array() AS ARRAY<BIGINT>))
        )"""

    raw = fact.selectExpr(
        "*", "CAST(floor(value * 100) AS BIGINT) AS v"
    ).selectExpr(
        "'amp' AS source",
        "timestamp",
        "concat('dst', CAST(stream_id % 4 AS STRING)) AS target",
        "CASE WHEN stream_id % 2 = 0"
        " THEN concat('192.0.2.', CAST(stream_id AS STRING))"
        " ELSE concat('fe80::', CAST(stream_id AS STRING)) END AS address",
        "CAST(100 AS BIGINT) AS packet_size",
        "CAST(20000 AS BIGINT) AS packet_spacing",
        "CAST(11 AS BIGINT) AS packet_count",
        "'Default' AS dscp",
        f"array({entry(0)}, {entry(1)}) AS results",
        "'DROP ME' AS junkcol",
    )
    out = process_udpstream(raw)
    assert "junkcol" not in out.columns and "packets_recvd" in out.columns
    return out


# one CASE per jitter_percentile bucket: >=10 elements -> verbatim index
# k+1; 1..9 -> resampled index floor(k*n/10)+1; 0 -> NULL.  Element i of the
# fixture array is pbase + i*7, so element access is closed-form in SQL.
_PCT_SQL = ",\n       ".join(
    f"CASE WHEN n >= 10 THEN pbase + {(k + 1) * 7} "
    f"WHEN n > 0 THEN pbase + ((({k} * n) // 10) + 1) * 7 "
    f"END AS jitter_percentile_{(k + 1) * 10}"
    for k in range(10)
)

SQL_INGEST_UDPSTREAM = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
base AS (
  SELECT stream_id, timestamp, CAST(floor(value * 100) AS BIGINT) AS v
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
),
ex AS (
  SELECT stream_id, timestamp, v + d AS w,
         (v + d) % 12 AS n, (v + d) % 90 AS pbase,
         CASE WHEN d = 0 THEN 'out' ELSE 'in' END AS direction
  FROM base CROSS JOIN (VALUES (0), (1)) AS dirs(d)
)
SELECT 'amp' AS source,
       'dst' || CAST(stream_id % 4 AS VARCHAR) AS destination,
       CASE WHEN stream_id % 2 = 0
            THEN '192.0.2.' || CAST(stream_id AS VARCHAR)
            ELSE 'fe80::' || CAST(stream_id AS VARCHAR) END AS address,
       direction,
       CAST(100 AS BIGINT) AS packet_size,
       CAST(20000 AS BIGINT) AS packet_spacing,
       CAST(11 AS BIGINT) AS packet_count,
       'Default' AS dscp,
       timestamp,
       CASE WHEN w % 5 != 0 THEN w END AS mean_rtt,
       CASE WHEN w % 6 != 0 THEN w % 50 END AS mean_jitter,
       CASE WHEN w % 6 != 0 THEN w % 10 END AS min_jitter,
       CASE WHEN w % 6 != 0 THEN w % 200 END AS max_jitter,
       {_PCT_SQL},
       CASE WHEN w % 7 != 0 THEN CAST(11 AS BIGINT) END AS packets_sent,
       CASE WHEN w % 7 != 0 THEN 11 - w % 3 END AS packets_recvd,
       CASE WHEN w % 4 != 0 THEN round((w % 500) / 100.0, 4) END AS itu_mos,
       round((w % 3) / 11.0, 4) AS lossrate,
       TRUE AS unused
FROM ex
"""

REGISTRY["ingest_udpstream"] = (q_ingest_udpstream, SQL_INGEST_UDPSTREAM)


def q_ingest_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-family projection through the REAL http transform
    (amp_http.py:94-130): boolean stream properties, no unused pad."""
    from ..ingest.simple import process_http

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    v = F.floor(F.col("value") * 100)
    raw = fact.select(
        F.lit("amp").alias("source"),
        F.col("timestamp"),
        F.concat(F.lit("http://site"), (sid % 6).cast("string"), F.lit("/")).alias(
            "target"
        ),
        F.lit(24).cast("long").alias("max_connections"),
        F.lit(8).cast("long").alias("max_connections_per_server"),
        F.lit(2).cast("long").alias("max_persistent_connections_per_server"),
        F.lit(4).cast("long").alias("pipelining_max_requests"),
        (sid % 2 == 0).alias("persist"),
        F.lit(False).alias("pipelining"),
        (sid % 3 == 0).alias("caching"),
        (F.lit(1).cast("long") + v % 5).alias("server_count"),
        (F.lit(1).cast("long") + v % 40).alias("object_count"),
        v.alias("duration"),
        (v * 117).alias("bytes"),
    )
    out = process_http(raw)
    return out.select(
        "source",
        "destination",
        "persist",
        "pipelining",
        "caching",
        "timestamp",
        "server_count",
        "object_count",
        "duration",
        "bytes",
    )


SQL_INGEST_HTTP = f"""
WITH fact AS ({EVENTS_FACT_SQL})
SELECT 'amp' AS source,
       'http://site' || CAST(stream_id % 6 AS VARCHAR) || '/' AS destination,
       stream_id % 2 = 0 AS persist,
       FALSE AS pipelining,
       stream_id % 3 = 0 AS caching,
       timestamp,
       1 + CAST(floor(value * 100) AS BIGINT) % 5 AS server_count,
       1 + CAST(floor(value * 100) AS BIGINT) % 40 AS object_count,
       CAST(floor(value * 100) AS BIGINT) AS duration,
       CAST(floor(value * 100) AS BIGINT) * 117 AS bytes
FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
"""

REGISTRY["ingest_http"] = (q_ingest_http, SQL_INGEST_HTTP)


def q_ingest_sip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rx/tx fan-out through the REAL sip transform (amp_sip.py:157-200):
    each result row doubles into an rx and a tx fact row; shared fields
    (response_time/connect_time/duration, rtt stats) repeat on both, the
    packets/bytes/.../mos block comes from that direction's struct and is
    NULL when the struct is absent (amp_sip.py:185-193).  The fixture
    exercises NULL rtt, NULL rx, NULL tx, and NULL nested mos structs."""
    from ..ingest.amp_sip import process_sip

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    v = F.floor(F.col("value") * 100)
    good = v % 5 != 0

    def mos(base: int, gate: int):
        return F.when(
            v % gate != 0,
            F.struct(
                F.round((v % base).cast("double") / 100.0, 4).alias("itu_mos")
            ),
        )

    def dirstruct(mult: int, gate: int, mos_base: int, mos_gate: int):
        return F.when(
            v % gate != 0,
            F.struct(
                (v * mult).alias("packets"),
                (v * mult * 60).alias("bytes"),
                (v % (gate * 7)).alias("lost"),
                (v % (gate - 3)).alias("discarded"),
                (v % (gate - 2)).alias("reordered"),
                (v % (gate + 3)).alias("duplicated"),
                mos(mos_base, mos_gate).alias("mos"),
            ),
        )

    raw = fact.select(
        F.lit("amp").alias("source"),
        F.col("timestamp"),
        F.concat(F.lit("sip:user@dst"), (sid % 4).cast("string")).alias("uri"),
        F.array(
            F.concat(F.lit("proxy"), (sid % 3).cast("string")),
            F.concat(F.lit("edge"), (sid % 2).cast("string")),
        ).alias("proxy"),
        F.when(sid % 2 == 0, F.concat(F.lit("192.0.2."), sid.cast("string")))
        .otherwise(F.concat(F.lit("fe80::"), sid.cast("string")))
        .alias("address"),
        F.lit("default.wav").alias("filename"),
        (sid % 2 == 0).alias("repeat"),
        F.lit(30).cast("long").alias("max_duration"),
        F.lit("Default").alias("dscp"),
        F.array(
            F.struct(
                F.when(good, v).alias("time_till_first_response"),
                F.when(good, v + 50).alias("time_till_connected"),
                F.when(good, v * 100).alias("duration"),
                F.when(
                    v % 6 != 0,
                    F.struct(
                        (v % 80 + 40).alias("maximum"),
                        (v % 40).alias("minimum"),
                        (v % 60 + 20).alias("mean"),
                        (v % 10).alias("sd"),
                    ),
                ).alias("rtt"),
                dirstruct(500, 7, 500, 9).alias("rx"),
                dirstruct(600, 8, 400, 10).alias("tx"),
            )
        ).alias("results"),
    )
    return process_sip(raw)


# rx gate v%7, tx gate v%8; per-direction field f(mult, gate) — mirrors the
# fixture's dirstruct() closed-form so DuckDB needs no UNNEST.
_SIP_DIR_SQL = ",\n       ".join(
    "CASE WHEN direction = 'rx' AND v % 7 != 0 THEN {rx} "
    "WHEN direction = 'tx' AND v % 8 != 0 THEN {tx} END AS {name}".format(
        rx=rx, tx=tx, name=name
    )
    for name, rx, tx in [
        ("packets", "v * 500", "v * 600"),
        ("bytes", "v * 500 * 60", "v * 600 * 60"),
        ("lost", "v % 49", "v % 56"),
        ("discarded", "v % 4", "v % 5"),
        ("reordered", "v % 5", "v % 6"),
        ("duplicated", "v % 10", "v % 11"),
        (
            "mos",
            "CASE WHEN v % 9 != 0 THEN round((v % 500) / 100.0, 4) END",
            "CASE WHEN v % 10 != 0 THEN round((v % 400) / 100.0, 4) END",
        ),
    ]
)

SQL_INGEST_SIP = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
base AS (
  SELECT stream_id, timestamp, CAST(floor(value * 100) AS BIGINT) AS v
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
),
ex AS (
  SELECT * FROM base CROSS JOIN (VALUES ('rx'), ('tx')) AS dirs(direction)
)
SELECT 'amp' AS source,
       'sip:user@dst' || CAST(stream_id % 4 AS VARCHAR) AS destination,
       'proxy' || CAST(stream_id % 3 AS VARCHAR) || ',edge'
         || CAST(stream_id % 2 AS VARCHAR) AS proxy,
       CASE WHEN stream_id % 2 = 0
            THEN '192.0.2.' || CAST(stream_id AS VARCHAR)
            ELSE 'fe80::' || CAST(stream_id AS VARCHAR) END AS address,
       direction,
       'default.wav' AS filename,
       stream_id % 2 = 0 AS repeat,
       CAST(30 AS BIGINT) AS max_duration,
       'Default' AS dscp,
       timestamp,
       CASE WHEN v % 5 != 0 THEN v END AS response_time,
       CASE WHEN v % 5 != 0 THEN v + 50 END AS connect_time,
       CASE WHEN v % 5 != 0 THEN v * 100 END AS duration,
       CASE WHEN v % 6 != 0 THEN v % 80 + 40 END AS rtt_max,
       CASE WHEN v % 6 != 0 THEN v % 40 END AS rtt_min,
       CASE WHEN v % 6 != 0 THEN v % 60 + 20 END AS rtt_mean,
       CASE WHEN v % 6 != 0 THEN v % 10 END AS rtt_sd,
       {_SIP_DIR_SQL},
       TRUE AS unused
FROM ex
"""

REGISTRY["ingest_sip"] = (q_ingest_sip, SQL_INGEST_SIP)


def q_ingest_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result explosion + destination fallback through the REAL external
    transform (amp_external.py:90-117): one fact row per results entry,
    destination falling back to the source when NULL (amp_external.py:96-99)
    and a nullable integer value (amp_external.py:60-62)."""
    from ..ingest.amp_external import process_external

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    v = F.floor(F.col("value") * 100)
    raw = fact.select(
        F.lit("amp").alias("source"),
        F.col("timestamp"),
        F.concat(F.lit("cmd"), (sid % 3).cast("string")).alias("command"),
        F.array(
            F.struct(
                F.when(
                    v % 4 != 0, F.concat(F.lit("dst"), (sid % 5).cast("string"))
                ).alias("destination"),
                F.when(v % 5 != 0, v).alias("value"),
            ),
            F.struct(
                F.when(
                    v % 3 != 0, F.concat(F.lit("alt"), (sid % 7).cast("string"))
                ).alias("destination"),
                F.when(v % 7 != 0, v * 3 % 1000).alias("value"),
            ),
        ).alias("results"),
    )
    return process_external(raw)


SQL_INGEST_EXTERNAL = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
base AS (
  SELECT stream_id, timestamp, CAST(floor(value * 100) AS BIGINT) AS v
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
),
ex AS (
  SELECT * FROM base CROSS JOIN (VALUES (0), (1)) AS entries(e)
)
SELECT 'amp' AS source,
       CASE WHEN e = 0 THEN
              CASE WHEN v % 4 != 0
                   THEN 'dst' || CAST(stream_id % 5 AS VARCHAR)
                   ELSE 'amp' END
            ELSE
              CASE WHEN v % 3 != 0
                   THEN 'alt' || CAST(stream_id % 7 AS VARCHAR)
                   ELSE 'amp' END
       END AS destination,
       'cmd' || CAST(stream_id % 3 AS VARCHAR) AS command,
       timestamp,
       CASE WHEN e = 0 THEN CASE WHEN v % 5 != 0 THEN v END
            ELSE CASE WHEN v % 7 != 0 THEN v * 3 % 1000 END
       END AS value
FROM ex
"""

REGISTRY["ingest_external"] = (q_ingest_external, SQL_INGEST_EXTERNAL)


def q_ingest_youtube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-family projection through the REAL youtube transform
    (amp_youtube.py:110-130 _mangle_result): AMPsave names video /
    requested_quality map onto destination / quality, the timeline column
    is dropped (not in the declared schema), no unused pad."""
    from ..ingest.simple import process_youtube

    fact = events_fact(spark, sf_dir, START, STOP)
    sid = F.col("stream_id")
    v = F.floor(F.col("value") * 100)
    raw = fact.select(
        F.lit("amp").alias("source"),
        F.col("timestamp"),
        F.concat(F.lit("video"), (sid % 8).cast("string")).alias("video"),
        (sid % 4).cast("long").alias("requested_quality"),
        v.alias("total_time"),
        (v % 300).alias("pre_time"),
        (v % 700).alias("initial_buffering"),
        (v - v % 7).alias("playing_time"),
        (v % 7).alias("stall_time"),
        (v % 5).alias("stall_count"),
        F.lit("[]").alias("timeline"),
    )
    out = process_youtube(raw)
    assert "timeline" not in out.columns and "destination" in out.columns
    return out


SQL_INGEST_YOUTUBE = f"""
WITH fact AS ({EVENTS_FACT_SQL}),
base AS (
  SELECT stream_id, timestamp, CAST(floor(value * 100) AS BIGINT) AS v
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
)
SELECT 'amp' AS source,
       'video' || CAST(stream_id % 8 AS VARCHAR) AS destination,
       CAST(stream_id % 4 AS BIGINT) AS quality,
       timestamp,
       v AS total_time,
       v % 300 AS pre_time,
       v % 700 AS initial_buffering,
       v - v % 7 AS playing_time,
       v % 7 AS stall_time,
       v % 5 AS stall_count
FROM base
"""

REGISTRY["ingest_youtube"] = (q_ingest_youtube, SQL_INGEST_YOUTUBE)
