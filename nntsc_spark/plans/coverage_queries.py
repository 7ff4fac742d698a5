"""Additional SURVEY.md §2 coverage queries: smoke arrays, percentile fan,
count-gate, most_array, chunk-alignment equivalence, activity-pruned
selection, traceroute-shape dictionary joins, catalog listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import list_collections
from ..functions.aggregations import most_array_agg, smoke_agg
from ..operators.activity import build_stream_stats, prune_label_map
from ..operators.aggregate import select_aggregated_data, with_binstart
from ..operators.chunking import chunked_union
from ..operators.labels import apply_labels
from ..operators.select import select_data, time_filter
from ..sources.tables import events_fact, load_table
from .queries import DAY, HOUR, LABELS, START, STOP, T0, _label_map

# single source of truth for the oracle CTE text (a local rebuild from
# EVENTS_FACT_SQL could silently drift from queries.py's form)
from .queries import SQL_FREQUENCY, _FACT_CTE, _LABELED_CTE  # noqa: E402


def q_smoke_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 array form: the 20-element smoke fan per label, serialized to a
    canonical string (cross-engine array hashing is avoided by emitting
    text — the reference wire format pickles arrays anyway)."""
    fact = events_fact(spark, sf_dir, START, STOP)
    labeled = apply_labels(time_filter(fact, START, STOP), _label_map(spark))
    # deterministic ntile order via (value, event_id)
    from ..functions.aggregations import smoke_rows

    rows = smoke_rows(labeled, ["nntsclabel"], "value", ["value", "event_id"])
    return rows.groupBy("nntsclabel").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("tile", "tile_avg"))),
                lambda s: F.round(s["tile_avg"], 4).cast("string"),
            ),
        ).alias("smoke")
    )


SQL_SMOKE_ARRAY = f"""
WITH {_FACT_CTE}, {_LABELED_CTE},
tiled AS (
  SELECT nntsclabel, value,
         ntile(20) OVER (PARTITION BY nntsclabel ORDER BY value, event_id) AS tile
  FROM labeled
  WHERE timestamp >= {START} AND timestamp <= {STOP} AND value IS NOT NULL
), per_tile AS (
  SELECT nntsclabel, tile, avg(value) AS tile_avg
  FROM tiled GROUP BY nntsclabel, tile
)
SELECT nntsclabel,
       string_agg(CAST(round(tile_avg, 4) AS VARCHAR), ',' ORDER BY tile) AS smoke
FROM per_tile GROUP BY nntsclabel
"""


def q_percentile_fan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: the Influx smoke emulation — percentile(5..95 step 5) + max as
    p100, exact linear-interpolated percentiles (both engines interpolate)."""
    fact = events_fact(spark, sf_dir, START, STOP)
    labeled = apply_labels(time_filter(fact, START, STOP), _label_map(spark))
    pcts = [i / 100 for i in range(5, 100, 5)]
    arr = ",".join(str(p) for p in pcts)
    out = labeled.groupBy("nntsclabel").agg(
        F.expr(f"percentile(value, array({arr}))").alias("_p"),
        F.round(F.max("value"), 4).alias("p100"),
    )
    cols = [
        F.round(F.element_at("_p", i + 1), 4).alias(f"p{5 * (i + 1)}")
        for i in range(len(pcts))
    ]
    return out.select("nntsclabel", *cols, "p100")


_PCT_COLS = ", ".join(
    f"round(quantile_cont(value, {i / 100}), 4) AS p{i}" for i in range(5, 100, 5)
)

SQL_PERCENTILE_FAN = f"""
WITH {_FACT_CTE}, {_LABELED_CTE}
SELECT nntsclabel, {_PCT_COLS}, round(max(value), 4) AS p100
FROM labeled WHERE timestamp >= {START} AND timestamp <= {STOP}
GROUP BY nntsclabel
"""


def q_count_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: bins whose requested count aggregate is 0 are dropped entirely
    (influx.py:686-692) — here: daily bins that saw no 'purchase' events."""
    fact = events_fact(spark, sf_dir, START, STOP).where(F.col("event_type") == "purchase")
    out = select_aggregated_data(
        fact,
        _label_map(spark),
        aggcols=[("value", "count"), ("value", "sum")],
        start=START,
        stop=STOP,
        binsize=DAY,
        order=False,
    )
    return out.where(F.col("value_count") > 0).select(
        "nntsclabel",
        "binstart",
        "timestamp",
        "value_count",
        F.round("value_sum", 4).alias("value_sum"),
    )


SQL_COUNT_GATE = f"""
WITH {_FACT_CTE}, {_LABELED_CTE}
SELECT nntsclabel, timestamp - (timestamp % {DAY}) AS binstart,
       max(timestamp) AS timestamp,
       count(value) AS value_count,
       round(sum(value), 4) AS value_sum
FROM labeled
WHERE timestamp >= {START} AND timestamp <= {STOP} AND event_type = 'purchase'
GROUP BY nntsclabel, binstart
HAVING count(value) > 0
"""


def q_most_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 most_array: mode over array-typed values — each stream-day's
    sorted event-type multiset is the array; the per-label mode of those
    arrays, serialized canonically (arrays are directly groupable in Spark;
    the reference had to serialize to strings, dbselect.py:824-827)."""
    fact = events_fact(spark, sf_dir, START, STOP)
    labeled = apply_labels(time_filter(fact, START, STOP), _label_map(spark))
    per_day = (
        with_binstart(labeled, DAY)
        .groupBy("nntsclabel", "stream_id", "binstart")
        .agg(F.array_sort(F.collect_list("event_type")).alias("day_types"))
    )
    mode = most_array_agg(per_day, ["nntsclabel"], "day_types", "most_array")
    return mode.select(
        "nntsclabel", F.concat_ws(",", "most_array").alias("most_array")
    )


SQL_MOST_ARRAY = f"""
WITH {_FACT_CTE}, {_LABELED_CTE},
per_day AS (
  SELECT nntsclabel, stream_id, timestamp - (timestamp % {DAY}) AS binstart,
         list_sort(list(event_type)) AS day_types
  FROM labeled WHERE timestamp >= {START} AND timestamp <= {STOP}
  GROUP BY nntsclabel, stream_id, binstart
), counted AS (
  SELECT nntsclabel, array_to_string(day_types, ',') AS most_array,
         count(*) AS cnt
  FROM per_day GROUP BY nntsclabel, most_array
), ranked AS (
  SELECT nntsclabel, most_array,
         row_number() OVER (PARTITION BY nntsclabel
                            ORDER BY cnt DESC, most_array ASC) AS rn
  FROM counted
)
SELECT nntsclabel, most_array FROM ranked WHERE rn = 1
"""


def q_chunked_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 equivalence: 7-day bin-aligned chunking unioned == direct
    aggregation (the oracle runs the direct form)."""
    fact = events_fact(spark, sf_dir, START, STOP)
    lm = _label_map(spark)

    def one_chunk(s: int, e: int) -> DataFrame:
        out = select_aggregated_data(
            fact, lm, [("value", "sum"), ("value", "count")],
            start=s, stop=e, binsize=HOUR, order=False,
        )
        return out.select(
            "nntsclabel", "binstart", "timestamp",
            F.round("value_sum", 4).alias("value_sum"), "value_count",
        )

    return chunked_union(one_chunk, START, STOP, HOUR)


SQL_CHUNKED_AGG = f"""
WITH {_FACT_CTE}, {_LABELED_CTE}
SELECT nntsclabel, timestamp - (timestamp % {HOUR}) AS binstart,
       max(timestamp) AS timestamp,
       round(sum(value), 4) AS value_sum,
       count(value) AS value_count
FROM labeled WHERE timestamp >= {START} AND timestamp <= {STOP}
GROUP BY nntsclabel, binstart
"""


ACT_START = T0
ACT_STOP = T0 + 1800  # first 30 min: not every stream has data yet


def q_activity_pruned_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 end-to-end: stream-stats pruning feeds the label map before the
    scan; only streams with data in [start, stop] survive."""
    fact = events_fact(spark, sf_dir)
    fact_bounded = events_fact(spark, sf_dir, ACT_START, ACT_STOP)
    stats = build_stream_stats(fact)
    lm = prune_label_map(_label_map(spark), stats, ACT_START, ACT_STOP)
    return select_data(
        fact_bounded, lm, ["value", "event_type"], ACT_START, ACT_STOP, order=False
    )


SQL_ACTIVITY_PRUNED_SELECT = f"""
WITH {_FACT_CTE}, {_LABELED_CTE},
stats AS (
  SELECT stream_id, min(timestamp) AS first_ts, max(timestamp) AS last_ts
  FROM fact GROUP BY stream_id
), active AS (
  SELECT stream_id FROM stats
  WHERE first_ts <= {ACT_STOP} AND last_ts >= {ACT_START}
)
SELECT l.value, l.event_type, l.timestamp, l.stream_id, l.nntsclabel
FROM labeled l JOIN active a ON l.stream_id = a.stream_id
WHERE l.timestamp >= {ACT_START} AND l.timestamp <= {ACT_STOP}
"""


def q_traceroute_shape_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/J2/J3 shape: fact LEFT JOINed to two broadcast dictionary tables
    (the traceroute paths/aspaths reassembly, amp_traceroute.py:662-703),
    exercised on the testdata star schema: lineitem ⟕ part ⟕ supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.where(F.col("l_orderkey") % 100 == 0)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "p_name",
            "p_retailprice",
            "l_suppkey",
            "s_name",
            F.round(F.col("l_extendedprice"), 2).alias("price"),
        )
    )


SQL_TRACEROUTE_SHAPE_JOIN = """
SELECT l_orderkey, l_linenumber, l_partkey, p_name, p_retailprice,
       l_suppkey, s_name, round(l_extendedprice, 2) AS price
FROM lineitem
LEFT JOIN part ON l_partkey = p_partkey
LEFT JOIN supplier ON l_suppkey = s_suppkey
WHERE l_orderkey % 100 = 0
"""


def q_catalog_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the collections catalog (all 14 reference collections)."""
    return list_collections(spark)


# Hand-written golden rows (NOT generated from the registry) so the oracle
# independently pins the catalog contract: the 14 collections of
# /root/reference (README:79-81), module/modsubtype/table names per each
# parser's declaration, ids assigned by sorted collection name.  The three
# traceroute-family collections share one streams table
# (amp_traceroute.py:44-46).
SQL_CATALOG_COLLECTIONS = """
SELECT CAST(id AS BIGINT) AS id, module, modsubtype, streamtable, datatable
FROM (VALUES
  (1,  'amp', 'astraceroute',       'streams_amp_traceroute', 'data_amp_astraceroute'),
  (2,  'amp', 'dns',                'streams_amp_dns',        'data_amp_dns'),
  (3,  'amp', 'external',           'streams_amp_external',   'data_amp_external'),
  (4,  'amp', 'fastping',           'streams_amp_fastping',   'data_amp_fastping'),
  (5,  'amp', 'http',               'streams_amp_http',       'data_amp_http'),
  (6,  'amp', 'icmp',               'streams_amp_icmp',       'data_amp_icmp'),
  (7,  'amp', 'sip',                'streams_amp_sip',        'data_amp_sip'),
  (8,  'amp', 'tcpping',            'streams_amp_tcpping',    'data_amp_tcpping'),
  (9,  'amp', 'throughput',         'streams_amp_throughput', 'data_amp_throughput'),
  (10, 'amp', 'traceroute',         'streams_amp_traceroute', 'data_amp_traceroute'),
  (11, 'amp', 'traceroute_pathlen', 'streams_amp_traceroute', 'data_amp_traceroute_pathlen'),
  (12, 'amp', 'udpstream',          'streams_amp_udpstream',  'data_amp_udpstream'),
  (13, 'amp', 'youtube',            'streams_amp_youtube',    'data_amp_youtube'),
  (14, 'rrd', 'smokeping',          'streams_rrd_smokeping',  'data_rrd_smokeping')
) AS t(id, module, modsubtype, streamtable, datatable)
"""


REGISTRY = {
    "percentile_fan": (q_percentile_fan, SQL_PERCENTILE_FAN),
    "count_gate": (q_count_gate, SQL_COUNT_GATE),
    "most_array": (q_most_array, SQL_MOST_ARRAY),
    "chunked_agg": (q_chunked_agg, SQL_CHUNKED_AGG),
    "activity_pruned_select": (
        q_activity_pruned_select,
        SQL_ACTIVITY_PRUNED_SELECT,
    ),
    "traceroute_shape_join": (
        q_traceroute_shape_join,
        SQL_TRACEROUTE_SHAPE_JOIN,
    ),
    "catalog_collections": (q_catalog_collections, SQL_CATALOG_COLLECTIONS),
}


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per stream (30-min timeout) with
    per-session stats — lag window + running sum, per-stream partitioned."""
    from ..operators.sessions import session_stats

    fact = events_fact(spark, sf_dir, START, STOP)
    out = session_stats(
        time_filter(fact, START, STOP), timeout=1800, value_col="value"
    )
    return out.select(
        "stream_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
        F.round("value_sum", 4).alias("value_sum"),
    )


SQL_SESSIONIZE = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT * FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
), marked AS (
  SELECT stream_id, timestamp, value,
         CASE WHEN timestamp - lag(timestamp) OVER w > 1800
                   OR lag(timestamp) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM bounded
  WINDOW w AS (PARTITION BY stream_id ORDER BY timestamp)
), numbered AS (
  SELECT stream_id, timestamp, value,
         sum(is_new) OVER (PARTITION BY stream_id ORDER BY timestamp
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT stream_id, CAST(session_id AS BIGINT) AS session_id,
       min(timestamp) AS session_start, max(timestamp) AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS value_sum
FROM numbered GROUP BY stream_id, session_id
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation == direct aggregation
    (equivalence oracle): lineitem grouped by l_returnflag (3 hot keys)."""
    from ..operators.sessions import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(li, ["l_returnflag"], "l_extendedprice", salts=16)
    return out.select(
        "l_returnflag",
        F.round("l_extendedprice_sum", 2).alias("sum_price"),
        "l_extendedprice_count",
        F.round("l_extendedprice_min", 2).alias("min_price"),
        F.round("l_extendedprice_max", 2).alias("max_price"),
        F.round("l_extendedprice_avg", 4).alias("avg_price"),
    )


SQL_SALTED_AGG = """
SELECT l_returnflag,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(l_extendedprice) AS l_extendedprice_count,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem GROUP BY l_returnflag
"""


REGISTRY.update(
    {
        "sessionize": (q_sessionize, SQL_SESSIONIZE),
        "salted_agg": (q_salted_agg, SQL_SALTED_AGG),
    }
)


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join == plain join (equivalence oracle).

    A degenerate hot key (90% of events collapse to key 0) joined to a
    per-key dim, then aggregated by the dim attribute — the shape where an
    unsalted sort-merge join serializes on one reducer at scale."""
    from ..operators.sessions import salted_join

    fact = events_fact(spark, sf_dir, START, STOP)
    hot = F.when(F.col("stream_id") % 10 != 0, F.lit(0)).otherwise(
        F.col("stream_id")
    )
    big = fact.select(hot.cast("long").alias("k"), "value")
    dim = (
        big.select("k")
        .distinct()
        .withColumn("bucket", (F.col("k") % 7).cast("long"))
    )
    out = salted_join(big, dim, "k", salts=16).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )
    return out.select("bucket", "n", "value_sum")


SQL_SKEW_JOIN = f"""
WITH {_FACT_CTE},
big AS (
  SELECT CASE WHEN stream_id % 10 != 0 THEN 0 ELSE stream_id END AS k, value
  FROM fact WHERE timestamp >= {START} AND timestamp <= {STOP}
),
dim AS (SELECT DISTINCT k, k % 7 AS bucket FROM big)
SELECT bucket, count(*) AS n, round(sum(value), 2) AS value_sum
FROM big JOIN dim USING (k)
GROUP BY bucket
"""

REGISTRY["skew_join"] = (q_skew_join, SQL_SKEW_JOIN)
# registered from plans.queries AFTER the ingest block: smoke_array is a
# variant check (smoke + most_array both driver-verified) and can live in
# the driver's unchecked tail — see the 50-query-window note in queries.py
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel within an hour of the
    first view, over the bounded events window: k per-user min-aggregates
    joined key-to-key — no per-user event collection, no global sort."""
    from ..operators.sessions import funnel_counts

    fact = events_fact(spark, sf_dir, START, STOP)
    return funnel_counts(
        time_filter(fact, START, STOP),
        steps=["view", "click", "purchase"],
        window=3600,
    )


# Earliest-completion funnel semantics step by step: s1 = min view ts per
# user; s_k = min step-k ts strictly after s_{k-1} and within 3600 s of
# s1; counts are single-row aggregates unioned in step order.
SQL_FUNNEL = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_type FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), s1 AS (
  SELECT stream_id, min(timestamp) AS t, min(timestamp) AS t1
  FROM bounded WHERE event_type = 'view' GROUP BY stream_id
), s2 AS (
  SELECT b.stream_id, min(b.timestamp) AS t, s1.t1
  FROM bounded b JOIN s1 ON b.stream_id = s1.stream_id
  WHERE b.event_type = 'click' AND b.timestamp > s1.t
    AND b.timestamp <= s1.t1 + 3600
  GROUP BY b.stream_id, s1.t1
), s3 AS (
  SELECT b.stream_id, min(b.timestamp) AS t, s2.t1
  FROM bounded b JOIN s2 ON b.stream_id = s2.stream_id
  WHERE b.event_type = 'purchase' AND b.timestamp > s2.t
    AND b.timestamp <= s2.t1 + 3600
  GROUP BY b.stream_id, s2.t1
)
SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
UNION ALL
SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-day cohorts x activity-day offsets (7-day horizon) over the
    bounded events window — per-user min + distinct-day join, no windows."""
    from ..operators.sessions import cohort_retention

    fact = events_fact(spark, sf_dir, START, STOP)
    return cohort_retention(
        time_filter(fact, START, STOP), max_offset_days=7
    )


# Same shape relationally: cohort day = min signup day per user (UTC
# epoch//86400), activity = distinct (user, day), count per (cohort_day,
# offset <= 7).
SQL_COHORT_RETENTION = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_type FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), cohorts AS (
  SELECT stream_id, min(timestamp // 86400) AS cday
  FROM bounded WHERE event_type = 'signup' GROUP BY stream_id
), active AS (
  SELECT DISTINCT stream_id, timestamp // 86400 AS aday FROM bounded
)
SELECT c.cday AS cohort_day, a.aday - c.cday AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM active a JOIN cohorts c ON a.stream_id = c.stream_id
WHERE a.aday >= c.cday AND a.aday - c.cday <= 7
GROUP BY c.cday, a.aday - c.cday
"""


def q_event_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the latest
    at-or-before view on its stream (within a day) — union-tag + one
    per-key ordered window, no range-join explosion.  The right side is
    pre-aggregated to one row per (stream, ts) per the operator's
    determinism contract."""
    from ..operators.timeseries import asof_join

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    left = fact.where(F.col("event_type") == "purchase").select(
        "stream_id",
        "timestamp",
        "event_id",
        F.round("value", 2).alias("purchase_value"),
    )
    right = (
        fact.where(F.col("event_type") == "view")
        .groupBy("stream_id", "timestamp")
        .agg(F.round(F.max("value"), 2).alias("view_value"))
    )
    out = asof_join(left, right, tolerance=DAY)
    return out.select(
        "stream_id",
        "timestamp",
        "event_id",
        "purchase_value",
        "view_value",
        F.col("timestamp_r").alias("view_ts"),
    )


# DuckDB has native ASOF LEFT JOIN (inclusive >=, latest match) — the
# tolerance bound is applied post-join exactly like the operator does.
SQL_EVENT_ASOF = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, event_type, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), purchases AS (
  SELECT stream_id, timestamp, event_id, round(value, 2) AS purchase_value
  FROM bounded WHERE event_type = 'purchase'
), views AS (
  SELECT stream_id, timestamp, round(max(value), 2) AS view_value
  FROM bounded WHERE event_type = 'view' GROUP BY stream_id, timestamp
)
SELECT p.stream_id, p.timestamp, p.event_id, p.purchase_value,
       CASE WHEN p.timestamp - v.timestamp <= {DAY} THEN v.view_value END
         AS view_value,
       CASE WHEN p.timestamp - v.timestamp <= {DAY} THEN v.timestamp END
         AS view_ts
FROM purchases p ASOF LEFT JOIN views v
  ON p.stream_id = v.stream_id AND p.timestamp >= v.timestamp
"""


_GF_BIN = 6 * HOUR


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularized 6-hour grid per stream over the full window with
    last-observation-carried-forward fill — distributed sequence()
    scaffold + one per-key window, output bounded by keys x bins."""
    from ..operators.timeseries import gapfill

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    # exact-integer-cents average: sparse bins (1-2 events) make
    # round(avg(double), 2) land exactly on .xx5 boundaries, where Spark
    # (shortest decimal repr, HALF_UP) and DuckDB (binary value) disagree;
    # avg over longs is an exact sum + one IEEE division — bit-identical
    cents = F.round(F.col("value") * 100).cast("long")
    binned = (
        fact.groupBy(
            "stream_id",
            (F.col("timestamp") - F.col("timestamp") % _GF_BIN).alias(
                "binstart"
            ),
        )
        .agg((F.avg(cents) / 100.0).alias("avg_value"))
    )
    return gapfill(binned, _GF_BIN, START, STOP, method="locf")


SQL_GAPFILL_LOCF = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), binned AS (
  SELECT stream_id, timestamp - timestamp % {_GF_BIN} AS binstart,
         avg(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS avg_value
  FROM bounded GROUP BY 1, 2
), grid AS (
  SELECT stream_id,
         unnest(generate_series({(START // _GF_BIN) * _GF_BIN},
                                {(STOP // _GF_BIN) * _GF_BIN},
                                {_GF_BIN})) AS binstart
  FROM (SELECT DISTINCT stream_id FROM binned)
), joined AS (
  SELECT g.stream_id, g.binstart, b.avg_value,
         b.binstart IS NULL AS filled
  FROM grid g LEFT JOIN binned b
    ON g.stream_id = b.stream_id AND g.binstart = b.binstart
)
SELECT stream_id, binstart,
       last_value(avg_value IGNORE NULLS) OVER (
         PARTITION BY stream_id ORDER BY binstart
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value,
       filled
FROM joined
"""


def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRD COUNTER-style rate derivation over a synthetic per-stream
    counter (integer cumulative value, exact on both engines): one lag
    window; resets (negative deltas) take the post-reset value as the
    delta.  Cross-engine exactness comes from integer accumulation —
    float cumsums would make near-zero deltas' reset flag
    engine-dependent."""
    from pyspark.sql import Window

    from ..operators.timeseries import counter_rate

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    w = (
        Window.partitionBy("stream_id")
        .orderBy("timestamp", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctr = fact.select(
        "stream_id",
        "timestamp",
        "event_id",
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias(
            "counter"
        ),
    )
    out = counter_rate(
        ctr, value_col="counter", order_cols=["event_id"]
    )
    return out.select(
        "stream_id",
        "timestamp",
        "event_id",
        F.round("rate", 4).alias("rate"),
        "reset",
    )


SQL_COUNTER_RATE = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), ctr AS (
  SELECT stream_id, timestamp, event_id,
         sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
           PARTITION BY stream_id ORDER BY timestamp, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS counter
  FROM bounded
), lagged AS (
  SELECT stream_id, timestamp, event_id, counter,
         lag(counter) OVER w AS pv, lag(timestamp) OVER w AS pt
  FROM ctr
  WINDOW w AS (PARTITION BY stream_id ORDER BY timestamp, event_id)
)
SELECT stream_id, timestamp, event_id,
       round(CASE WHEN timestamp > pt THEN
         (CASE WHEN counter - pv < 0 THEN counter ELSE counter - pv END)
           / CAST(timestamp - pt AS DOUBLE) END, 4) AS rate,
       counter - pv < 0 AS reset
FROM lagged WHERE pv IS NOT NULL
"""


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection (20 preceding points, |z| > 3)
    aggregated per stream — the latency-event detection the reference's
    ecosystem runs downstream, as one window plan + one hash aggregate."""
    from ..operators.timeseries import rolling_zscore

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    scored = rolling_zscore(
        fact, order_cols=["event_id"], n=20, min_points=5, threshold=3.0
    )
    return scored.groupBy("stream_id").agg(
        F.count("z").cast("long").alias("n_scored"),
        F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0))
        .cast("long")
        .alias("n_anomalies"),
        F.round(F.avg(F.abs("z")), 3).alias("mean_abs_z"),
    )


SQL_ANOMALY_ZSCORE = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), scored AS (
  SELECT stream_id, value,
         avg(value) OVER w AS m,
         stddev_samp(value) OVER w AS sd,
         count(value) OVER w AS c
  FROM bounded
  WINDOW w AS (PARTITION BY stream_id ORDER BY timestamp, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT stream_id,
         CASE WHEN c >= 5 AND sd > 0 THEN (value - m) / sd END AS z
  FROM scored
)
SELECT stream_id, CAST(count(z) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies,
       round(avg(abs(z)), 3) AS mean_abs_z
FROM z GROUP BY stream_id
"""


def q_interval_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution via point-in-interval join: for every purchase, the
    same user's clicks within the following hour — the bucketed
    equi-join strategy (operators/intervals.py) with bucket = span, so
    intervals replicate at most twice and nothing nested-loops."""
    from ..operators.intervals import interval_join

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    anchors = fact.where(F.col("event_type") == "purchase").select(
        "stream_id",
        F.col("event_id").alias("anchor_id"),
        F.col("timestamp").alias("start"),
        (F.col("timestamp") + 3599).alias("end"),
    )
    clicks = fact.where(F.col("event_type") == "click").select(
        "stream_id", F.col("timestamp").alias("timestamp")
    )
    matched = interval_join(
        clicks, anchors, ts_col="timestamp",
        start_col="start", end_col="end",
        on=["stream_id"], bucket=3600,
    )
    hits = matched.groupBy("anchor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.min("timestamp").alias("first_click_ts"),
    )
    return (
        anchors.select("anchor_id")
        .join(hits, "anchor_id", "left")
        .select(
            "anchor_id",
            F.coalesce(F.col("n_clicks"), F.lit(0))
            .cast("long")
            .alias("n_clicks"),
            "first_click_ts",
        )
    )


SQL_INTERVAL_ATTR = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_type, event_id FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
),
p AS (
  SELECT stream_id, event_id AS anchor_id, timestamp AS t0
  FROM bounded WHERE event_type = 'purchase'
),
c AS (
  SELECT stream_id, timestamp FROM bounded WHERE event_type = 'click'
)
SELECT p.anchor_id,
       CAST(count(c.timestamp) AS BIGINT) AS n_clicks,
       min(c.timestamp) AS first_click_ts
FROM p LEFT JOIN c
  ON c.stream_id = p.stream_id
 AND c.timestamp >= p.t0 AND c.timestamp <= p.t0 + 3599
GROUP BY p.anchor_id
"""


def q_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint statistics per stream (k=0.5 sd
    slack, h=4 sd threshold), summarized per key.  The recursive
    ``max(0, ...)`` fold is computed via its cumsum-minus-running-min
    closed form — two ordered windows in one exchange, no recursion."""
    from ..operators.timeseries import cusum

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    scored = cusum(fact, order_cols=["event_id"], k=0.5, h=4.0)
    return scored.groupBy("stream_id").agg(
        F.count("cusum_pos").cast("long").alias("n_scored"),
        F.sum(F.when(F.col("is_change"), 1).otherwise(0))
        .cast("long")
        .alias("n_changes"),
        F.round(F.max("cusum_pos"), 3).alias("max_cusum_pos"),
        F.round(F.max("cusum_neg"), 3).alias("max_cusum_neg"),
    )


SQL_CUSUM_CHANGE = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), base AS (
  SELECT stream_id, timestamp, event_id, value,
         avg(value) OVER (PARTITION BY stream_id) AS mu,
         stddev_samp(value) OVER (PARTITION BY stream_id) AS sd
  FROM bounded
), zt AS (
  SELECT stream_id, timestamp, event_id,
         CASE WHEN sd > 0 THEN (value - mu) / sd END AS z
  FROM base
), c AS (
  SELECT stream_id, timestamp, event_id,
         sum(z - 0.5) OVER w AS c_pos,
         sum(-z - 0.5) OVER w AS c_neg
  FROM zt
  WINDOW w AS (PARTITION BY stream_id ORDER BY timestamp, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s AS (
  SELECT stream_id,
         c_pos - least(min(c_pos) OVER w2, 0.0) AS s_pos,
         c_neg - least(min(c_neg) OVER w2, 0.0) AS s_neg
  FROM c
  WINDOW w2 AS (PARTITION BY stream_id ORDER BY timestamp, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT stream_id,
       CAST(count(s_pos) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN s_pos > 4.0 OR s_neg > 4.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changes,
       round(max(s_pos), 3) AS max_cusum_pos,
       round(max(s_neg), 3) AS max_cusum_neg
FROM s GROUP BY stream_id
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition per stream (period 24 rows):
    centered-MA trend, phase-mean seasonal centered to ~0, remainder."""
    from ..operators.timeseries import seasonal_decompose

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    out = seasonal_decompose(fact, order_cols=["event_id"], period=24)
    # no output rounding: trend/seasonal are already round-6 PINNED (or
    # exact differences of pinned values) inside the operator, so both
    # engines hold bit-identical doubles — a second round(4) would
    # re-introduce boundary flips exactly where pinned values sit on
    # .00005 boundaries (observed before this was removed)
    return out.select(
        "stream_id",
        "timestamp",
        "event_id",
        "value",
        "trend",
        "seasonal",
        "remainder",
    )


SQL_SEASONAL_DECOMPOSE = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), win AS (
  SELECT stream_id, timestamp, event_id, value,
         (row_number() OVER w1 - 1) % 24 AS phase,
         round(CASE WHEN count(value) OVER w2 = 25
                    THEN (2.0 * sum(value) OVER w2
                          - lag(value, 12) OVER w1
                          - lead(value, 12) OVER w1)
                         / 48.0 END, 6) AS trend
  FROM bounded
  WINDOW w1 AS (PARTITION BY stream_id ORDER BY timestamp, event_id),
         w2 AS (PARTITION BY stream_id ORDER BY timestamp, event_id
                ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), det AS (
  SELECT *, CAST(round((value - trend) * 1e6, 0) AS BIGINT) AS detr_u
  FROM win
), pm AS (
  SELECT stream_id, phase,
         CAST(round(CAST(sum(detr_u) AS DOUBLE) / count(detr_u), 0)
              AS BIGINT) AS sbar_u
  FROM det GROUP BY 1, 2
), km AS (SELECT stream_id,
                 CAST(round(CAST(sum(sbar_u) AS DOUBLE) / count(sbar_u), 0)
                      AS BIGINT) AS sbar0_u
          FROM pm GROUP BY 1),
sea AS (
  SELECT pm.stream_id, pm.phase,
         (pm.sbar_u - km.sbar0_u) / 1e6 AS seasonal
  FROM pm JOIN km USING (stream_id)
)
SELECT w.stream_id, w.timestamp, w.event_id, w.value,
       w.trend AS trend,
       s.seasonal AS seasonal,
       w.value - w.trend - s.seasonal AS remainder
FROM win w JOIN sea s ON s.stream_id = w.stream_id AND s.phase = w.phase
"""


_EWMA_ALPHA, _EWMA_LOOKBACK = 0.25, 32


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream EWMA smoothing over the events fact: one per-key
    ordered window, numerator and weight mass as left-to-right
    ``acc*beta + x`` folds (no pow calls — both engines reproduce the
    chain bit-for-bit).  alpha=0.25 makes beta=0.75 exact in binary;
    lookback=32 is the constant-state production bound (truncation
    error < 0.75^32 ~ 1e-4 of the weight mass, renormalized away)."""
    from ..operators.timeseries import ewma

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    return ewma(
        fact,
        alpha=_EWMA_ALPHA,
        order_cols=["event_id"],
        lookback=_EWMA_LOOKBACK,
    )


SQL_EWMA_SMOOTH = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, CAST(value AS DOUBLE) AS value
  FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
    AND value IS NOT NULL
), h AS (
  SELECT stream_id, timestamp, event_id, value,
         list(value) OVER (
           PARTITION BY stream_id ORDER BY timestamp, event_id
           ROWS BETWEEN {_EWMA_LOOKBACK - 1} PRECEDING AND CURRENT ROW
         ) AS hist
  FROM bounded
)
SELECT stream_id, timestamp, event_id, value,
       round(list_reduce(hist, (acc, x) -> acc * 0.75 + x) /
             list_reduce(list_transform(hist, x -> CAST(1 AS DOUBLE)),
                         (acc, x) -> acc * 0.75 + x), 4) AS ewma
FROM h
"""


def q_rollup_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles served from MERGED histogram rollups (the mergeable
    extension of A10's algebraic re-merge): per-(stream, 6h-bin) count
    vectors merge element-wise per stream, and p50/p95 read off the
    merged vector — the estimate is engine-deterministic (pure integer
    walks + one IEEE division), so it oracle-compares exactly."""
    from ..operators.rollup import (
        histogram_percentiles,
        histogram_rollup,
        merge_histograms,
    )

    nbins, lo, hi = 250, 0.0, 500.0
    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    hr = histogram_rollup(fact, 6 * HOUR, "value", lo, hi, nbins)
    # relational merge (see merge_histograms): identical sums to the
    # merged_histogram_agg fold, codegen instead of interpreted lambdas,
    # and partition-local under the rollup's stream-keyed exchange
    merged = merge_histograms(hr, ["stream_id"], "hist", nbins)
    return histogram_percentiles(
        merged, "hist", lo, hi, {"p50": 0.5, "p95": 0.95}, total_col="n"
    ).select("stream_id", "n", "p50", "p95")


# The oracle skips the per-bin level entirely: histogram merge is EXACT
# (element-wise addition), so per-stream bucket counts computed directly
# equal the merged rollup vectors — that equality is the operator's
# pytest contract (test_histogram_rollup_merge_matches_direct_build),
# and the percentile walk here mirrors the expression arithmetic 1:1.
_HP = (
    "2.0 * (bucket + CAST(greatest(1, CAST(ceil({p} * total) AS BIGINT)) "
    "- (cum - cnt) AS DOUBLE) / cnt)"
)
_HP_PICK = """
  SELECT stream_id, {est} AS {name}
  FROM cum
  WHERE cum >= greatest(1, CAST(ceil({p} * total) AS BIGINT))
  QUALIFY row_number() OVER (PARTITION BY stream_id ORDER BY bucket) = 1
"""
SQL_ROLLUP_PERCENTILE = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
    AND value IS NOT NULL
), counts AS (
  SELECT stream_id,
         least(greatest(CAST(floor(value / 2.0) AS INT), 0), 249) AS bucket,
         count(*) AS cnt
  FROM bounded GROUP BY 1, 2
), cum AS (
  SELECT stream_id, bucket, cnt,
         sum(cnt) OVER (PARTITION BY stream_id ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY stream_id) AS total
  FROM counts
), p50 AS ({_HP_PICK.format(est=_HP.format(p=0.5), name="p50", p=0.5)}),
p95 AS ({_HP_PICK.format(est=_HP.format(p=0.95), name="p95", p=0.95)}),
totals AS (
  SELECT stream_id, CAST(sum(cnt) AS BIGINT) AS n FROM counts GROUP BY 1
)
SELECT t.stream_id, t.n, p50.p50, p95.p95
FROM totals t JOIN p50 USING (stream_id) JOIN p95 USING (stream_id)
"""


# Holt-Winters probe sizing: season 8 bins fits the sf0.01 per-stream
# history (~30-50 filtered events) with room past the two-season warmup;
# production uses the series' real seasonality (e.g. 24 hourly bins).
_HW_M, _HW_RW = 8, 50


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters + residual-band anomaly flags per stream.
    The recursion is genuinely sequential per series (applyInPandas on
    the Spark side), and the oracle replays the IDENTICAL float chain —
    init means, level/trend/seasonal updates, trailing-residual stddev —
    as a DuckDB recursive CTE carrying (level, trend, seasonal-vector,
    residual-history) state, so even this non-relational operator is
    hash-verified, not rows-only."""
    from ..operators.timeseries import holt_winters

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    return holt_winters(
        fact, season_length=_HW_M, order_cols=["event_id"]
    )


def _hw_sql() -> str:
    # every constant enters arithmetic as CAST(x AS DOUBLE) so the SQL
    # reproduces the Python operator's IEEE chain exactly (a bare 0.3
    # is DECIMAL in DuckDB: (1 - 0.3) would round differently)
    A, B, G = (
        "CAST(0.3 AS DOUBLE)",
        "CAST(0.05 AS DOUBLE)",
        "CAST(0.4 AS DOUBLE)",
    )
    M, RW = _HW_M, _HW_RW
    SI = f"(s[(t % {M}) + 1])"
    X = "(xs[t + 1])"
    F_ = f"(l + b + {SI})"
    R_ = f"({X} - {F_})"
    LN = f"({A} * ({X} - {SI}) + (1 - {A}) * (l + b))"
    BN = f"({B} * ({LN} - l) + (1 - {B}) * b)"
    SN = f"({G} * ({X} - {LN}) + (1 - {G}) * {SI})"
    SNEW = f"(s[1:(t % {M})] || [{SN}] || s[((t % {M}) + 2):{M}])"
    TAIL = f"(rh[greatest(1, len(rh) - {RW - 1}):len(rh)])"
    MU = f"(list_reduce({TAIL}, (acc, v) -> acc + v) / len({TAIL}))"
    SD = (
        f"(sqrt(list_reduce(list_transform({TAIL}, "
        f"v -> (v - {MU}) * (v - {MU})), (acc, v) -> acc + v) "
        f"/ len({TAIL})))"
    )
    FLAG = (
        f"(CASE WHEN len({TAIL}) >= 5 THEN "
        f"(CASE WHEN {SD} > 0 THEN abs({R_}) > 4.0 * {SD} "
        f"ELSE abs({R_}) > 0 END) END)"
    )
    OUTS = (
        f"CASE WHEN t >= {2 * M} THEN list_append(outs, "
        f"{{'i': t + 1, 'f': {F_}, 'r': {R_}, 'fl': {FLAG}}}) "
        "ELSE outs END"
    )
    M1 = f"(list_reduce(xs[1:{M}], (acc, v) -> acc + v) / {M})"
    M2 = f"(list_reduce(xs[{M + 1}:{2 * M}], (acc, v) -> acc + v) / {M})"
    return f"""
WITH RECURSIVE {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER (PARTITION BY stream_id
                            ORDER BY timestamp, event_id) AS rn
  FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
    AND value IS NOT NULL
), series AS (
  SELECT stream_id, list(value ORDER BY timestamp, event_id) AS xs
  FROM bounded GROUP BY stream_id
), init AS (
  SELECT stream_id, xs, CAST({M} AS BIGINT) AS t,
         {M1} AS l, ({M2} - {M1}) / {M} AS b,
         list_transform(xs[1:{M}], v -> v - {M1}) AS s,
         []::DOUBLE[] AS rh,
         []::STRUCT(i BIGINT, f DOUBLE, r DOUBLE, fl BOOLEAN)[] AS outs
  FROM series WHERE len(xs) >= {2 * M}
), rec AS (
  SELECT * FROM init
  UNION ALL
  SELECT stream_id, xs, t + 1, {LN}, {BN}, {SNEW},
         list_append(rh, {R_}), {OUTS}
  FROM rec WHERE t < len(xs)
), fin AS (
  SELECT stream_id, outs FROM rec WHERE t = len(xs)
), ov AS (
  SELECT stream_id, u.o.i AS i, u.o.f AS f, u.o.r AS r, u.o.fl AS fl
  FROM fin, LATERAL (SELECT unnest(outs) AS o) u
)
SELECT bd.stream_id, bd.timestamp, bd.event_id,
       round(bd.value, 4) AS value,
       round(ov.f, 4) AS forecast,
       round(ov.r, 4) AS residual,
       ov.fl AS is_anomaly
FROM bounded bd
LEFT JOIN ov ON ov.stream_id = bd.stream_id AND ov.i = bd.rn
"""


def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB display downsampling to 24 points per stream (parallel
    fixed-anchor variant): global first/last plus per-bucket max
    triangle area against neighbour-bucket mean anchors."""
    from ..operators.timeseries import lttb_downsample

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    out = lttb_downsample(fact, order_cols=["event_id"], n_out=24)
    return out.select(
        "stream_id", "bucket", "timestamp", "event_id", "value"
    )


SQL_LTTB_DOWNSAMPLE = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), idx AS (
  SELECT stream_id, timestamp, event_id, value,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY stream_id) AS n
  FROM bounded
  WINDOW w AS (PARTITION BY stream_id ORDER BY timestamp, event_id)
), bk AS (
  SELECT *, CAST(CASE WHEN n <= 24 THEN rn - 1
                      WHEN rn = 1 THEN 0
                      WHEN rn = n THEN 23
                      ELSE (rn - 2) * 22 // (n - 2) + 1 END AS INT) AS bucket
  FROM idx
), anch AS (
  SELECT stream_id, bucket, avg(rn) AS xb, round(avg(value), 6) AS yb
  FROM bk GROUP BY 1, 2
), nbr AS (
  SELECT stream_id, bucket,
         lag(xb) OVER w2 AS px, lag(yb) OVER w2 AS py,
         lead(xb) OVER w2 AS nx, lead(yb) OVER w2 AS ny
  FROM anch
  WINDOW w2 AS (PARTITION BY stream_id ORDER BY bucket)
), scored AS (
  SELECT bk.stream_id, bk.bucket, bk.timestamp, bk.event_id, bk.value,
         abs((px - nx) * (bk.value - py)
             - (px - bk.rn) * (ny - py)) AS area2
  FROM bk JOIN nbr ON nbr.stream_id = bk.stream_id
                  AND nbr.bucket = bk.bucket
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY stream_id, bucket
      ORDER BY area2 DESC NULLS LAST, timestamp, event_id) AS pick
  FROM scored
)
SELECT stream_id, bucket, timestamp, event_id, value
FROM ranked WHERE pick = 1
"""

def q_lttb_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB at scale: the bin-composed production variant — A1 hourly
    pre-binning (a map-side-combinable groupBy, no ordered window over
    raw samples) feeds the same 24-point LTTB.  The per-key sort LTTB
    does need then runs over the BINNED series, whose length is bounded
    by the time range / binsize however dense the raw sampling gets —
    the full-history per-sample sort of the registered `lttb_downsample`
    row (87 s sort-bound at x1000, SCALING.md) never materializes.
    That is also how the reference's consumers actually draw: the
    exporter ships BINNED history (aggregation binsize = the grapher's
    pixel budget), so a pixel-budget downsampler composing on top of
    bins is the operational shape.

    Bin means are exact integer micro-unit sums divided once —
    order-independent and engine-identical (seasonal_decompose's
    quantization discipline), so LTTB's triangle arithmetic starts from
    bit-identical doubles on both engines."""
    from ..operators.timeseries import lttb_downsample

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    binned = fact.groupBy(
        "stream_id",
        F.expr("(CAST(timestamp AS BIGINT) div 3600) * 3600").alias(
            "binstart"
        ),
    ).agg(
        (
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("double")
            / F.count(F.lit(1))
            / F.lit(1e6)
        ).alias("bin_value")
    )
    out = lttb_downsample(
        binned, ts_col="binstart", value_col="bin_value", n_out=24
    )
    return out.select("stream_id", "bucket", "binstart", "bin_value")


SQL_LTTB_BINNED = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), bin AS (
  SELECT stream_id, (timestamp // 3600) * 3600 AS binstart,
         CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS DOUBLE)
           / count(*) / 1e6 AS bin_value
  FROM bounded GROUP BY 1, 2
), idx AS (
  SELECT stream_id, binstart, bin_value,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY stream_id) AS n
  FROM bin
  WINDOW w AS (PARTITION BY stream_id ORDER BY binstart)
), bk AS (
  SELECT *, CAST(CASE WHEN n <= 24 THEN rn - 1
                      WHEN rn = 1 THEN 0
                      WHEN rn = n THEN 23
                      ELSE (rn - 2) * 22 // (n - 2) + 1 END AS INT) AS bucket
  FROM idx
), anch AS (
  SELECT stream_id, bucket, avg(rn) AS xb, round(avg(bin_value), 6) AS yb
  FROM bk GROUP BY 1, 2
), nbr AS (
  SELECT stream_id, bucket,
         lag(xb) OVER w2 AS px, lag(yb) OVER w2 AS py,
         lead(xb) OVER w2 AS nx, lead(yb) OVER w2 AS ny
  FROM anch
  WINDOW w2 AS (PARTITION BY stream_id ORDER BY bucket)
), scored AS (
  SELECT bk.stream_id, bk.bucket, bk.binstart, bk.bin_value,
         abs((px - nx) * (bk.bin_value - py)
             - (px - bk.rn) * (ny - py)) AS area2
  FROM bk JOIN nbr ON nbr.stream_id = bk.stream_id
                  AND nbr.bucket = bk.bucket
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY stream_id, bucket
      ORDER BY area2 DESC NULLS LAST, binstart) AS pick
  FROM scored
)
SELECT stream_id, bucket, binstart, bin_value
FROM ranked WHERE pick = 1
"""


def q_twa_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per (stream, hour) under hold-last-value
    interpolation — RRD AVERAGE-consolidation semantics (a sample holds
    until the next one; the last holds to its own bin end)."""
    from ..operators.timeseries import time_weighted_avg

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    return time_weighted_avg(
        fact, binsize=3600, order_cols=["event_id"]
    )


SQL_TWA_BIN = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), seg0 AS (
  SELECT stream_id, timestamp, value,
         coalesce(lead(timestamp) OVER (PARTITION BY stream_id
                                        ORDER BY timestamp, event_id),
                  (timestamp // 3600 + 1) * 3600) AS e
  FROM bounded
), seg AS (SELECT * FROM seg0 WHERE e > timestamp),
ex AS (
  SELECT stream_id, timestamp, value, e,
         unnest(range(timestamp // 3600, (e - 1) // 3600 + 1)) AS bin
  FROM seg
), wtd AS (
  SELECT stream_id, bin, value,
         least(e, (bin + 1) * 3600)
           - greatest(timestamp, bin * 3600) AS wt
  FROM ex
)
SELECT stream_id, CAST(bin * 3600 AS BIGINT) AS binstart,
       round(sum(value * wt) / sum(wt), 6) AS twa,
       CAST(sum(wt) AS BIGINT) AS covered_seconds
FROM wtd GROUP BY 1, 2
"""

def _hourly_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared consolidation grid for the correlation queries: per-
    (stream, hour) round-6 mean — correlations run over the CONSOLIDATED
    volume, never raw samples."""
    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    return (
        fact.withColumn(
            "bin", F.expr("CAST(timestamp AS BIGINT) div 3600")
        )
        .groupBy("stream_id", "bin")
        .agg(F.round(F.avg("value"), 6).alias("value"))
    )


def q_acf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream autocorrelation of the hourly-mean series at row lags
    1-3: one ordered window materializes every lag column in a single
    exchange, one grouped aggregate computes the correlations."""
    from ..operators.correlate import autocorrelation

    return autocorrelation(
        _hourly_binned(spark, sf_dir), lags=[1, 2, 3], bin_col="bin"
    )


SQL_ACF_STREAM = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), binned AS (
  SELECT stream_id, timestamp // 3600 AS bin,
         round(avg(value), 6) AS v
  FROM bounded GROUP BY 1, 2
), lagd AS (
  SELECT stream_id, v,
         lag(v, 1) OVER w AS l1,
         lag(v, 2) OVER w AS l2,
         lag(v, 3) OVER w AS l3
  FROM binned
  WINDOW w AS (PARTITION BY stream_id ORDER BY bin)
), u AS (
  SELECT stream_id, 1 AS lag, CAST(count(l1) AS BIGINT) AS n_pairs,
         round(corr(v, l1), 4) AS acf FROM lagd GROUP BY 1
  UNION ALL
  SELECT stream_id, 2 AS lag, CAST(count(l2) AS BIGINT) AS n_pairs,
         round(corr(v, l2), 4) AS acf FROM lagd GROUP BY 1
  UNION ALL
  SELECT stream_id, 3 AS lag, CAST(count(l3) AS BIGINT) AS n_pairs,
         round(corr(v, l3), 4) AS acf FROM lagd GROUP BY 1
)
SELECT stream_id, lag, n_pairs,
       CASE WHEN n_pairs >= 8 THEN acf END AS acf
FROM u
"""


def q_stream_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most-correlated stream pairs over shared hourly bins —
    the mesh/matrix "which paths degrade together" question; one
    equi-join on the time axis + one grouped aggregate, top-n via
    TakeOrderedAndProject."""
    from ..operators.correlate import stream_correlation

    return stream_correlation(
        _hourly_binned(spark, sf_dir),
        bin_col="bin",
        min_overlap=8,
        top_n=50,
    )


SQL_STREAM_CORR = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
), binned AS (
  SELECT stream_id, timestamp // 3600 AS bin,
         round(avg(value), 6) AS v
  FROM bounded GROUP BY 1, 2
), pairs AS (
  SELECT a.stream_id AS stream_a, b.stream_id AS stream_b,
         CAST(count(*) AS BIGINT) AS n_bins,
         round(corr(a.v, b.v), 4) AS corr
  FROM binned a JOIN binned b
    ON a.bin = b.bin AND a.stream_id < b.stream_id
  GROUP BY 1, 2
)
SELECT stream_a, stream_b, n_bins, corr FROM pairs
WHERE n_bins >= 8 AND corr IS NOT NULL
ORDER BY abs(corr) DESC, stream_a, stream_b
LIMIT 50
"""

SQL_HOLT_WINTERS = _hw_sql()



def q_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier repair over every 10th stream (whole-stream
    subset — the window partitions on the stream, so filtering entire
    streams leaves every surviving row's neighborhood intact): each
    point vs the median/MAD of its centered +/-10 window.  Row-level
    output so the oracle hash pins every median, threshold, flag, and
    repaired value.  NULL values are filtered first on BOTH sides
    (DuckDB's list() keeps NULLs where collect_list drops them)."""
    from ..operators.timeseries import hampel_filter

    fact = time_filter(events_fact(spark, sf_dir, START, STOP), START, STOP)
    fact = fact.where(
        F.col("value").isNotNull() & (F.col("stream_id") % 10 == 0)
    )
    return hampel_filter(
        fact, order_cols=["event_id"], half_window=10,
        n_sigmas=3.0, min_points=5,
    ).select(
        "stream_id", "timestamp", "event_id", "value",
        "med", "mad_sigma", "is_outlier", "repaired",
    )


SQL_HAMPEL = f"""
WITH {_FACT_CTE},
bounded AS (
  SELECT stream_id, timestamp, event_id, value FROM fact
  WHERE timestamp >= {START} AND timestamp <= {STOP}
    AND value IS NOT NULL AND stream_id % 10 = 0
), nb AS (
  SELECT stream_id, timestamp, event_id, value,
         list_sort(list(value) OVER w) AS ls
  FROM bounded
  WINDOW w AS (PARTITION BY stream_id ORDER BY timestamp, event_id
               ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING)
), medians AS (
  SELECT *, len(ls) AS n,
         (ls[(len(ls) + 1) // 2] + ls[len(ls) // 2 + 1]) / 2 AS med
  FROM nb
), scaled AS (
  SELECT *,
         CAST('4.4478' AS DOUBLE) * (
           (list_sort(list_transform(ls, v -> abs(v - med)))[(n + 1) // 2]
            + list_sort(list_transform(ls, v -> abs(v - med)))[n // 2 + 1])
           / 2) AS mad_sigma
  FROM medians
)
SELECT stream_id, timestamp, event_id, value, med, mad_sigma,
       CASE WHEN n >= 5 THEN abs(value - med) > mad_sigma END AS is_outlier,
       CASE WHEN n >= 5 AND abs(value - med) > mad_sigma
            THEN med ELSE value END AS repaired
FROM scaled
"""



def q_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap detection over the full fact: silences > 3x each
    stream's estimated frequency, with the missed-sample estimate —
    the retrospective sibling of streaming/gaps.py."""
    from ..operators.frequency import gap_report

    return gap_report(
        events_fact(spark, sf_dir), k=3.0, order_cols=["event_id"]
    )


# the frequency estimate is the registered SQL_FREQUENCY verbatim (one
# nested subquery), so the gap threshold derives from the exact same
# oracle-pinned cadence
SQL_GAP_REPORT = f"""
WITH {_FACT_CTE},
freqs AS (SELECT * FROM ({SQL_FREQUENCY}) f),
lagged AS (
  SELECT stream_id, timestamp,
         lag(timestamp) OVER (PARTITION BY stream_id
                              ORDER BY timestamp, event_id) AS prev
  FROM fact
)
SELECT l.stream_id, l.prev AS gap_start, l.timestamp AS gap_end,
       CAST(l.timestamp - l.prev AS BIGINT) AS gap_seconds,
       greatest(CAST(floor((l.timestamp - l.prev) / f.frequency)
                     AS BIGINT) - 1, 1) AS missed,
       f.frequency
FROM lagged l JOIN freqs f USING (stream_id)
WHERE l.prev IS NOT NULL AND f.frequency > 0
  AND l.timestamp - l.prev > CAST(3.0 AS DOUBLE) * f.frequency
"""



def q_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream availability over each stream's own observed span —
    1 minus the gap_report silences' share, the uptime number the
    reference's matrix consumers derive from bin presence."""
    from ..operators.frequency import availability_report

    return availability_report(
        events_fact(spark, sf_dir), k=3.0, order_cols=["event_id"]
    )


SQL_AVAILABILITY = f"""
WITH {_FACT_CTE},
freqs AS (SELECT * FROM ({SQL_FREQUENCY}) f),
lagged AS (
  SELECT stream_id, timestamp,
         lag(timestamp) OVER (PARTITION BY stream_id
                              ORDER BY timestamp, event_id) AS prev
  FROM fact
),
gaps AS (
  SELECT l.stream_id,
         CAST(l.timestamp - l.prev AS BIGINT) AS gap_seconds
  FROM lagged l JOIN freqs f USING (stream_id)
  WHERE l.prev IS NOT NULL AND f.frequency > 0
    AND l.timestamp - l.prev > CAST(3.0 AS DOUBLE) * f.frequency
),
g AS (
  SELECT stream_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_seconds) AS BIGINT) AS silent_seconds
  FROM gaps GROUP BY stream_id
),
span AS (
  SELECT stream_id, min(timestamp) AS lo, max(timestamp) AS hi
  FROM fact GROUP BY stream_id
)
SELECT s.stream_id,
       CAST(coalesce(g.n_gaps, 0) AS BIGINT) AS n_gaps,
       CAST(coalesce(g.silent_seconds, 0) AS BIGINT) AS silent_seconds,
       CAST(s.hi - s.lo AS BIGINT) AS span_seconds,
       CASE WHEN s.hi > s.lo THEN
         round(1.0::DOUBLE - coalesce(g.silent_seconds, 0)
               / CAST(s.hi - s.lo AS DOUBLE), 4)
       END AS availability
FROM span s LEFT JOIN g USING (stream_id)
"""


def q_gap_report_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gap_report at scale: the bounded production variant — last day of
    history through the LOADER's start= (a literal on the raw ts column,
    pushed to the parquet scan) + the reference's 200-diff frequency
    sampling (exporter.py:509-510), mirroring `frequency_bounded`.  The
    unbounded `gap_report` row keeps the full-history semantics; this
    row pins the path a 100x user actually runs ("silences in the last
    day"), whose per-stream sort input is the recent slice, not the
    corpus (SCALING.md: the unbounded x1000 cells are 61-87 s
    sort-bound)."""
    from ..operators.frequency import estimate_frequency, gap_report

    fact = events_fact(spark, sf_dir)
    hi = fact.agg(F.max("timestamp")).collect()[0][0]
    recent = events_fact(spark, sf_dir, start=int(hi) - 86_400)
    freq = estimate_frequency(recent, max_diffs=200, fill_defaults=False)
    return gap_report(
        recent, k=3.0, order_cols=["event_id"], frequency=freq
    )


# the bounded-slice cadence estimate, shared by the two bounded rows:
# SQL_FREQUENCY_BOUNDED's CTE chain minus the default-fill tail
# (gap_report passes fill_defaults=False — diff-less keys are
# unreachable for gaps anyway)
_BOUNDED_EST_CTES = """
bounded AS (
  SELECT stream_id, timestamp, event_id FROM fact
  WHERE timestamp >= (SELECT max(timestamp) - 86400 FROM fact)
), numbered AS (
  SELECT stream_id,
         row_number() OVER (PARTITION BY stream_id ORDER BY timestamp) AS rn,
         timestamp - lag(timestamp) OVER (PARTITION BY stream_id
                                          ORDER BY timestamp) AS diff
  FROM bounded
), d AS (
  SELECT stream_id, diff FROM numbered WHERE diff IS NOT NULL AND rn <= 201
), counted AS (
  SELECT stream_id, diff, count(*) AS cnt FROM d GROUP BY stream_id, diff
), per_key AS (
  SELECT stream_id, sum(cnt) AS total, max(cnt) AS mode_cnt,
         sum(cnt * diff) AS wsum
  FROM counted GROUP BY stream_id
), mode_pick AS (
  SELECT stream_id, diff AS mode_diff FROM (
    SELECT stream_id, diff,
           row_number() OVER (PARTITION BY stream_id
                              ORDER BY cnt DESC, diff ASC) AS rn
    FROM counted) WHERE rn = 1
), small20 AS (
  SELECT c.stream_id, min(c.diff) AS small20
  FROM counted c JOIN per_key p ON c.stream_id = p.stream_id
  WHERE c.cnt * 5 >= p.total GROUP BY c.stream_id
), freqs AS (
  SELECT p.stream_id,
         CAST(CASE WHEN p.mode_cnt * 2 >= p.total THEN m.mode_diff
                   WHEN s.small20 IS NOT NULL THEN s.small20
                   ELSE CAST(round(p.wsum / p.total) AS BIGINT)
              END AS BIGINT) AS frequency
  FROM per_key p
  JOIN mode_pick m ON p.stream_id = m.stream_id
  LEFT JOIN small20 s ON p.stream_id = s.stream_id
), lagged AS (
  SELECT stream_id, timestamp,
         lag(timestamp) OVER (PARTITION BY stream_id
                              ORDER BY timestamp, event_id) AS prev
  FROM bounded
)"""

SQL_GAP_REPORT_BOUNDED = f"""
WITH {_FACT_CTE},
{_BOUNDED_EST_CTES}
SELECT l.stream_id, l.prev AS gap_start, l.timestamp AS gap_end,
       CAST(l.timestamp - l.prev AS BIGINT) AS gap_seconds,
       greatest(CAST(floor((l.timestamp - l.prev) / f.frequency)
                     AS BIGINT) - 1, 1) AS missed,
       f.frequency
FROM lagged l JOIN freqs f USING (stream_id)
WHERE l.prev IS NOT NULL AND f.frequency > 0
  AND l.timestamp - l.prev > CAST(3.0 AS DOUBLE) * f.frequency
"""


def q_gap_report_summary_bounded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-stream gap ROLLUP over the bounded slice: the "summarize my
    gaps" production shape (r10 verdict task #2 — the last sort-bound
    family member with no registered bounded variant; its unbounded
    probe ran 12.4x/decade).  Same bounds as `gap_report_bounded`
    (last-day loader-pushed scan + the reference's 200-diff sampling,
    exporter.py:509-510), with one keys-bounded aggregate on top:
    (n_gaps, silent_seconds, longest_gap, missed_total) per stream —
    the outage dashboard row, not the per-gap listing."""
    from ..operators.frequency import estimate_frequency, gap_report

    fact = events_fact(spark, sf_dir)
    hi = fact.agg(F.max("timestamp")).collect()[0][0]
    recent = events_fact(spark, sf_dir, start=int(hi) - 86_400)
    freq = estimate_frequency(recent, max_diffs=200, fill_defaults=False)
    gaps = gap_report(
        recent, k=3.0, order_cols=["event_id"], frequency=freq
    )
    return gaps.groupBy("stream_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_seconds").cast("long").alias("silent_seconds"),
        F.max("gap_seconds").cast("long").alias("longest_gap"),
        F.sum("missed").cast("long").alias("missed_total"),
    )


SQL_GAP_REPORT_SUMMARY_BOUNDED = f"""
WITH {_FACT_CTE},
{_BOUNDED_EST_CTES},
gaps AS (
  SELECT l.stream_id,
         CAST(l.timestamp - l.prev AS BIGINT) AS gap_seconds,
         greatest(CAST(floor((l.timestamp - l.prev) / f.frequency)
                       AS BIGINT) - 1, 1) AS missed
  FROM lagged l JOIN freqs f USING (stream_id)
  WHERE l.prev IS NOT NULL AND f.frequency > 0
    AND l.timestamp - l.prev > CAST(3.0 AS DOUBLE) * f.frequency
)
SELECT stream_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap_seconds) AS BIGINT) AS silent_seconds,
       CAST(max(gap_seconds) AS BIGINT) AS longest_gap,
       CAST(sum(missed) AS BIGINT) AS missed_total
FROM gaps GROUP BY stream_id
"""


def q_availability_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availability over the last day's slice with the bounded cadence
    estimate — the production rollup of `gap_report_bounded` (span and
    silences both measured on the recent slice: "yesterday's uptime"),
    same bounds as `frequency_bounded`."""
    from ..operators.frequency import (
        availability_report,
        estimate_frequency,
    )

    fact = events_fact(spark, sf_dir)
    hi = fact.agg(F.max("timestamp")).collect()[0][0]
    recent = events_fact(spark, sf_dir, start=int(hi) - 86_400)
    freq = estimate_frequency(recent, max_diffs=200, fill_defaults=False)
    return availability_report(
        recent, k=3.0, order_cols=["event_id"], frequency=freq
    )


SQL_AVAILABILITY_BOUNDED = f"""
WITH {_FACT_CTE},
{_BOUNDED_EST_CTES},
gaps AS (
  SELECT l.stream_id,
         CAST(l.timestamp - l.prev AS BIGINT) AS gap_seconds
  FROM lagged l JOIN freqs f USING (stream_id)
  WHERE l.prev IS NOT NULL AND f.frequency > 0
    AND l.timestamp - l.prev > CAST(3.0 AS DOUBLE) * f.frequency
),
g AS (
  SELECT stream_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_seconds) AS BIGINT) AS silent_seconds
  FROM gaps GROUP BY stream_id
),
span AS (
  SELECT stream_id, min(timestamp) AS lo, max(timestamp) AS hi
  FROM bounded GROUP BY stream_id
)
SELECT s.stream_id,
       CAST(coalesce(g.n_gaps, 0) AS BIGINT) AS n_gaps,
       CAST(coalesce(g.silent_seconds, 0) AS BIGINT) AS silent_seconds,
       CAST(s.hi - s.lo AS BIGINT) AS span_seconds,
       CASE WHEN s.hi > s.lo THEN
         round(1.0::DOUBLE - coalesce(g.silent_seconds, 0)
               / CAST(s.hi - s.lo AS DOUBLE), 4)
       END AS availability
FROM span s LEFT JOIN g USING (stream_id)
"""


TAIL_REGISTRY = {
    "smoke_array": (q_smoke_array, SQL_SMOKE_ARRAY),
    "funnel": (q_funnel, SQL_FUNNEL),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "event_asof": (q_event_asof, SQL_EVENT_ASOF),
    "gapfill_locf": (q_gapfill_locf, SQL_GAPFILL_LOCF),
    "counter_rate": (q_counter_rate, SQL_COUNTER_RATE),
    "anomaly_zscore": (q_anomaly_zscore, SQL_ANOMALY_ZSCORE),
    "rollup_percentile": (q_rollup_percentile, SQL_ROLLUP_PERCENTILE),
    # round-8: bounded-lookback EWMA smoothing (the level term of the
    # downstream eventing family's detectors)
    "ewma_smooth": (q_ewma_smooth, SQL_EWMA_SMOOTH),
    # round-8: the recursive triple-exponential detector, oracle-pinned
    # via a recursive-CTE state machine
    "holt_winters": (q_holt_winters, SQL_HOLT_WINTERS),
    # round-9: two-sided CUSUM changepoint detection via the
    # cumsum-minus-running-min closed form of Page's recursion
    "cusum_change": (q_cusum_change, SQL_CUSUM_CHANGE),
    # round-9: point-in-interval attribution via the bucketed
    # replicate-intervals equi-join (no nested-loop, no dedup pass)
    "interval_attr": (q_interval_attr, SQL_INTERVAL_ATTR),
    # round-9: classical additive seasonal decomposition (centered-MA
    # trend, centered phase-mean seasonal, remainder)
    "seasonal_decompose": (q_seasonal_decompose, SQL_SEASONAL_DECOMPOSE),
    # round-9: LTTB pixel-budget downsampling (parallel fixed-anchor
    # variant: neighbour-bucket mean anchors, argmax triangle area)
    "lttb_downsample": (q_lttb_downsample, SQL_LTTB_DOWNSAMPLE),
    # round-10: the bin-composed production variant (A1 hourly pre-bin
    # feeds the same 24-point LTTB — the per-key sort sees bins, not
    # raw samples; the operational grapher shape)
    "lttb_binned": (q_lttb_binned, SQL_LTTB_BINNED),
    # round-9: RRD AVERAGE-consolidation semantics — hold-last-value
    # time-weighted per-bin means, exact integer-second weights
    "twa_bin": (q_twa_bin, SQL_TWA_BIN),
    # round-9: correlation analytics over the consolidated grid
    "acf_stream": (q_acf_stream, SQL_ACF_STREAM),
    "stream_corr": (q_stream_corr, SQL_STREAM_CORR),
    # round-9: Hampel outlier repair (rolling median/MAD — the robust
    # sibling of anomaly_zscore; a spike cannot inflate its own gate)
    "hampel_outliers": (q_hampel, SQL_HAMPEL),
    # round-9: batch gap detection against the T9 cadence estimate (the
    # retrospective sibling of the streaming outage detector)
    "gap_report": (q_gap_report, SQL_GAP_REPORT),
    # round-9: per-stream uptime over the observed span (gap_report's
    # rollup — the matrix consumers' availability number)
    "availability": (q_availability, SQL_AVAILABILITY),
    # round-10: the bounded production variants (last-day pushed scan
    # bound + 200-diff sampling, frequency_bounded's pattern) — the
    # paths a 100x user runs where the unbounded rows sort full history
    "gap_report_bounded": (q_gap_report_bounded, SQL_GAP_REPORT_BOUNDED),
    "availability_bounded": (
        q_availability_bounded,
        SQL_AVAILABILITY_BOUNDED,
    ),
    # round-11: the per-stream gap rollup over the same bounds — the
    # last sort-bound family member gets its registered production shape
    "gap_report_summary_bounded": (
        q_gap_report_summary_bounded,
        SQL_GAP_REPORT_SUMMARY_BOUNDED,
    ),
}
