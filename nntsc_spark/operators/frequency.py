"""Measurement-cadence (frequency) estimation — SURVEY.md §2.8 T9.

The reference infers each label's measurement period from the timestamp
gaps of its history (libnntsc/exporter.py:736-822): take consecutive
timestamp differences, then

1. if one gap value accounts for >= 50%% of the diffs, use it (the mode);
2. else use the smallest gap that accounts for >= 20%%;
3. else fall back to the rounded mean gap.

(The reference samples only the first 200 diffs because its rows pass
through the driver anyway, exporter.py:509-510; the distributed version uses
all diffs — strictly more information, same rule chain.)

Spark-first: a lag window per stream computes diffs without collecting;
the rule chain is a conditional over per-(stream, diff) counts — two
shuffles on the stream key, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_FREQUENCY = 300  # reference fallback (exporter.py:793-796)


def timestamp_diffs(
    fact: DataFrame, key: str = "stream_id", max_diffs: int | None = None
) -> DataFrame:
    """Consecutive per-key timestamp gaps; ``max_diffs`` keeps only the
    FIRST n diffs per key in time order (the reference's sampling bound,
    exporter.py:509-510).  The row_number shares the lag's window spec, so
    the cap adds no second sort — it bounds everything downstream."""
    w = Window.partitionBy(key).orderBy("timestamp")
    diffs = fact.select(key, "timestamp").withColumn(
        "diff", F.col("timestamp") - F.lag("timestamp").over(w)
    )
    if max_diffs is not None:
        # row 1 per key has a NULL diff, so rows 2..max_diffs+1 are the
        # first max_diffs diffs
        diffs = diffs.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= max_diffs + 1
        ).drop("_rn")
    return diffs.where(F.col("diff").isNotNull())


def estimate_frequency(
    fact: DataFrame,
    key: str = "stream_id",
    since: int | None = None,
    max_diffs: int | None = None,
    key_source: DataFrame | None = None,
    fill_defaults: bool = True,
) -> DataFrame:
    """Per-key frequency estimate -> DataFrame(key, frequency BIGINT).

    ``fill_defaults=False`` skips the quiet-key default fill (the
    dropDuplicates scan + left join that gives <2-row keys the 300 s
    reference default) and returns only keys with an actual estimate —
    for consumers like :func:`gap_report` where diff-less keys are
    unreachable anyway, the fill is a whole extra pass over the fact.

    ``counted``'s lineage contains the per-key WINDOW SORT over the whole
    history — by far the expensive stage.  It is consumed exactly ONCE:
    the share->=20% rule gets its per-key total from a window over the
    TINY counted table (keys x distinct gaps) instead of the old
    join-back, which re-evaluated the sort per lazy branch and made
    frequency the only super-linear probe row (23x for a 10x data step at
    x1000; single-consumption is ~8x, scan-linear).

    The unbounded default sorts each stream's ENTIRE history — correct,
    and what the registered oracle query pins, but super-linear at scale
    (SCALING.md).  The reference itself never pays that: it samples the
    first 200 diffs (exporter.py:509-510).  Two in-code bounds restore
    scan-linearity for production callers:

    - ``since``: drop rows before this epoch BEFORE the window.  NOTE on
      pushdown: when ``fact`` derives its epoch column from a raw
      timestamp (events_fact), a predicate on the DERIVED column stops at
      the projection — pass a pre-bounded fact built with the loader's
      own ``start=`` (literal on the raw column, pushed to the parquet
      scan) and supply the unbounded table as ``key_source`` instead;
      ``since`` remains for plain integer-ts facts where it does push.
    - ``max_diffs``: per-stream first-n diff sampling, the literal
      reference rule.  Alone it can't shrink the scan (the sort must see
      each stream's head), but it bounds the aggregation input; combined
      with a scan bound both stages are bounded.
    - ``key_source``: the table that defines the key DOMAIN (defaults to
      ``fact``) — with a bounded fact, pass the unbounded table here so
      streams with no recent rows still get the 300 s default instead of
      vanishing.
    """
    diffs_src = fact
    if since is not None:
        diffs_src = fact.where(F.col("timestamp") >= F.lit(int(since)))
    diffs = timestamp_diffs(diffs_src, key, max_diffs)
    counted = diffs.groupBy(key, "diff").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy(key))
    enriched = counted.withColumn("total", total)
    per_key = enriched.groupBy(key).agg(
        F.max("total").alias("total"),
        # mode diff: max by (count, then smaller diff wins ties)
        F.min_by(F.col("diff"), F.struct((-F.col("cnt")).alias("n"), F.col("diff"))).alias(
            "mode_diff"
        ),
        F.max("cnt").alias("mode_cnt"),
        F.sum(F.col("cnt") * F.col("diff")).alias("wsum"),
        # smallest diff with share >= 20% (NULL when none qualifies)
        F.min(
            F.when(F.col("cnt") * 5 >= F.col("total"), F.col("diff"))
        ).alias("small20"),
    )
    out = per_key.select(
        key,
        F.when(F.col("mode_cnt") * 2 >= F.col("total"), F.col("mode_diff"))
        .when(F.col("small20").isNotNull(), F.col("small20"))
        .otherwise(F.round(F.col("wsum") / F.col("total")).cast("long"))
        .alias("frequency"),
    )
    # keys with <2 rows have no diffs and vanished from `out` entirely;
    # the reference returns the 300 s default for them (exporter.py:793-796)
    # — left-join the full key set back and fill (r5 review finding:
    # DEFAULT_FREQUENCY was defined but never applied)
    if not fill_defaults:
        return out.select(key, F.col("frequency").cast("long"))
    all_keys = (key_source if key_source is not None else fact).select(
        key
    ).dropDuplicates()
    return all_keys.join(out, key, "left").select(
        key,
        F.coalesce(F.col("frequency"), F.lit(DEFAULT_FREQUENCY))
        .cast("long")
        .alias("frequency"),
    )


def gap_report(
    fact: DataFrame,
    k: float = 3.0,
    key: str = "stream_id",
    ts_col: str = "timestamp",
    order_cols: list[str] | None = None,
    frequency: DataFrame | None = None,
    since: int | None = None,
    max_diffs: int | None = None,
) -> DataFrame:
    """Batch gap detection: every per-key silence longer than ``k x``
    the key's estimated frequency — the retrospective analogue of the
    online detector (streaming/gaps.py), and the engine-side version of
    what the reference's graphing layer does client-side with the
    exported frequency estimate (T9 feeds the grapher's line breaks).

    ``frequency`` injects a pre-computed (key, frequency) table (e.g.
    the bounded production estimate); by default the estimate runs over
    the same fact.  One ordered window for the lag + one join against
    the keys-bounded frequency table (AQE picks broadcast when it
    fits); keys with frequency 0 (all samples share one timestamp)
    cannot define a gap and emit nothing.

    Output: (key, gap_start, gap_end, gap_seconds, missed, frequency)
    where ``missed ~= gap_seconds/frequency - 1`` (>= 1) estimates the
    lost samples.
    """
    freq = frequency if frequency is not None else estimate_frequency(
        fact, key=key, since=since, max_diffs=max_diffs,
        # keys without diffs cannot have gaps: the default fill would be
        # a whole extra pass over the fact to add unreachable rows
        fill_defaults=False,
    )
    order_cols = order_cols or []
    w = Window.partitionBy(key).orderBy(ts_col, *order_cols)
    lagged = fact.select(key, ts_col, *order_cols).withColumn(
        "_prev", F.lag(ts_col).over(w)
    )
    delta = F.col(ts_col) - F.col("_prev")
    return (
        lagged.join(freq, key)
        .where(
            F.col("_prev").isNotNull()
            & (F.col("frequency") > 0)
            & (delta > F.lit(float(k)) * F.col("frequency"))
        )
        .select(
            key,
            F.col("_prev").alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            delta.cast("long").alias("gap_seconds"),
            F.greatest(
                F.floor(delta / F.col("frequency")) - 1, F.lit(1)
            )
            .cast("long")
            .alias("missed"),
            "frequency",
        )
    )


def availability_report(
    fact: DataFrame,
    k: float = 3.0,
    key: str = "stream_id",
    ts_col: str = "timestamp",
    order_cols: list[str] | None = None,
    frequency: DataFrame | None = None,
    since: int | None = None,
    max_diffs: int | None = None,
) -> DataFrame:
    """Per-key availability over each key's own observed span: the
    fraction of [first, last] NOT covered by :func:`gap_report`
    silences — the uptime number the reference's matrix/graph consumers
    derive from bin presence, computed engine-side from the cadence
    estimate instead.

    Measuring against the key's own span (not a fixed window) keeps the
    report honest at the edges: a stream that starts late or retires
    early is not charged for time nobody expected it to report.  Keys
    with a single observation have no span and emit NULL availability.

    One extra keys-bounded aggregate on top of gap_report's plan.

    Output: (key, n_gaps, silent_seconds, span_seconds, availability).
    """
    gaps = gap_report(
        fact, k=k, key=key, ts_col=ts_col, order_cols=order_cols,
        frequency=frequency, since=since, max_diffs=max_diffs,
    )
    span = fact.groupBy(key).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    g = gaps.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_seconds").cast("long").alias("silent_seconds"),
    )
    return span.join(g, key, "left").select(
        key,
        F.coalesce(F.col("n_gaps"), F.lit(0)).cast("long").alias("n_gaps"),
        F.coalesce(F.col("silent_seconds"), F.lit(0))
        .cast("long")
        .alias("silent_seconds"),
        (F.col("_hi") - F.col("_lo")).cast("long").alias("span_seconds"),
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.round(
                1.0
                - F.coalesce(F.col("silent_seconds"), F.lit(0))
                / (F.col("_hi") - F.col("_lo")).cast("double"),
                4,
            ),
        ).alias("availability"),
    )
