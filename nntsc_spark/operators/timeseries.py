"""Derived time-series analytics: as-of joins, gap filling, counter
rates, rolling anomaly scores.

The reference stores and serves raw/binned series; its consumers (the
graphing layer and alerting scripts downstream of the export protocol)
recompute exactly these derivations client-side over NNTSC history:
gap detection around the measurement frequency (reference:
libnntsc/exporter.py frequency estimation feeds the grapher's gap
breaks), RRD-style counter rates (the RRD family NNTSC scrapes stores
COUNTER DSs — rrd_smokeping.py's source format), and event detection
over latency series (the eventing sibling consumes NNTSC exports).
Pushing them into the engine turns per-client Python loops into
distributed plans.

Scale shape shared by all four: ONE shuffle on the series key into a
per-key ordered window — no self-joins, no range-join row explosion,
no driver loops.  A pathologically hot key serializes through one
partition's sort; that is inherent to per-key ordered semantics (same
cost class as W2's lag windows) and is bounded in practice by
time-slicing the input before derivation (operators/chunking.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "stream_id",
    ts_col: str = "timestamp",
    tolerance: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: each left row picks up the latest right row
    with ``right.ts <= left.ts`` on the same key (inclusive), or NULLs
    when none exists (left-join semantics) — the standard alignment of
    an event stream against slowly-changing reference points (quotes
    before trades; last config change before a measurement).

    Spark-first shape: instead of a range join (which explodes into a
    per-pair inequality filter) the two sides are TAGGED and UNIONED,
    then a single per-key ordered window carries the most recent right
    payload forward onto each left row (``last(..., ignorenulls)``) —
    one shuffle, linear work, no pair blowup.  At equal timestamps the
    right row sorts first, making the match inclusive.

    ``tolerance`` (seconds) nulls out matches older than ``left.ts -
    tolerance`` (pandas ``merge_asof`` semantics).  The matched right
    timestamp is emitted as ``{ts_col}{suffix}``.

    Contract: ``right`` must be unique per ``(on, ts_col)`` — with ties
    the carried payload would be sort-nondeterministic; pre-aggregate
    the right side (e.g. ``max_by``) to one row per key+ts first.
    Right payload columns colliding with left names get ``suffix``.
    """
    payload = [c for c in right.columns if c not in (on, ts_col)]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    rts = ts_col + suffix

    l2 = left.withColumn("_side", F.lit(1))
    for c in payload:
        l2 = l2.withColumn(out_names[c], F.lit(None).cast(dict(right.dtypes)[c]))
    l2 = l2.withColumn(rts, F.lit(None).cast(dict(right.dtypes)[ts_col]))
    r2 = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(out_names[c]) for c in payload],
        F.col(ts_col).alias(rts),
    )
    extra = [c for c in l2.columns if c not in r2.columns]
    for c in extra:
        r2 = r2.withColumn(c, F.lit(None).cast(dict(l2.dtypes)[c]))
    u = l2.select(*l2.columns).unionByName(r2.select(*l2.columns))

    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [out_names[c] for c in payload] + [rts]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        stale = F.col(rts).isNull() | (
            F.col(ts_col) - F.col(rts) > int(tolerance)
        )
        for c in carried:
            out = out.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c))
            )
    return out


def gapfill(
    binned: DataFrame,
    binsize: int,
    start: int,
    stop: int,
    key: str = "stream_id",
    bin_col: str = "binstart",
    value_cols: list[str] | None = None,
    method: str = "locf",
) -> DataFrame:
    """Regularize a binned series: emit EVERY bin in ``[start, stop]``
    for every key, filling bins absent from ``binned`` — the reference's
    graphing layer detects gaps client-side from the estimated frequency
    (T9); serving an already-regular grid moves that loop into the plan.

    The scaffold is generated DISTRIBUTED: ``sequence()`` builds each
    key's bin array as one expression and explodes — no driver-side
    range loop, no cartesian against a driver-built calendar table.  The
    scaffold left-joins the observed bins; ``filled`` marks synthesized
    rows.  Fill methods for each value column:

    - ``"none"``: leave NULL (gap detection itself),
    - ``"locf"``: last observation carried forward (step series:
      counters, states) — one ``last(ignorenulls)`` window,
    - ``"linear"``: linear interpolation between the surrounding
      observations (continuous series: latency); leading/trailing edges
      with only one neighbor fall back to that neighbor (pandas
      ``interpolate(limit_direction="both")`` semantics).

    Scale: one explode (map-side, rows = keys x bins) + the one per-key
    window shuffle; output size is the contract (keys x bins), not a
    blowup.
    """
    if method not in ("none", "locf", "linear"):
        raise ValueError(f"unknown fill method: {method}")
    value_cols = value_cols or [
        c for c in binned.columns if c not in (key, bin_col)
    ]
    b0 = (int(start) // binsize) * binsize
    b1 = (int(stop) // binsize) * binsize
    scaffold = (
        binned.select(key)
        .distinct()
        .select(
            key,
            F.explode(
                F.sequence(F.lit(b0), F.lit(b1), F.lit(int(binsize)))
            ).alias(bin_col),
        )
    )
    obs = binned.withColumn("_obs", F.lit(1))
    out = scaffold.join(obs, [key, bin_col], "left").withColumn(
        "filled", F.col("_obs").isNull()
    ).drop("_obs")

    if method == "none":
        return out

    wb = Window.partitionBy(key).orderBy(bin_col)
    back = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if method == "locf":
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(back))
        return out

    fwd = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    prev_bin = F.last(
        F.when(~F.col("filled"), F.col(bin_col)), ignorenulls=True
    ).over(back)
    next_bin = F.first(
        F.when(~F.col("filled"), F.col(bin_col)), ignorenulls=True
    ).over(fwd)
    out = out.withColumn("_pb", prev_bin).withColumn("_nb", next_bin)
    for c in value_cols:
        pv = F.last(F.col(c), ignorenulls=True).over(back)
        nv = F.first(F.col(c), ignorenulls=True).over(fwd)
        frac = (F.col(bin_col) - F.col("_pb")) / (F.col("_nb") - F.col("_pb"))
        interp = (
            F.when(~F.col("filled"), F.col(c))
            .when(F.col("_pb").isNull(), nv)  # leading edge
            .when(F.col("_nb").isNull(), pv)  # trailing edge
            .otherwise(pv + (nv - pv) * frac)
        )
        out = out.withColumn(c, interp)
    return out.drop("_pb", "_nb")


def counter_rate(
    fact: DataFrame,
    key: str = "stream_id",
    ts_col: str = "timestamp",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    max_rate: float | None = None,
) -> DataFrame:
    """Per-key rate of change of a monotonic counter, RRD COUNTER
    semantics (the DS type of the RRD files the reference scrapes,
    reference: rrd.py's smokeping sources): ``rate = (v - prev_v) /
    (ts - prev_ts)``; a NEGATIVE delta means the counter reset, and the
    post-reset value is taken as the delta (restart-from-zero
    assumption, flagged ``reset``).  ``max_rate`` mirrors RRD's sanity
    bound: rates above it become NULL (a wrap misread as a reset).

    Each key's first row has no predecessor and is dropped — emitting
    it as NULL would double the output for single-row keys with no
    information.  One lag window, one shuffle.

    ``order_cols`` breaks timestamp ties deterministically (default:
    ``ts_col`` alone — supply a unique id when duplicate timestamps per
    key are possible).  Zero-dt pairs (same second) yield NULL rate.
    """
    order = [ts_col] + (order_cols or [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    out = (
        fact.withColumn("_pv", prev_v)
        .withColumn("_pt", prev_t)
        .where(F.col("_pv").isNotNull())
    )
    delta = F.col(value_col) - F.col("_pv")
    reset = delta < 0
    eff = F.when(reset, F.col(value_col)).otherwise(delta)
    dt = F.col(ts_col) - F.col("_pt")
    rate = F.when(dt > 0, eff / dt).otherwise(F.lit(None))
    if max_rate is not None:
        rate = F.when(rate > float(max_rate), F.lit(None)).otherwise(rate)
    return (
        out.withColumn("rate", rate)
        .withColumn("reset", reset)
        .drop("_pv", "_pt")
    )


def rolling_zscore(
    fact: DataFrame,
    key: str = "stream_id",
    ts_col: str = "timestamp",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    n: int = 20,
    min_points: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: each point scored against the
    mean/stddev of its ``n`` PRECEDING points on the same key (the
    point itself excluded, so a spike can't mask itself) — the
    latency-event detection the reference's ecosystem runs downstream
    over exported series, as one window plan.

    ``z`` is NULL until ``min_points`` history exists or when the
    trailing window is constant (stddev 0); ``is_anomaly`` is
    ``|z| > threshold``.  One window shuffle; the rolling frame is
    rows-based with ``order_cols`` tie-breaking, so results are
    deterministic under duplicate timestamps.
    """
    order = [ts_col] + (order_cols or [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-int(n), -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    cnt = F.count(value_col).over(w)
    z = F.when(
        (cnt >= int(min_points)) & (sd > 0),
        (F.col(value_col) - mean) / sd,
    )
    return (
        fact.withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.when(F.col("z").isNotNull(), F.abs("z") > float(threshold)),
        )
    )
