"""Unit tests for operators/timeseries.py (as-of join, gapfill,
counter rates, rolling z-scores) on hand-built series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nntsc_spark.operators.timeseries import (
    asof_join,
    counter_rate,
    gapfill,
    rolling_zscore,
)


def test_asof_join_backward_inclusive_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 3), (1, 5), (1, 10), (2, 1), (3, 7)],
        "stream_id long, timestamp long",
    )
    right = spark.createDataFrame(
        [(1, 4, 100.0), (1, 9, 200.0), (2, 1, 5.0)],
        "stream_id long, timestamp long, v double",
    )
    out = {
        (r.stream_id, r.timestamp): (r.v, r.timestamp_r)
        for r in asof_join(left, right).collect()
    }
    assert out == {
        (1, 3): (None, None),   # nothing at-or-before -> left-join NULLs
        (1, 5): (100.0, 4),
        (1, 10): (200.0, 9),
        (2, 1): (5.0, 1),       # equal timestamp matches (inclusive)
        (3, 7): (None, None),   # key absent from right entirely
    }
    # tolerance: a match older than tolerance seconds is nulled out
    tol = {
        (r.stream_id, r.timestamp): r.v
        for r in asof_join(left, right, tolerance=1).collect()
    }
    assert tol[(1, 5)] == 100.0     # ts-rts = 1 <= 1
    assert tol[(1, 10)] == 200.0    # ts-rts = 1
    assert tol[(2, 1)] == 5.0       # ts-rts = 0
    out2 = asof_join(left, right, tolerance=0)
    assert {r.v for r in out2.where("timestamp = 5").collect()} == {None}


def test_asof_join_payload_name_collision_gets_suffix(spark):
    left = spark.createDataFrame([(1, 5, 9.0)], "stream_id long, timestamp long, v double")
    right = spark.createDataFrame([(1, 4, 1.0)], "stream_id long, timestamp long, v double")
    row = asof_join(left, right).collect()[0]
    assert row.v == 9.0 and row.v_r == 1.0


def test_gapfill_locf_linear_and_none(spark):
    binned = spark.createDataFrame(
        [(1, 0, 10.0), (1, 30, 40.0), (2, 20, 7.0)],
        "stream_id long, binstart long, avg_value double",
    )
    base = lambda m: {
        (r.stream_id, r.binstart): (r.avg_value, r.filled)
        for r in gapfill(binned, 10, 0, 40, method=m).collect()
    }
    none = base("none")
    assert len(none) == 10  # 2 keys x 5 bins: the grid is the contract
    assert none[(1, 10)] == (None, True)
    assert none[(1, 30)] == (40.0, False)

    locf = base("locf")
    assert locf[(1, 10)] == (10.0, True)
    assert locf[(1, 20)] == (10.0, True)
    assert locf[(1, 40)] == (40.0, True)
    assert locf[(2, 0)] == (None, True)   # nothing to carry yet
    assert locf[(2, 40)] == (7.0, True)

    lin = base("linear")
    assert lin[(1, 10)] == (20.0, True)   # interpolated 10 -> 40
    assert lin[(1, 20)] == (30.0, True)
    assert lin[(1, 40)] == (40.0, True)   # trailing edge -> nearest
    assert lin[(2, 0)] == (7.0, True)     # leading edge -> nearest
    assert lin[(2, 20)] == (7.0, False)

    with pytest.raises(ValueError, match="fill method"):
        gapfill(binned, 10, 0, 40, method="cubic")


def test_counter_rate_resets_and_max_rate(spark):
    fact = spark.createDataFrame(
        [(1, 0, 0.0), (1, 10, 10.0), (1, 20, 40.0), (1, 30, 5.0), (2, 5, 3.0)],
        "stream_id long, timestamp long, value double",
    )
    out = {
        r.timestamp: (r.rate, r.reset)
        for r in counter_rate(fact).where("stream_id = 1").collect()
    }
    # first row per key is dropped (no predecessor); key 2 vanishes
    assert set(out) == {10, 20, 30}
    assert out[10] == (1.0, False)
    assert out[20] == (3.0, False)
    assert out[30] == (0.5, True)   # 40 -> 5: reset, delta = post-reset value
    assert counter_rate(fact).where("stream_id = 2").count() == 0

    capped = {
        r.timestamp: r.rate
        for r in counter_rate(fact, max_rate=2.0).where("stream_id = 1").collect()
    }
    assert capped[20] is None       # 3.0 exceeds the sanity bound
    assert capped[10] == 1.0


def test_counter_rate_zero_dt_null_rate(spark):
    fact = spark.createDataFrame(
        [(1, 0, 1, 0.0), (1, 0, 2, 5.0)],
        "stream_id long, timestamp long, event_id long, value double",
    )
    rows = counter_rate(fact, order_cols=["event_id"]).collect()
    assert len(rows) == 1 and rows[0].rate is None


def test_rolling_zscore_flags_spike_not_warmup(spark):
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 100.0, 10.0]
    fact = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)],
        "stream_id long, timestamp long, value double",
    )
    out = {r.timestamp: (r.z, r.is_anomaly)
           for r in rolling_zscore(fact, n=20, min_points=5).collect()}
    for t in range(5):  # warmup: fewer than min_points predecessors
        assert out[t] == (None, None)
    assert out[7][1] is True        # the spike
    assert abs(out[7][0]) > 3
    assert out[6][1] is False
    # the point AFTER the spike is judged against a window containing it,
    # but the spike inflates the stddev so a normal value stays normal
    assert out[8][1] is False


def test_rolling_zscore_constant_window_is_null(spark):
    fact = spark.createDataFrame(
        [(1, i, 5.0) for i in range(8)] + [(1, 8, 9.0)],
        "stream_id long, timestamp long, value double",
    )
    out = {r.timestamp: r.z for r in rolling_zscore(fact, min_points=3).collect()}
    assert all(v is None for v in out.values())  # sd = 0 everywhere


# ---------------------------------------------------------------------------
# Mergeable histogram percentiles (operators/rollup.py)
# ---------------------------------------------------------------------------


def test_histogram_rollup_merge_matches_direct_build(spark):
    """Merging per-bin histograms element-wise must equal building one
    histogram over the raw rows directly — the exact-merge property that
    makes percentile rollups composable hourly -> daily -> monthly."""
    import random

    from pyspark.sql import functions as F

    from nntsc_spark.operators.rollup import (
        bucket_expr,
        histogram_rollup,
        merged_histogram_agg,
    )

    rng = random.Random(7)
    rows = [(i % 3, i * 60, round(rng.uniform(0, 100), 2))
            for i in range(600)]
    fact = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    per_bin = histogram_rollup(fact, 3600, "value", 0.0, 100.0, nbins=50)
    merged = {
        r.stream_id: r.hist
        for r in per_bin.groupBy("stream_id")
        .agg(merged_histogram_agg("hist", 50).alias("hist"))
        .collect()
    }
    direct = {
        r.stream_id: r.hist
        for r in fact.groupBy(
            "stream_id", bucket_expr("value", 0.0, 100.0, 50).alias("_b")
        )
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("stream_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("_b", "_c"))).alias("_m"))
        .select(
            "stream_id",
            F.expr(
                "transform(sequence(0, 49), i -> coalesce(element_at(_m, i), 0L))"
            ).alias("hist"),
        )
        .collect()
    }
    assert merged == direct
    # counts conserved
    assert sum(sum(h) for h in merged.values()) == 600


def test_merge_histograms_matches_agg_expression(spark):
    """merge_histograms (the relational codegen merge, r16) returns the
    exact vectors of the merged_histogram_agg fold on rollup output, for
    every group and at a second grouping arity."""
    import random

    from nntsc_spark.operators.rollup import (
        histogram_rollup,
        merge_histograms,
        merged_histogram_agg,
    )

    rng = random.Random(23)
    rows = [
        (i % 5, i * 37, round(rng.uniform(-10, 110), 2))  # incl. clamping
        for i in range(900)
    ]
    fact = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    nbins = 40
    hr = histogram_rollup(fact, 900, "value", 0.0, 100.0, nbins=nbins)
    fold = {
        r.stream_id: r.hist
        for r in hr.groupBy("stream_id")
        .agg(merged_histogram_agg("hist", nbins).alias("hist"))
        .collect()
    }
    rel = {
        r.stream_id: r.hist
        for r in merge_histograms(hr, ["stream_id"], "hist", nbins).collect()
    }
    assert rel == fold
    # two-column grouping (bins coarsened 900 -> 1800) agrees as well
    from pyspark.sql import functions as F

    hr2 = hr.withColumn("_day", (F.col("binstart") / 1800).cast("long"))
    fold2 = {
        (r.stream_id, r._day): r.hist
        for r in hr2.groupBy("stream_id", "_day")
        .agg(merged_histogram_agg("hist", nbins).alias("hist"))
        .collect()
    }
    rel2 = {
        (r.stream_id, r._day): r.hist
        for r in merge_histograms(
            hr2, ["stream_id", "_day"], "hist", nbins
        ).collect()
    }
    assert rel2 == fold2


def test_histogram_percentile_within_one_bucket_of_exact(spark):
    """The percentile estimate read off a histogram must sit within one
    bucket width of the exact order statistic, at every probed p."""
    import random

    from pyspark.sql import functions as F

    from nntsc_spark.operators.rollup import (
        histogram_rollup,
        histogram_percentile,
        merged_histogram_agg,
    )

    rng = random.Random(11)
    vals = [round(rng.gauss(50, 18) % 100, 3) for i in range(5000)]
    fact = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)],
        "stream_id long, timestamp long, value double",
    )
    nbins, lo, hi = 200, 0.0, 100.0
    width = (hi - lo) / nbins
    merged = (
        histogram_rollup(fact, 600, "value", lo, hi, nbins=nbins)
        .groupBy("stream_id")
        .agg(merged_histogram_agg("hist", nbins).alias("hist"))
    )
    row = merged.select(
        *[
            histogram_percentile("hist", lo, hi, p).alias(f"p{int(p*100)}")
            for p in (0.05, 0.5, 0.95, 0.99, 1.0)
        ]
    ).collect()[0]
    svals = sorted(vals)
    import math

    for p in (0.05, 0.5, 0.95, 0.99, 1.0):
        exact = svals[max(0, math.ceil(p * len(svals)) - 1)]
        got = row[f"p{int(p*100)}"]
        assert abs(got - exact) <= width + 1e-9, (p, got, exact)


def test_histogram_edge_clamping_and_empty(spark):
    from pyspark.sql import functions as F

    from nntsc_spark.operators.rollup import (
        histogram_rollup,
        histogram_percentile,
    )

    fact = spark.createDataFrame(
        [(1, 0, -5.0), (1, 1, 250.0)],  # both outside [0, 100)
        "stream_id long, timestamp long, value double",
    )
    r = histogram_rollup(fact, 3600, "value", 0.0, 100.0, nbins=10).collect()[0]
    assert r.hist[0] == 1 and r.hist[9] == 1 and r.n == 2
    # empty histogram -> NULL percentile
    empty = spark.createDataFrame(
        [([0] * 10,)], "hist array<bigint>"
    ).select(histogram_percentile("hist", 0.0, 100.0, 0.5).alias("p"))
    assert empty.collect()[0].p is None


# ---------------------------------------------------------------------------
# EWMA (operators/timeseries.py)
# ---------------------------------------------------------------------------


def test_ewma_matches_pandas_and_bounds_truncation(spark):
    """Full-history ewma(lookback=None) equals pandas ewm(adjust=True)
    exactly; the bounded default differs from it by less than the
    beta^lookback renormalization bound; NULL observations are dropped."""
    import pandas as pd

    from nntsc_spark.operators.timeseries import ewma

    vals = [float((7 * i) % 23 + (i % 5)) for i in range(60)]
    rows = [(1, 100 + i, v) for i, v in enumerate(vals)]
    rows.append((1, 95, None))   # NULL observation -> dropped entirely
    rows += [(2, 100 + i, 50.0) for i in range(3)]  # constant series
    fact = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )

    full = {
        (r.stream_id, r.timestamp): r.ewma
        for r in ewma(fact, alpha=0.25, lookback=None).collect()
    }
    want = pd.Series(vals).ewm(alpha=0.25, adjust=True).mean()
    for i, w in enumerate(want):
        assert abs(full[(1, 100 + i)] - round(w, 4)) < 1e-9, i
    # constant series smooths to itself
    assert all(full[(2, 100 + i)] == 50.0 for i in range(3))
    # the NULL row is absent from the output
    assert (1, 95) not in full

    bounded = {
        (r.stream_id, r.timestamp): r.ewma
        for r in ewma(fact, alpha=0.25, lookback=32).collect()
    }
    # beta^32 of the weight mass is the truncation ceiling
    bound = 0.75 ** 32 * max(vals) + 2e-4  # + rounding slack at 4dp
    assert all(
        abs(bounded[k] - full[k]) <= bound for k in full if k[0] == 1
    )


def test_holt_winters_flags_spike_on_seasonal_series(spark):
    """On a noiseless level+seasonal series the deterministic two-season
    warmup is exact (zero residuals), a planted spike is the flagged
    anomaly, and warmup rows emit NULL forecasts."""
    from nntsc_spark.operators.timeseries import holt_winters

    m, n = 8, 64
    seas = [3.0, -1.0, 4.0, 0.0, -3.0, 2.0, -4.0, -1.0]  # sums to 0
    def x(t):
        return 100.0 + seas[t % m]
    spike_at = 40
    rows = [
        (1, 1000 + t, x(t) + (50.0 if t == spike_at else 0.0))
        for t in range(n)
    ]
    # second stream too short for warmup -> all-NULL forecasts
    rows += [(2, 1000 + t, 5.0) for t in range(m)]
    fact = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    out = {
        (r.stream_id, r.timestamp): r
        for r in holt_winters(fact, season_length=m).collect()
    }
    s1 = [out[(1, 1000 + t)] for t in range(n)]
    # warmup: first two seasons have no forecast
    assert all(r.forecast is None for r in s1[: 2 * m])
    # clean rows after warmup forecast exactly (zero residual)
    clean = [r for t, r in enumerate(s1) if 2 * m <= t and t != spike_at]
    pre_spike = [r for t, r in enumerate(s1) if 2 * m <= t < spike_at]
    assert all(r.residual == 0.0 and r.forecast == r.value for r in pre_spike)
    # exactly the spike is flagged
    flagged = [t for t in range(n) if s1[t].is_anomaly]
    assert spike_at in flagged and len(flagged) <= 3
    assert s1[spike_at].residual == 50.0
    # short stream: never enough history
    assert all(out[(2, 1000 + t)].forecast is None for t in range(m))


# ---------------------------------------------------------------------------
# r8 advice regressions
# ---------------------------------------------------------------------------


def test_asof_join_null_payload_comes_from_matched_row(spark):
    """r8 advice: the carried payload must come from the MATCHED right
    row, even when that row's payload value is NULL — per-column carries
    would stitch an older row's value under the newer row's timestamp."""
    left = spark.createDataFrame(
        [(1, 10)], "stream_id long, timestamp long"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0, "a"), (1, 9, None, "b")],
        "stream_id long, timestamp long, v double, tag string",
    )
    row = asof_join(left, right).collect()[0]
    assert row.timestamp_r == 9
    assert row.v is None          # the ts=9 row's v, not ts=5's 100.0
    assert row.tag == "b"         # all columns from the same right row


def test_gapfill_linear_null_value_is_a_gap_not_an_anchor(spark):
    """r8 advice: an observed bin carrying a NULL value must not serve
    as an interpolation x-coordinate; each column interpolates between
    its own non-null neighbors, and the NULL bin itself gets filled."""
    binned = spark.createDataFrame(
        [(1, 0, 5.0), (1, 20, None), (1, 30, 40.0)],
        "stream_id long, binstart long, avg_value double",
    )
    out = {
        r.binstart: r.avg_value
        for r in gapfill(binned, 10, 0, 30, method="linear").collect()
    }
    # anchors are (0, 5.0) and (30, 40.0); bin 20's NULL is skipped over
    assert out[10] == pytest.approx(5.0 + 35.0 * 10 / 30)
    assert out[20] == pytest.approx(5.0 + 35.0 * 20 / 30)
    assert out[0] == 5.0 and out[30] == 40.0


def test_bucket_expr_extreme_values_saturate_not_overflow(spark):
    """r8 advice: values whose scaled offset exceeds int range (1e15,
    +/-Infinity) must land in the edge buckets — clamping only after the
    int cast ANSI-fails or wraps into the wrong bucket.  NaN -> NULL."""
    from nntsc_spark.operators.rollup import bucket_expr, histogram_rollup

    fact = spark.createDataFrame(
        [(1, 0, 1e15), (1, 1, -1e15), (1, 2, float("inf")),
         (1, 3, float("-inf")), (1, 4, float("nan")), (1, 5, 250.0)],
        "stream_id long, timestamp long, value double",
    )
    got = [
        r.b
        for r in fact.orderBy("timestamp")
        .select(bucket_expr("value", 0.0, 500.0, 250).alias("b"))
        .collect()
    ]
    assert got == [249, 0, 249, 0, None, 125]
    # and the rollup build drops the NaN row instead of erroring
    r = histogram_rollup(fact, 3600, "value", 0.0, 500.0, nbins=250).collect()[0]
    assert r.n == 5 and r.hist[249] == 2 and r.hist[0] == 2 and r.hist[125] == 1


def test_histogram_percentiles_staged_equals_expression_form(spark):
    """The staged multi-percentile read must produce bit-identical
    estimates to the self-contained expression form (same float chain,
    just evaluated once per fold instead of O(nbins^2) inlined)."""
    import random

    from nntsc_spark.operators.rollup import (
        histogram_percentile,
        histogram_percentiles,
        histogram_rollup,
    )

    rng = random.Random(7)
    fact = spark.createDataFrame(
        [(i % 5, i, rng.uniform(-20.0, 520.0)) for i in range(2000)],
        "stream_id long, timestamp long, value double",
    )
    hr = histogram_rollup(fact, 10**9, "value", 0.0, 500.0, nbins=50)
    expr_form = {
        r.stream_id: (r.p50, r.p95, r.n)
        for r in hr.select(
            "stream_id",
            histogram_percentile("hist", 0.0, 500.0, 0.5).alias("p50"),
            histogram_percentile("hist", 0.0, 500.0, 0.95).alias("p95"),
            "n",
        ).collect()
    }
    staged = {
        r.stream_id: (r.p50, r.p95, r.n)
        for r in histogram_percentiles(
            hr, "hist", 0.0, 500.0, {"p50": 0.5, "p95": 0.95}, total_col="n2"
        ).select("stream_id", "p50", "p95", F.col("n2").alias("n")).collect()
    }
    assert expr_form == staged and len(staged) == 5


def test_cusum_closed_form_matches_page_recursion(spark):
    import math

    from nntsc_spark.operators.timeseries import cusum

    vals = [10.0, 10.5, 9.8, 10.2, 14.0, 14.5, 15.0, 14.2, 9.9, 10.1]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    out = {
        r["timestamp"]: r
        for r in cusum(df, k=0.5, h=2.0).collect()
    }
    # reference: Page's explicit recursion
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (len(vals) - 1))
    sp = sn = 0.0
    for i, v in enumerate(vals):
        z = (v - mu) / sd
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        assert abs(out[i]["cusum_pos"] - sp) < 1e-9, i
        assert abs(out[i]["cusum_neg"] - sn) < 1e-9, i
        assert out[i]["is_change"] == (sp > 2.0 or sn > 2.0)
    # the planted level shift must actually alarm
    assert any(r["is_change"] for r in out.values())


def test_cusum_constant_series_yields_nulls(spark):
    from nntsc_spark.operators.timeseries import cusum

    df = spark.createDataFrame(
        [(1, i, 5.0) for i in range(4)],
        "stream_id long, timestamp long, value double",
    )
    for r in cusum(df).collect():
        assert r["cusum_pos"] is None
        assert r["is_change"] is None


def test_seasonal_decompose_recovers_planted_components(spark):
    from nntsc_spark.operators.timeseries import seasonal_decompose

    s = [4.0, -3.0, 2.0, -1.0, -2.0]  # sums to 0 over the period
    rows = [(1, i, 100.0 + s[i % 5]) for i in range(20)]
    df = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    out = {
        r["timestamp"]: r
        for r in seasonal_decompose(df, period=5).collect()
    }
    assert len(out) == 20
    for i in range(20):
        r = out[i]
        if i < 2 or i >= 18:  # centered window never fills at the edges
            assert r["trend"] is None and r["remainder"] is None
        else:
            # an odd-period centered MA of a pure periodic + constant
            # recovers the constant exactly
            assert r["trend"] == 100.0
            assert r["remainder"] == 0.0
        assert abs(r["seasonal"] - s[i % 5]) < 1e-9


def test_lttb_keeps_endpoints_spike_and_bucket_count(spark):
    from nntsc_spark.operators.timeseries import lttb_downsample

    # stream 1: 48 flat points with one spike a bucket-average would
    # smooth away; stream 2: fewer points than the budget
    rows = [(1, t, 100.0 if t == 20 else 10.0 + (t % 3) * 0.1)
            for t in range(48)]
    rows += [(2, t, float(t)) for t in range(4)]
    df = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    out = lttb_downsample(df, n_out=6).collect()
    s1 = sorted([r for r in out if r.stream_id == 1],
                key=lambda r: r.timestamp)
    s2 = sorted([r for r in out if r.stream_id == 2],
                key=lambda r: r.timestamp)
    # budget respected, one point per bucket, endpoints kept
    assert len(s1) == 6
    assert [r.bucket for r in s1] == [0, 1, 2, 3, 4, 5]
    assert s1[0].timestamp == 0 and s1[-1].timestamp == 47
    # the spike is the max-area point of its bucket
    assert any(r.timestamp == 20 and r.value == 100.0 for r in s1)
    # a series shorter than the budget passes through untouched
    assert [r.timestamp for r in s2] == [0, 1, 2, 3]
    assert [r.bucket for r in s2] == [0, 1, 2, 3]


def test_lttb_rejects_tiny_budget(spark):
    from nntsc_spark.operators.timeseries import lttb_downsample

    df = spark.createDataFrame(
        [(1, 0, 1.0)], "stream_id long, timestamp long, value double"
    )
    with pytest.raises(ValueError):
        lttb_downsample(df, n_out=2)


def test_twa_holds_value_splits_bins_and_caps_carry(spark):
    from nntsc_spark.operators.timeseries import time_weighted_avg

    # stream 1, binsize 10: [0,5)@10, [5,12)@20, [12,20)@30 (last holds
    # to its own bin end).  bin0 = (10*5 + 20*5)/10; bin1 = (20*2 + 30*8)/10
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 5, 20.0), (1, 12, 30.0)],
        "stream_id long, timestamp long, value double",
    )
    out = {
        r.binstart: (r.twa, r.covered_seconds)
        for r in time_weighted_avg(df, binsize=10).collect()
    }
    assert out == {0: (15.0, 10), 10: (28.0, 10)}

    # a sample preceding a long gap: uncapped it smears across the gap;
    # max_carry truncates the hold (and the bin fan-out) at the cap
    gap = spark.createDataFrame(
        [(1, 0, 10.0), (1, 95, 20.0)],
        "stream_id long, timestamp long, value double",
    )
    uncapped = {
        r.binstart: r.covered_seconds
        for r in time_weighted_avg(gap, binsize=10).collect()
    }
    assert len(uncapped) == 10 and uncapped[40] == 10
    capped = {
        r.binstart: (r.twa, r.covered_seconds)
        for r in time_weighted_avg(gap, binsize=10, max_carry=15).collect()
    }
    assert set(capped) == {0, 10, 90}
    assert capped[0] == (10.0, 10) and capped[10] == (10.0, 5)

    # duplicate timestamps: only the last (by order_cols) holds
    dup = spark.createDataFrame(
        [(1, 0, 1, 10.0), (1, 0, 2, 50.0), (1, 5, 3, 50.0)],
        "stream_id long, timestamp long, event_id long, value double",
    )
    got = {
        r.binstart: r.twa
        for r in time_weighted_avg(
            dup, binsize=10, order_cols=["event_id"]
        ).collect()
    }
    assert got == {0: 50.0}


def test_hampel_flags_spike_and_repairs_with_median(spark):
    from nntsc_spark.operators.timeseries import hampel_filter

    # flat series with one huge spike: mean/stddev would be dragged by
    # the spike itself; median/MAD must flag exactly the spike and
    # repair it to the local median
    rows = [(1, t, float(10 + (t % 3))) for t in range(21)]
    rows[10] = (1, 10, 1000.0)
    df = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    out = {
        r.timestamp: r
        for r in hampel_filter(df, half_window=5, min_points=5).collect()
    }
    assert out[10].is_outlier and out[10].repaired == out[10].med
    assert out[10].med == 11.0
    for t in (3, 7, 14, 20):
        assert not out[t].is_outlier and out[t].repaired == out[t].value

    # constant neighborhood: MAD 0 -> any deviation from the median flags
    const = spark.createDataFrame(
        [(1, t, 5.0) for t in range(10)] + [(1, 10, 5.5)],
        "stream_id long, timestamp long, value double",
    )
    got = {
        r.timestamp: r.is_outlier
        for r in hampel_filter(const, half_window=5).collect()
    }
    assert got[10] is True and got[0] is False

    # below min_points: flag NULL, value passes through unrepaired
    tiny = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 99.0)],
        "stream_id long, timestamp long, value double",
    )
    for r in hampel_filter(tiny, half_window=5, min_points=5).collect():
        assert r.is_outlier is None and r.repaired == r.value

    # NULL values: skipped by the neighborhood, never flagged, and an
    # all-NULL key neither errors (ANSI element_at) nor emits medians
    nulls = spark.createDataFrame(
        [(1, t, None) for t in range(5)],
        "stream_id long, timestamp long, value double",
    )
    for r in hampel_filter(nulls, half_window=5).collect():
        assert r.med is None and r.is_outlier is None


def test_hampel_matches_plain_python_reference(spark):
    """Pin the operator against an independent plain-Python Hampel on
    random-ish deterministic data (multiple streams, ties, edges)."""
    import hashlib

    from nntsc_spark.operators.timeseries import hampel_filter

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    rows = [
        (s, t, float(h(s * 1000 + t) % 100))
        for s in (1, 2, 3)
        for t in range(40)
    ]
    k, ns, mp = 4, 2.0, 5

    def ref(vals):
        out = []
        for i, x in enumerate(vals):
            nb = sorted(vals[max(0, i - k): i + k + 1])
            n = len(nb)
            med = (nb[(n + 1) // 2 - 1] + nb[n // 2]) / 2
            dev = sorted(abs(v - med) for v in nb)
            mad = (dev[(n + 1) // 2 - 1] + dev[n // 2]) / 2
            scale = ns * 1.4826 * mad
            flag = abs(x - med) > scale if n >= mp else None
            out.append((med, flag, med if flag else x))
        return out

    df = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    got = {
        (r.stream_id, r.timestamp): (r.med, r.is_outlier, r.repaired)
        for r in hampel_filter(
            df, half_window=k, n_sigmas=ns, min_points=mp
        ).collect()
    }
    for s in (1, 2, 3):
        vals = [v for (ss, _, v) in rows if ss == s]
        for t, (med, flag, rep) in enumerate(ref(vals)):
            assert got[(s, t)] == (med, flag, rep), (s, t)


def test_seasonal_decompose_even_period_uses_2xm_weighted_ma(spark):
    """Even periods use the classical 2xm centered MA (half-weight
    endpoints — statsmodels' even-period trend), not a (m+1)-point
    simple MA.  On constant + zero-sum periodic the 2xm MA recovers the
    constant exactly; the (m+1)-point simple MA would not (it
    double-counts one phase): advice r9, timeseries.py."""
    from nntsc_spark.operators.timeseries import seasonal_decompose

    s = [4.0, -3.0, 2.0, -3.0]  # sums to 0 over period 4
    rows = [(1, i, 100.0 + s[i % 4]) for i in range(16)]
    df = spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )
    out = {
        r["timestamp"]: r
        for r in seasonal_decompose(df, period=4).collect()
    }
    assert len(out) == 16
    # the naive 5-point simple MA would give 100 + (s[(i-2)%4])/5 != 100
    for i in range(16):
        r = out[i]
        if i < 2 or i >= 14:
            assert r["trend"] is None and r["remainder"] is None
        else:
            assert r["trend"] == 100.0
            assert abs(r["remainder"]) < 1e-9
        assert abs(r["seasonal"] - s[i % 4]) < 1e-9
