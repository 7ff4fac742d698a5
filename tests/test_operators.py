"""Query-layer operator tests against a tiny in-memory fact table.

These encode the reference's non-obvious query semantics (SURVEY.md §2):
bin arithmetic, single-bin fallback, label CASE first-match-wins, mode
tie-breaks, smoke ntile fan, matrix algebraic merge, frequency rule chain.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from nntsc_spark.functions.aggregations import mode_agg, smoke_agg, smoke_rows
from nntsc_spark.operators.activity import active_streams, build_stream_stats
from nntsc_spark.operators.aggregate import select_aggregated_data
from nntsc_spark.operators.frequency import estimate_frequency
from nntsc_spark.operators.labels import apply_labels, build_label_map
from nntsc_spark.operators.rollup import build_rollup, merge_rollup
from nntsc_spark.operators.select import select_data


@pytest.fixture(scope="module")
def fact(spark):
    rows = []
    # stream 1: every 10s from t=100, values 1..10
    for i in range(10):
        rows.append((1, 100 + 10 * i, float(i + 1)))
    # stream 2: every 30s from t=100, values 100..
    for i in range(5):
        rows.append((2, 100 + 30 * i, float(100 + i)))
    # stream 3: outside the queried range
    rows.append((3, 10_000, 7.0))
    return spark.createDataFrame(
        rows, "stream_id long, timestamp long, value double"
    )


@pytest.fixture(scope="module")
def label_map(spark):
    return build_label_map(spark, {"L1": [1], "L2": [2, 3]})


def test_label_first_match_wins(spark):
    lm = build_label_map(spark, {"a": [1, 2], "b": [2, 3]})
    got = {r.stream_id: r.nntsclabel for r in lm.collect()}
    assert got == {1: "a", 2: "a", 3: "b"}


def test_select_data_forced_columns_and_bounds(fact, label_map):
    out = select_data(fact, label_map, ["value"], 100, 160, order=False)
    assert set(out.columns) == {"value", "timestamp", "stream_id", "nntsclabel"}
    rows = out.collect()
    # inclusive bounds: stream1 ts 100..160 (7 rows) + stream2 ts 100,130,160
    assert len(rows) == 10
    assert all(100 <= r.timestamp <= 160 for r in rows)


def test_agg_bin_arithmetic(fact, label_map):
    out = select_aggregated_data(
        fact, label_map, [("value", "avg"), ("value", "count")],
        start=100, stop=190, binsize=60, order=False,
    ).collect()
    by_key = {(r.nntsclabel, r.binstart): r for r in out}
    # stream1 bin 60: ts 100,110 -> binstart 60... wait ts-ts%60: 100->60? 100%60=40 -> 60
    assert (("L1", 60) in by_key) and (("L1", 120) in by_key) and (("L1", 180) in by_key)
    r = by_key[("L1", 60)]
    assert r.value_count == 2 and r.value_avg == pytest.approx(1.5)
    assert r.timestamp == 110  # max ts in bin (A4)


def test_agg_single_bin(fact, label_map):
    out = select_aggregated_data(
        fact, label_map, [("value", "sum")], start=100, stop=200, binsize=0,
        order=False,
    ).collect()
    r = {x.nntsclabel: x for x in out}
    # binstart = min(timestamp) per label (dbselect.py:303-307 semantics);
    # single (col, func) pair keeps the bare column name (rename rule only
    # applies to duplicated columns, dbselect.py:810-821)
    assert r["L1"].binstart == 100 and r["L1"].timestamp == 190
    assert r["L1"].value == pytest.approx(sum(range(1, 11)))
    # stream 2's last row (ts=220, value=104) is outside stop=200
    assert r["L2"].value == pytest.approx(sum(range(100, 104)))


def test_smoke_routes_exact_for_narrow_range(fact, label_map):
    # narrow window (< SMOKE_FAN_RANGE): exact ntile smoke, Postgres parity
    out = select_aggregated_data(
        fact, label_map, [("value", "smoke"), ("value", "count")],
        start=100, stop=200, binsize=0, order=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ntile" in plan.lower()
    r = {x.nntsclabel: x for x in out.collect()}
    # 10 values, 20 tiles -> 10 one-element tiles: fan == sorted values
    assert r["L1"].value_smoke == pytest.approx(list(map(float, range(1, 11))))
    assert r["L1"].value_count == 10


def test_smoke_routes_fan_for_wide_range(fact, label_map):
    # wide window (> SMOKE_FAN_RANGE): percentile fan, NO window operator —
    # nothing funnels a whole label through one reducer
    out = select_aggregated_data(
        fact, label_map, [("value", "smoke")],
        start=0, stop=100 * 86400, binsize=0, order=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert not re.search(r"\bntile\(", plan)  # "percentile(" != ntile
    assert "percentile" in plan
    r = {x.nntsclabel: x for x in out.collect()}
    fan = r["L2"].value
    assert len(fan) == 20  # 19 percentiles + max
    assert fan[-1] == 104.0 and fan == sorted(fan)


def test_most_routes_through_aggregate_request(fact, label_map):
    out = select_aggregated_data(
        fact, label_map, [("value", "most")],
        start=100, stop=200, binsize=0, order=False,
    ).collect()
    r = {x.nntsclabel: x for x in out}
    # all values distinct -> mode tie broken by smallest value
    assert r["L1"].value == 1.0


def test_mode_tie_breaks_smallest(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c")], "k long, v string"
    )
    out = mode_agg(df, ["k"], "v", "mode_v").collect()
    assert out[0].mode_v == "a"  # tie between a(2) and b(2) -> smallest


def test_smoke_matches_ntile_reference(spark):
    # 40 values in one group -> 20 tiles of 2; tile mean = mean of each pair
    vals = [float(v) for v in range(1, 41)]
    df = spark.createDataFrame([(1, v) for v in vals], "k long, v double")
    arr = smoke_agg(df, ["k"], "v", "smoke").collect()[0].smoke
    assert len(arr) == 20
    assert arr[0] == pytest.approx(1.5) and arr[19] == pytest.approx(39.5)
    # n < 20 -> fewer tiles, no padding (influx.py:699-713 trimming analogue)
    df5 = spark.createDataFrame([(1, float(v)) for v in range(5)], "k long, v double")
    arr5 = smoke_agg(df5, ["k"], "v", "smoke").collect()[0].smoke
    assert len(arr5) == 5


def test_smoke_rows_null_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, None), (1, 3.0)], "k long, v double"
    )
    rows = smoke_rows(df, ["k"], "v").collect()
    assert sum(1 for _ in rows) == 2  # nulls dropped before tiling


def test_rollup_merge_algebra(spark):
    # two bins for one stream; check weighted avg + pooled stddev formula
    rows = [(1, 10, 1.0), (1, 20, 3.0), (1, 70, 5.0), (1, 80, 9.0), (1, 85, 10.0)]
    fact = spark.createDataFrame(rows, "stream_id long, timestamp long, value double")
    lm = build_label_map(spark, {"L": [1]})
    rollup = build_rollup(fact, 60, ["value"])
    merged = merge_rollup(rollup, lm, ["value"]).collect()[0]
    assert merged.count_value == 5
    assert merged.sum_value == pytest.approx(28.0)
    assert merged.max_value == 9.0 or merged.max_value == 10.0
    # weighted avg: (2*2 + 3*8) / 5
    assert merged.avg_value == pytest.approx((2.0 * 2 + 8.0 * 3) / 5)
    # pooled stddev: sqrt((sd1^2*2 + sd2^2*3)/5), sample stddevs
    sd1 = math.sqrt(2.0)  # stddev_samp([1,3])
    sd2 = math.sqrt(7.0)  # stddev_samp([5,9,10])
    assert merged.stddev_value == pytest.approx(
        math.sqrt((sd1**2 * 2 + sd2**2 * 3) / 5)
    )


def test_matrix_start_snap_two_minute_rule():
    """influx.py:389-390: hourly-path starts within 2 min past an hour
    boundary back up a FULL extra hour before snapping; minute path and
    mid-hour starts just snap."""
    from nntsc_spark.operators.matrix import snap_matrix_start

    # exactly on the boundary: 0 % 3600 == 0 < 120 -> previous hour
    assert snap_matrix_start(7200, 3600) == 3600
    # 60 s and 119 s past: inside the grace window -> previous hour
    assert snap_matrix_start(7260, 3600) == 3600
    assert snap_matrix_start(7319, 3600) == 3600
    # 120 s past: outside the window -> same hour
    assert snap_matrix_start(7320, 3600) == 7200
    assert snap_matrix_start(9000, 3600) == 7200
    # minute path never applies the rule (influx.py:393-394)
    assert snap_matrix_start(7260, 60) == 7260
    assert snap_matrix_start(7261, 60) == 7260


def test_matrix_hour_edge_includes_previous_hour_bin(spark):
    """A start 60 s past the hour must include the PREVIOUS hour's rollup
    bin — through both the inline and the stored-rollup matrix paths."""
    from nntsc_spark.operators.matrix import (
        select_matrix_data,
        select_matrix_from_stored,
    )

    # one point in the 1-2 h bin, two in the 2-3 h bin
    rows = [(1, 3600 + 30, 100.0), (1, 7200 + 500, 1.0), (1, 7200 + 900, 3.0)]
    fact = spark.createDataFrame(rows, "stream_id long, timestamp long, value double")
    lm = build_label_map(spark, {"L": [1]})
    start, stop = 7260, 7260 + 7200  # 60 s past 02:00, 2 h span -> hourly
    inline = select_matrix_data(fact, lm, ["value"], start, stop).collect()[0]
    # without the rule the 01:00 bin's 100.0 would be dropped
    assert inline.count_value == 3
    assert inline.sum_value == pytest.approx(104.0)
    stored = select_matrix_from_stored(
        build_rollup(fact, 3600, ["value"]), lm, ["value"], start, stop, 3600
    ).collect()[0]
    assert stored.count_value == 3
    assert stored.sum_value == pytest.approx(104.0)


def test_frequency_rule_chain(spark):
    rows = []
    # stream 1: strict 10s cadence -> mode majority -> 10
    for i in range(20):
        rows.append((1, 1000 + 10 * i))
    # stream 2: diffs [10]*4 + [100]*16 -> mode=100 (80%>=50%) -> 100
    ts = 1000
    for d in [10] * 4 + [100] * 16:
        rows.append((2, ts))
        ts += d
    rows.append((2, ts))
    df = spark.createDataFrame(rows, "stream_id long, timestamp long")
    freq = {r.stream_id: r.frequency for r in estimate_frequency(df).collect()}
    assert freq[1] == 10
    assert freq[2] == 100


def test_frequency_bounded_history(spark):
    """The in-code scale bounds (reference samples the first 200 diffs,
    exporter.py:509-510): max_diffs keeps only each stream's FIRST n
    diffs, since drops rows before the cutoff ahead of the window sort."""
    from nntsc_spark.operators.frequency import DEFAULT_FREQUENCY

    rows = []
    # stream 1: 5 diffs of 10s, then 20 diffs of 100s.  Unbounded the mode
    # is 100; sampling the first 5 diffs sees only the 10s.
    ts = 1000
    for d in [10] * 5 + [100] * 20:
        rows.append((1, ts))
        ts += d
    rows.append((1, ts))
    # stream 2: steady 60s throughout -> any bound still says 60
    for i in range(30):
        rows.append((2, 5000 + 60 * i))
    df = spark.createDataFrame(rows, "stream_id long, timestamp long")

    unbounded = {r.stream_id: r.frequency for r in estimate_frequency(df).collect()}
    assert unbounded[1] == 100 and unbounded[2] == 60

    first5 = {
        r.stream_id: r.frequency
        for r in estimate_frequency(df, max_diffs=5).collect()
    }
    assert first5[1] == 10 and first5[2] == 60

    # since: only the 100s tail of stream 1 survives the scan bound
    recent = {
        r.stream_id: r.frequency
        for r in estimate_frequency(df, since=1060).collect()
    }
    assert recent[1] == 100
    # stream 2 ends at 5000+60*29 = 6740 > 1060, unaffected
    assert recent[2] == 60

    # a stream entirely before `since` still appears, with the default
    late = {
        r.stream_id: r.frequency
        for r in estimate_frequency(df, since=10_000).collect()
    }
    assert late[1] == DEFAULT_FREQUENCY and late[2] == DEFAULT_FREQUENCY


def test_stream_stats_and_activity(fact):
    stats = build_stream_stats(fact)
    act = active_streams(stats, 0, 500).collect()
    assert {r.stream_id for r in act} == {1, 2}  # stream 3 starts at 10_000


def test_sessionize_gap_semantics(spark):
    from nntsc_spark.operators.sessions import session_stats, sessionize

    rows = [(1, t, 1.0) for t in [0, 100, 250, 5000, 5100, 20_000]]
    fact = spark.createDataFrame(rows, "stream_id long, timestamp long, value double")
    s = sessionize(fact, timeout=1000)
    got = {r.timestamp: r.session_id for r in s.collect()}
    assert got == {0: 1, 100: 1, 250: 1, 5000: 2, 5100: 2, 20_000: 3}
    stats = {r.session_id: r for r in session_stats(fact, 1000).collect()}
    assert stats[1].n_events == 3 and stats[1].session_end == 250
    assert stats[3].session_start == 20_000


def test_salted_agg_equals_direct(spark):
    from pyspark.sql import functions as F

    from nntsc_spark.operators.sessions import salted_agg

    # heavy skew: one key holds 10k rows, another 10
    rows = [("hot", float(i % 97)) for i in range(10_000)] + [
        ("cold", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    salted = {r.k: r for r in salted_agg(df, ["k"], "v", salts=8).collect()}
    direct = {
        r.k: r
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    for k in direct:
        assert salted[k].v_count == direct[k].c
        assert salted[k].v_sum == pytest.approx(direct[k].s)
        assert salted[k].v_min == direct[k].mn and salted[k].v_max == direct[k].mx


def test_salt_spreads_constant_valued_hot_key(spark):
    from pyspark.sql import functions as F

    from nntsc_spark.operators.sessions import row_salt, salted_agg

    # a hot key whose VALUE column is constant must still fan out across
    # salts (a value-derived salt would collapse to one reducer)
    df = spark.createDataFrame(
        [("hot", i, 7.0) for i in range(2_000)], "k string, ts long, v double"
    )
    n_salts = (
        df.select(row_salt(df, 16).alias("s")).distinct().count()
    )
    assert n_salts >= 8
    out = salted_agg(df, ["k"], "v", salts=16).collect()[0]
    assert out.v_count == 2_000 and out.v_sum == pytest.approx(14_000.0)
    assert out.v_min == 7.0 and out.v_max == 7.0 and out.v_avg == 7.0


def test_salted_join_matches_plain_join(spark):
    from nntsc_spark.operators.sessions import salted_join

    big = spark.createDataFrame(
        [(0, float(i)) for i in range(500)] + [(7, 1.0), (9, 2.0)],
        "k long, value double",
    )
    dim = spark.createDataFrame(
        [(0, "hot"), (7, "seven")], "k long, name string"
    )
    plain = big.join(dim, "k").orderBy("k", "value").collect()
    salted = salted_join(big, dim, "k", salts=8).orderBy("k", "value").collect()
    assert salted == plain
    # left join keeps unmatched big rows exactly once
    left = salted_join(big, dim, "k", salts=8, how="left")
    assert left.where("k = 9").count() == 1
    assert left.count() == big.count()


def test_funnel_counts_ordered_semantics(spark):
    """Earliest-completion ordered funnel on a hand-built event log:
    out-of-order steps don't count, the window bound drops late
    conversions, and counts are monotone non-increasing."""
    from nntsc_spark.operators.sessions import funnel_counts

    rows = [
        # user 1: full ordered funnel inside the window
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # user 2: purchase BEFORE click -> stops after click
        (2, 100, "view"), (2, 150, "purchase"), (2, 200, "click"),
        # user 3: click outside the 500 s window -> stops after view
        (3, 100, "view"), (3, 700, "click"),
        # user 4: never views -> not in the funnel at all
        (4, 100, "click"), (4, 200, "purchase"),
        # user 5: duplicate views, earliest counts; click after FIRST view
        (5, 100, "view"), (5, 400, "view"), (5, 250, "click"),
    ]
    fact = spark.createDataFrame(
        rows, "stream_id long, timestamp long, event_type string"
    )
    out = {r.step: r for r in funnel_counts(
        fact, ["view", "click", "purchase"], window=500).collect()}
    assert [out[s].step_name for s in (1, 2, 3)] == ["view", "click", "purchase"]
    assert out[1].n_users == 4   # users 1, 2, 3, 5
    assert out[2].n_users == 3   # users 1, 2, 5 (3's click too late)
    assert out[3].n_users == 1   # only user 1 purchases AFTER clicking
    assert out[1].n_users >= out[2].n_users >= out[3].n_users


def test_cohort_retention_known_values(spark):
    """Hand-built log: cohort day from earliest signup, offsets count
    distinct active days, horizon bound applies, non-signups excluded."""
    from nntsc_spark.operators.sessions import cohort_retention

    D = 86_400
    rows = [
        # user 1 signs up day 0, active days 0, 1, 3
        (1, 10, "signup"), (1, D + 5, "view"), (1, 3 * D + 5, "click"),
        # user 2 signs up day 0 (second signup day 2 ignored), active 0, 2
        (2, 20, "signup"), (2, 2 * D + 9, "signup"),
        # user 3 never signs up -> excluded entirely
        (3, 30, "view"), (3, D + 30, "view"),
        # user 4 signs up day 1, active day 1 and day 9 (beyond horizon 5)
        (4, D + 40, "signup"), (4, 9 * D + 1, "purchase"),
    ]
    fact = spark.createDataFrame(
        rows, "stream_id long, timestamp long, event_type string"
    )
    out = {(r.cohort_day, r.day_offset): r.n_active
           for r in cohort_retention(fact, max_offset_days=5).collect()}
    assert out == {
        (0, 0): 2,  # users 1 and 2 active on their signup day
        (0, 1): 1,  # user 1
        (0, 2): 1,  # user 2's second signup is day-2 activity
        (0, 3): 1,  # user 1
        (1, 0): 1,  # user 4
    }


def test_cohort_retention_pre_epoch_timestamps_floor(spark):
    """r7 advice: day bucketing must FLOOR (DuckDB // semantics), not
    truncate toward zero — a pre-1970 signup at ts=-10 is day -1, and
    activity at ts=5 (day 0) is offset 1, not 0."""
    from nntsc_spark.operators.sessions import cohort_retention

    fact = spark.createDataFrame(
        [(1, -10, "signup"), (1, 5, "view"),
         # exact midnight boundary: -86400 is day -1 exactly (no remainder)
         (2, -86_400, "signup"), (2, -1, "view")],
        "stream_id long, timestamp long, event_type string",
    )
    out = {(r.cohort_day, r.day_offset): r.n_active
           for r in cohort_retention(fact).collect()}
    assert out == {(-1, 0): 2, (-1, 1): 1}


def test_interval_join_exactly_once_across_buckets(spark):
    from nntsc_spark.operators.intervals import interval_join

    # interval spanning 3 buckets (b=10): a point must match ONCE
    intervals = spark.createDataFrame(
        [(1, 5, 25), (2, 18, 22)], "iv_id long, start long, end long"
    )
    points = spark.createDataFrame(
        [(100, 19), (101, 25), (102, 26), (103, 4)],
        "pt_id long, timestamp long",
    )
    got = sorted(
        (r["pt_id"], r["iv_id"])
        for r in interval_join(
            points, intervals, bucket=10
        ).collect()
    )
    # 19 is in both; 25 only in [5,25] (inclusive end); 26/4 in neither
    assert got == [(100, 1), (100, 2), (101, 1)]
    # exclusive end drops the boundary match
    got_ex = sorted(
        (r["pt_id"], r["iv_id"])
        for r in interval_join(
            points, intervals, bucket=10, inclusive_end=False
        ).collect()
    )
    assert got_ex == [(100, 1), (100, 2)]


def test_interval_join_extra_equality_keys(spark):
    from nntsc_spark.operators.intervals import interval_join

    intervals = spark.createDataFrame(
        [("a", 1, 0, 100), ("b", 2, 0, 100)],
        "k string, iv_id long, start long, end long",
    )
    points = spark.createDataFrame(
        [("a", 10, 50), ("b", 11, 50), ("c", 12, 50)],
        "k string, pt_id long, timestamp long",
    )
    got = sorted(
        (r["k"], r["pt_id"], r["iv_id"])
        for r in interval_join(
            points, intervals, on=["k"], bucket=64
        ).collect()
    )
    assert got == [("a", 10, 1), ("b", 11, 2)]


def test_gap_report_thresholds_on_learned_frequency(spark):
    from nntsc_spark.operators.frequency import gap_report

    # stream 1: 10s cadence with one 100s hole; stream 2: steady, no gap
    rows = ([(1, t) for t in (0, 10, 20, 30)] + [(1, 130), (1, 140)]
            + [(2, t) for t in range(0, 60, 10)])
    df = spark.createDataFrame(rows, "stream_id long, timestamp long")
    out = gap_report(df, k=3.0).collect()
    assert len(out) == 1
    g = out[0]
    assert (g.stream_id, g.gap_start, g.gap_end, g.gap_seconds,
            g.missed, g.frequency) == (1, 30, 130, 100, 9, 10)
    # an injected frequency table overrides the estimate
    freq = spark.createDataFrame([(1, 60), (2, 60)],
                                 "stream_id long, frequency long")
    assert gap_report(df, k=3.0, frequency=freq).count() == 0


def test_availability_report_charges_only_observed_span(spark):
    from nntsc_spark.operators.frequency import availability_report

    rows = ([(1, t) for t in (0, 10, 20, 30)] + [(1, 130), (1, 140)]
            + [(2, t) for t in range(0, 60, 10)] + [(3, 1000)])
    df = spark.createDataFrame(rows, "stream_id long, timestamp long")
    out = {r.stream_id: r for r in availability_report(df, k=3.0).collect()}
    # stream 1: 100 silent seconds of a 140s span
    r1 = out[1]
    assert (r1.n_gaps, r1.silent_seconds, r1.span_seconds) == (1, 100, 140)
    assert abs(r1.availability - round(1 - 100 / 140, 4)) < 1e-12
    # steady stream: fully available; single-point stream: no span
    assert out[2].availability == 1.0 and out[2].n_gaps == 0
    assert out[3].availability is None and out[3].span_seconds == 0
