"""Unit tests for operators/correlate.py on hand-built series."""

from __future__ import annotations

from nntsc_spark.operators.correlate import (
    autocorrelation,
    stream_correlation,
)


def test_acf_alternating_series_and_min_pairs_gate(spark):
    # stream 1: strict alternation -> acf(1) = -1, acf(2) = +1;
    # stream 2: too short for the min_pairs gate -> NULL acf
    rows = [(1, b, float(1 if b % 2 else -1)) for b in range(20)]
    rows += [(2, b, float(b)) for b in range(4)]
    df = spark.createDataFrame(
        rows, "stream_id long, binstart long, value double"
    )
    out = {
        (r.stream_id, r.lag): (r.n_pairs, r.acf)
        for r in autocorrelation(df, lags=[1, 2], min_pairs=8).collect()
    }
    assert out[(1, 1)] == (19, -1.0)
    assert out[(1, 2)] == (18, 1.0)
    assert out[(2, 1)] == (3, None)
    # constant series: zero variance must yield NULL, not NaN
    const = spark.createDataFrame(
        [(1, b, 5.0) for b in range(12)],
        "stream_id long, binstart long, value double",
    )
    acfs = {r.lag: r.acf
            for r in autocorrelation(const, lags=[1]).collect()}
    assert acfs == {1: None}


def test_stream_correlation_pairs_overlap_and_topn(spark):
    # streams 1/2 identical (+1.0), 1/3 inverted (-1.0), 4 overlaps on
    # too few bins to pass min_overlap
    rows = []
    for b in range(12):
        v = float((b * 7) % 5)
        rows += [(1, b, v), (2, b, v * 2 + 1), (3, b, -v)]
    rows += [(4, b, 1.0 * b) for b in range(3)]
    df = spark.createDataFrame(
        rows, "stream_id long, binstart long, value double"
    )
    got = {
        (r.stream_a, r.stream_b): (r.n_bins, r.corr)
        for r in stream_correlation(df, min_overlap=8).collect()
    }
    assert got[(1, 2)] == (12, 1.0)
    assert got[(1, 3)] == (12, -1.0)
    assert got[(2, 3)] == (12, -1.0)
    assert not any(4 in k for k in got)
    # top_n=1 keeps the strongest |corr| with deterministic tie-break
    top = stream_correlation(df, min_overlap=8, top_n=1).collect()
    assert len(top) == 1 and (top[0].stream_a, top[0].stream_b) == (1, 2)
