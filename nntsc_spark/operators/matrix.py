"""NNTSC_MATRIX — dashboard summary cells from rollups.

Reference flow (libnntsc/dbselect.py:181-205 select_matrix_data +
influx.py:384-394): default the window to the last 24 h, pick the rollup
granularity by span (>= 1 h span -> 1-hour bins with the start snapped down
to the hour, else 1-minute bins), query once for *all* labels' streams, then
re-aggregate per label with the algebraic merge rules.

Spark-first: the "query once for all streams then python-side merge per
label" loop (influx.py:414-513) is exactly one broadcast-join + groupBy over
the rollup table (operators.rollup.merge_rollup).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from .rollup import build_rollup, merge_rollup, snap_down
from .select import time_filter

HOUR = 3600
MINUTE = 60
DAY = 86400

# Hourly-path grace window (influx.py:389-390): a start within 2 minutes
# past an hour boundary backs up a FULL extra hour before snapping, because
# the most recent hourly CQ row may not cover the boundary bin yet.
MATRIX_HOUR_GRACE = 2 * MINUTE


def choose_rollup_binsize(start: int, stop: int) -> int:
    """Span >= 1 h -> hourly rollup, else minute rollup (influx.py:384-394)."""
    return HOUR if (stop - start) >= HOUR else MINUTE


def snap_matrix_start(start: int, binsize: int) -> int:
    """Matrix start snap (influx.py:387-394).

    Hourly path: subtract a whole hour first when ``start % 3600 < 120``
    (the reference's 2-minute rule — note it fires for exactly-aligned
    starts too), then snap down to the bin boundary.  Minute path snaps
    only.
    """
    start = int(start)
    if binsize == HOUR and start % HOUR < MATRIX_HOUR_GRACE:
        start -= HOUR
    return snap_down(start, binsize)


def select_matrix_data(
    fact: DataFrame,
    label_map: DataFrame,
    value_cols: Sequence[str],
    start: int,
    stop: int,
) -> DataFrame:
    """Matrix summary: one row per label over [start, stop].

    Batch form builds the rollup inline; in production the rollup tables are
    maintained incrementally (streaming job) and this becomes a pure
    merge_rollup over the stored rollup — the expressions are shared so both
    paths agree bit-for-bit.
    """
    binsize = choose_rollup_binsize(start, stop)
    snapped = snap_matrix_start(start, binsize)
    # pre-filter the RAW scan to exactly the participating bins' rows:
    # merge_rollup's binstart predicate is derived arithmetic that parquet
    # row-group pruning can't use, so without this plain timestamp range
    # a 24 h dashboard query would aggregate the table's entire history
    # (r5 review finding).  The upper bound extends to the END of stop's
    # bin — merge keeps whole bins, so results are bit-identical.
    hi = snap_down(stop, binsize) + binsize - 1
    rollup = build_rollup(
        time_filter(fact, snapped, hi), binsize, value_cols
    )
    return merge_rollup(rollup, label_map, value_cols, snapped, stop)


def select_matrix_from_stored(
    rollup: DataFrame,
    label_map: DataFrame,
    value_cols: Sequence[str],
    start: int,
    stop: int,
    binsize: int,
) -> DataFrame:
    """Matrix summary served from a STORED rollup table (the production
    path, mirroring the reference's Influx CQ tables: influx.py:384-394
    reads ``data_..._matrix`` / ``..._matrix_short``, never raw points).

    At 100 TB the raw fact is untouchable for a dashboard query; the hourly
    rollup is ~1/3600 of it and is the only input here.  Shares
    merge_rollup's expressions with the inline path so both agree
    bit-for-bit (verified in tests).
    """
    return merge_rollup(
        rollup, label_map, value_cols, snap_matrix_start(start, binsize), stop
    )
