"""Binned aggregation (NNTSC_AGGREGATE — the workhorse query).

Reference shape (libnntsc/dbselect.py:208-362 select_aggregated_data): inner
query labels + projects the stream-pruned union; outer query GROUPs BY
(nntsclabel, groupcols, binstart) with the requested aggregates, where
``binstart = timestamp - timestamp %% binsize`` (dbselect.py:295-307), every
bin also carrying ``max(timestamp) AS timestamp`` (dbselect.py:292-293), and
history is chunked into <=7-day pieces (exporter.py:197-235).

Spark-first: the chunk loop and per-label loop vanish — one groupBy over the
labeled scan computes every label and bin in a single stage pair
(partial/map-side aggregation + one shuffle on the group key).  Bin math is
integer arithmetic (NOT F.window) so results are exact and stay inside
whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.aggregations import (
    mode_agg,
    most_array_agg,
    output_name,
    simple_agg_exprs,
    smoke_agg,
    smoke_fan_agg,
)
from .labels import LABEL_COL, apply_labels
from .select import time_filter

BINSTART_COL = "binstart"

#: ranges wider than this route ``smoke`` to the percentile fan — the exact
#: ntile form sorts each group's history on a single reducer, fine for a
#: dashboard-sized window, a scale killer for a year of one label's data.
SMOKE_FAN_RANGE = 7 * 86400

#: aggregates computed by a dedicated operator and joined back on the keys
_JOINED_AGGS = ("smoke", "most", "mode", "most_array")


def with_binstart(
    df: DataFrame,
    binsize: int,
    start: int | None = None,
    stop: int | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Add the integer bin column.

    ``binsize=0`` (or binsize spanning the whole range) means one summary bin:
    the reference then emits ``min(timestamp) AS binstart`` per group
    (libnntsc/dbselect.py:295-307); we mark the whole frame as a single bin
    and let the aggregation emit min(timestamp).
    """
    if binsize and not (start is not None and stop is not None and binsize >= stop - start):
        expr = F.col(ts_col) - (F.col(ts_col) % F.lit(int(binsize)))
    else:
        expr = F.lit(None).cast("long")  # single-bin sentinel
    return df.withColumn(BINSTART_COL, expr)


def select_aggregated_data(
    fact: DataFrame,
    label_map: DataFrame,
    aggcols: Sequence[tuple[str, str]],
    start: int | None,
    stop: int | None,
    groupcols: Sequence[str] = (),
    binsize: int = 300,
    order: bool = True,
) -> DataFrame:
    """The workhorse: label -> time filter -> bin -> grouped aggregate.

    Returns columns: nntsclabel, [groupcols...], binstart, timestamp
    (= max ts in bin, A4), then one column per aggregate (rename rule per
    functions.aggregations.output_name).

    For ``binsize=0`` / full-range binsize the single summary bin carries
    ``min(timestamp) AS binstart`` (matching dbselect.py:303-307's
    min_timestamp semantics).

    Complex aggregates (smoke/most/most_array) run as dedicated operators
    over the same binned frame and join back on the group keys.  ``smoke``
    additionally routes by range width: exact ntile inside SMOKE_FAN_RANGE
    (reference Postgres parity), percentile fan beyond it (no per-group
    window sort — the plan for a wide range contains no Window at all).
    """
    labeled = apply_labels(time_filter(fact, start, stop), label_map)
    single_bin = not binsize or (
        start is not None and stop is not None and binsize >= stop - start
    )
    joined = [(c, f) for c, f in aggcols if f in _JOINED_AGGS]
    simple = [(c, f) for c, f in aggcols if f not in _JOINED_AGGS]
    keys = [LABEL_COL, *groupcols]
    exprs = [
        F.max("timestamp").alias("timestamp"),
        *simple_agg_exprs(simple, requested=aggcols),
    ]
    if single_bin:
        out = labeled.groupBy(*keys).agg(
            F.min("timestamp").alias(BINSTART_COL), *exprs
        )
        # column order parity with the binned path
        out = out.select(*keys, BINSTART_COL, *[c for c in out.columns if c not in (*keys, BINSTART_COL)])
        grp, grp_keys = labeled, keys
    else:
        binned = with_binstart(labeled, binsize, start, stop)
        out = binned.groupBy(*keys, BINSTART_COL).agg(*exprs)
        grp, grp_keys = binned, [*keys, BINSTART_COL]
    wide = (
        start is None
        or stop is None
        or (stop - start) > SMOKE_FAN_RANGE
    )
    for col, func in joined:
        name = output_name(col, func, aggcols)
        if func == "smoke":
            op = smoke_fan_agg if wide else smoke_agg
            part = op(grp, grp_keys, col, name)
        elif func == "most_array":
            part = most_array_agg(grp, grp_keys, col, name)
        else:  # most / mode
            part = mode_agg(grp, grp_keys, col, name)
        # null-SAFE key equality: a NULL groupcol value forms a real group
        # in both sides, but a name-list join's NULL = NULL is false and
        # silently dropped that group's complex-agg result (r5 review
        # finding); <=> matches the simple aggregates' groupBy semantics
        cond = [out[k].eqNullSafe(part[k]) for k in grp_keys]
        out = out.join(part, cond, "left").drop(*[part[k] for k in grp_keys])
    if order:
        out = out.orderBy(LABEL_COL, BINSTART_COL)
    return out
