"""Aggregation registry: the reference's full aggregate surface, Spark-native.

The reference supports max/min/sum/avg/count (README:353-355) plus stddev,
mode ("most"), smoke (20-quantile array), most_array, arraysize
(libnntsc/dbselect.py:803-835), the latter three as custom Postgres
aggregates created at bootstrap (libnntsc/database.py:405-479).  Here every
one is a native DataFrame expression — no Python UDAFs, everything stays
JVM-side in whole-stage codegen.

Duplicate-name rule: when the same column is aggregated twice, outputs are
renamed ``<col>_<func>`` (reference: libnntsc/dbselect.py:810-821,
influx.py:641-648).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIMPLE_AGGS = {
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "avg": F.avg,
    "count": F.count,
    # sample stddev, matching Postgres stddev() used by the matrix CQs
    # (amp_icmp.py:75, influx.py:158-173)
    "stddev": F.stddev_samp,
}

#: aggregations that need a pre-pass (window / two-level groupBy) and are
#: handled by dedicated operators below rather than a single expression.
COMPLEX_AGGS = {"mode", "most", "smoke", "most_array", "arraysize"}


def output_name(col: str, func: str, requested: Sequence[tuple[str, str]]) -> str:
    """Reference's rename rule: ``col`` unless that column appears under more
    than one aggregate function in the same request, then ``col_func``
    (libnntsc/dbselect.py:810-821)."""
    dup = sum(1 for c, _ in requested if c == col) > 1
    return f"{col}_{func}" if dup else col


def simple_agg_exprs(
    aggcols: Sequence[tuple[str, str]],
    requested: Sequence[tuple[str, str]] | None = None,
) -> list[Column]:
    """Build expressions for the plain-SQL aggregates (A3/A5).

    ``requested`` is the FULL request when ``aggcols`` is a subset (complex
    aggregates split out) so the dup-rename rule sees every pair."""
    if requested is None:
        requested = aggcols
    exprs = []
    for col, func in aggcols:
        if func in ("most", "mode", "smoke", "most_array"):
            raise ValueError(f"{func} needs its dedicated operator")
        if func == "arraysize":
            # array_length applied as an aggregate output: the reference
            # emits array_length(col,1) per group (dbselect.py:828-829);
            # per-bin we take the max size observed.
            exprs.append(F.max(F.size(F.col(col))).alias(output_name(col, func, requested)))
            continue
        try:
            fn = SIMPLE_AGGS[func]
        except KeyError:
            raise ValueError(f"unknown aggregate function {func!r}") from None
        exprs.append(fn(F.col(col)).alias(output_name(col, func, requested)))
    return exprs


def mode_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "mode",
) -> DataFrame:
    """Deterministic mode ("most"): most frequent value per group, smallest
    value wins ties.

    The reference implements this as array_append -> GROUP BY/count/LIMIT 1
    inside a custom aggregate (libnntsc/database.py:405-419 _final_most).
    Spark-first: two-level groupBy + max-by-struct — one extra shuffle on the
    (group, value) key, no window sort, fully codegen'd.  ``F.max`` over a
    struct(count, negated-orderable-value) picks the winner without a
    row_number window, which avoids a per-group sort at 100 TB.
    """
    counted = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    # max over struct orders by _cnt then value; to break ties by *smallest*
    # value we use min_by over a struct ordered by (-count, value).
    winner = counted.groupBy(*group_cols).agg(
        F.min_by(
            F.col(value_col), F.struct((-F.col("_cnt")).alias("n"), F.col(value_col))
        ).alias(out_col)
    )
    return winner


def most_array_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    array_col: str,
    out_col: str = "most_array",
) -> DataFrame:
    """Mode over array-typed values.

    The reference serializes arrays to strings for comparability
    (libnntsc/dbselect.py:824-827); Spark arrays are directly comparable and
    groupable, so this is just :func:`mode_agg` on the array column.
    """
    return mode_agg(df, group_cols, array_col, out_col)


def smoke_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "smoke",
) -> DataFrame:
    """The "smokeping smoke" percentile fan: per group, split the non-null
    values into 20 ntiles by value order and average each ntile, producing a
    20-element array (fewer when n < 20).

    Exact port of the custom Postgres aggregate semantics
    (libnntsc/database.py:421-435 _final_smoke: ``ntile(20) OVER (ORDER BY
    foo)`` then per-ntile avg) — ``percentile_approx`` would NOT match.

    Scale note: the ntile window partitions by the group key, so the sort is
    per-group and distributed; the subsequent two groupBys reuse the same
    key.  No driver-side collection.
    """
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(F.col(value_col))
    tiled = (
        df.where(F.col(value_col).isNotNull())
        .withColumn("_tile", F.ntile(20).over(w))
    )
    per_tile = tiled.groupBy(*group_cols, "_tile").agg(
        F.avg(value_col).alias("_tile_avg")
    )
    return per_tile.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_tile", "_tile_avg"))),
            lambda s: s["_tile_avg"],
        ).alias(out_col)
    )


def smoke_fan_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "smoke",
) -> DataFrame:
    """Percentile-fan smoke for wide ranges: 19 interpolated percentiles
    (5..95 step 5) plus the max, one 20-element array per group.

    Unlike :func:`smoke_agg`'s exact ntile, ``percentile`` is a real
    aggregate with a map-side partial, so there is NO per-group window
    sort funnelling a whole label's history through one reducer — this is
    the scale path the export layer routes wide requests to.  Mirrors the
    reference's own divergence: its Influx rollup path swaps the Postgres
    ntile smoke for a percentile fan (libnntsc/influx.py:699-713).
    """
    pcts = ", ".join(str(i / 100) for i in range(5, 100, 5))
    fan = F.expr(f"percentile(`{value_col}`, array({pcts}))")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.array_append(fan, F.max(value_col).cast("double")).alias(
                out_col
            )
        )
    )


def trim_smoke_fan(fan: Column, n: Column) -> Column:
    """Influx-percentile-fan trimming (libnntsc/influx.py:699-713): when a
    group holds fewer than 20 values, only the first ceil(n * 20 / 20) =
    n distinct percentile slots are meaningful — the tail repeats the max.
    Keep ``n`` entries when n < 20, the full fan otherwise."""
    return F.when(n < 20, F.slice(fan, 1, n.cast("int"))).otherwise(fan)


def smoke_rows(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-form smoke (one row per (group, ntile) with the tile mean) —
    same information as :func:`smoke_agg`, oracle-friendly shape.

    ``order_cols`` lets callers append tie-break keys so the ntile
    assignment (and hence each tile's mean) is deterministic when values
    repeat — required for cross-engine oracle parity.
    """
    order = [F.col(c) for c in (order_cols or [value_col])]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        df.where(F.col(value_col).isNotNull())
        .withColumn("tile", F.ntile(20).over(w))
        .groupBy(*group_cols, "tile")
        .agg(F.avg(value_col).alias("tile_avg"))
    )
