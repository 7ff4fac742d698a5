"""Pre-aggregated rollups + algebraic re-merge (the Influx CQ / matrix path).

The reference maintains 1-minute and 1-hour per-stream rollups via Influx
continuous queries, storing for each metric the mean, a ``magiccount_<col>``
count, stddev, sum, max, min (reference: libnntsc/influx.py:158-195
create_matrix_cq).  Dashboard "matrix" queries then merge rollup rows into
one cell per label with algebraic rules rather than re-scanning raw data
(influx.py:439-513):

- sum   -> SUM(sum)
- count -> SUM(count)
- max   -> MAX(max);  min -> MIN(min)
- avg   -> SUM(mean * n) / SUM(n)            (weighted by magiccount)
- stddev-> sqrt(SUM(sd^2 * n) / SUM(n))      (the reference's pooled formula —
           deliberately not a true combined stddev; parity requires matching it)
- mode  -> count-weighted mode

Spark-first: the rollup build is one groupBy over the fact table keyed on
(stream_id, binstart) — partial aggregation makes this a near-map-side-only
shuffle; at 100 TB the rollup output is ~1/binsize the input and is the only
thing matrix queries ever scan.  In production the build runs as a
Structured Streaming windowed aggregation (SURVEY.md §2.8 T6); the batch
builder here shares the exact expression set so batch and streaming agree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import BINSTART_COL
from .labels import LABEL_COL, apply_labels
from .select import time_filter


def build_rollup(
    fact: DataFrame,
    binsize: int,
    value_cols: Sequence[str],
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-(stream, bin) pre-aggregate with everything the merge rules need.

    Emits for each value column: ``mean_<c>``, ``magiccount_<c>``,
    ``sum_<c>``, ``max_<c>``, ``min_<c>``, ``stddev_<c>`` (sample stddev, as
    Influx/Postgres stddev()).
    """
    binstart = (F.col(ts_col) - (F.col(ts_col) % F.lit(int(binsize)))).alias(
        BINSTART_COL
    )
    exprs = [F.max(ts_col).alias("timestamp")]
    for c in value_cols:
        col = F.col(c)
        exprs += [
            F.avg(col).alias(f"mean_{c}"),
            F.count(col).alias(f"magiccount_{c}"),
            F.sum(col).alias(f"sum_{c}"),
            F.max(col).alias(f"max_{c}"),
            F.min(col).alias(f"min_{c}"),
            F.stddev_samp(col).alias(f"stddev_{c}"),
        ]
    return fact.groupBy("stream_id", binstart).agg(*exprs)


def merge_rollup(
    rollup: DataFrame,
    label_map: DataFrame,
    value_cols: Sequence[str],
    start: int | None = None,
    stop: int | None = None,
) -> DataFrame:
    """Matrix-style algebraic merge: rollup rows -> one row per label.

    Mirrors libnntsc/influx.py:439-513; the bin filter uses binstart so only
    whole bins inside [start, stop] participate (the reference snaps the
    start down to a bin boundary first, influx.py:387-394 — callers do that
    snapping).
    """
    pruned = time_filter(rollup, start, stop, ts_col=BINSTART_COL)
    labeled = apply_labels(pruned, label_map)
    exprs = [
        F.max("timestamp").alias("timestamp"),
        F.min(BINSTART_COL).alias(BINSTART_COL),
    ]
    for c in value_cols:
        n = F.col(f"magiccount_{c}")
        exprs += [
            F.sum(f"sum_{c}").alias(f"sum_{c}"),
            F.sum(n).alias(f"count_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            (F.sum(F.col(f"mean_{c}") * n) / F.sum(n)).alias(f"avg_{c}"),
            F.sqrt(
                F.sum(F.col(f"stddev_{c}") * F.col(f"stddev_{c}") * n) / F.sum(n)
            ).alias(f"stddev_{c}"),
        ]
    return labeled.groupBy(LABEL_COL).agg(*exprs)


def snap_down(ts: int, binsize: int) -> int:
    """Snap a timestamp down to a bin boundary (influx.py:387-394)."""
    return int(ts) - (int(ts) % int(binsize))
