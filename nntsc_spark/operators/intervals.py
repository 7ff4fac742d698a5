"""Scalable point-in-interval joins (bucketed equi-join strategy).

Spark evaluates a raw ``p.ts BETWEEN i.start AND i.end`` theta-join as a
BroadcastNestedLoopJoin (fine when one side broadcasts) or falls off a
cliff into a cartesian product when both sides are large.  The classic
distributed strategy turns the range predicate into an equi-join: bucket
time into fixed windows, replicate each interval into every bucket it
overlaps, give each point its single home bucket, equi-join on
(extra keys..., bucket), and refine with the exact range predicate.

Why each match survives exactly once with no dedup pass: a point lives
in exactly ONE bucket (its own), and the interval copy it meets there is
the one replicated into that bucket — so the (point, interval) pair can
only ever join in one place.  No ``distinct()``, no shuffle beyond the
equi-join itself.

Cost model (the knob that matters at 100 TB): intervals are replicated
``~1 + span/bucket`` times, points once.  Pick ``bucket`` near the
typical interval span so the replication factor stays ~2; a hot bucket
(many intervals stacked on one window) is ordinary join skew and AQE's
skew-join splitting (on by default in session.py) handles it.

Reference parity: NNTSC itself never range-joins (its queries are
stream-keyed time slices), but its downstream consumers correlate
measurements against maintenance windows / outage tickets exactly this
way; this generalizes the as-of join (operators/timeseries.py) from
"latest left of t" to "all overlapping [start, end]".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "timestamp",
    start_col: str = "start",
    end_col: str = "end",
    on: Sequence[str] = (),
    bucket: int = 3600,
    inclusive_end: bool = True,
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start, end]`` (or ``[start, end)``) contains ``points[ts_col]``,
    optionally also requiring equality on the ``on`` columns.

    All time columns must share one integer unit (epoch seconds here —
    the engine's native fact granularity).  Non-``on`` column names must
    be disjoint between the two inputs; select/rename first.

    Returns the inner join of the two schemas (``on`` columns appear
    once).  One shuffle per side on (``on``..., bucket); interval
    replication is ``~1 + span/bucket`` — choose ``bucket`` near the
    typical span.
    """
    b = int(bucket)
    p = points.withColumn(
        "_ij_bucket", F.floor(F.col(ts_col) / F.lit(b))
    )
    i = intervals.withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(b)),
                F.floor(F.col(end_col) / F.lit(b)),
            )
        ),
    )
    upper = (
        F.col(ts_col) <= F.col(end_col)
        if inclusive_end
        else F.col(ts_col) < F.col(end_col)
    )
    return (
        p.join(i, [*on, "_ij_bucket"])
        .where((F.col(ts_col) >= F.col(start_col)) & upper)
        .drop("_ij_bucket")
    )
