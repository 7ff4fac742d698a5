"""Raw data selection (NNTSC_REQUEST history path).

Reference shape (libnntsc/dbselect.py:390-532 select_data): per-label, the
stream-pruned UNION ALL of per-stream tables is inner-joined to the streams
table, time-filtered, projected to the client's columns plus forced
``timestamp``/``stream_id``/``nntsclabel``, ordered by (label, timestamp).

Spark-first: one job for all labels — broadcast label join + pushed-down
time/stream predicates on a single columnar scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .labels import LABEL_COL, apply_labels

#: columns always returned regardless of the client's selection
#: (reference: libnntsc/dbselect.py:464-487)
FORCED_COLUMNS = ["timestamp", "stream_id", LABEL_COL]


def sanitise_columns(df: DataFrame, selectcols: Sequence[str]) -> list[str]:
    """Drop requested columns not present in the schema (projection guard,
    libnntsc/dbselect.py:770-801).  The DataFrame API has no injection risk;
    we keep the pruning so bad client input degrades instead of erroring."""
    have = set(df.columns) | set(FORCED_COLUMNS)
    return [c for c in selectcols if c in have]


def time_filter(
    df: DataFrame, start: int | None, stop: int | None, ts_col: str = "timestamp"
) -> DataFrame:
    """Inclusive-bounds time-range predicate, the Postgres-side convention
    (``timestamp >= start AND timestamp <= stop``, libnntsc/dbselect.py:725-730).

    The reference's Influx leg is half-open (influx.py:341-344); we
    standardize on the inclusive convention engine-wide (SURVEY.md §2.2 P3).
    """
    if start is not None:
        df = df.where(F.col(ts_col) >= int(start))
    if stop is not None:
        df = df.where(F.col(ts_col) <= int(stop))
    return df


def select_data(
    fact: DataFrame,
    label_map: DataFrame,
    selectcols: Sequence[str],
    start: int | None,
    stop: int | None,
    order: bool = True,
) -> DataFrame:
    """Raw history selection: prune + label + project + order.

    The time filter is applied *before* the join so Catalyst pushes it to the
    parquet scan (PushedFilters); the broadcast join adds no fact-side
    shuffle.  The final sort is the only exchange, and only when the caller
    needs ordered delivery (the export protocol does; the correctness
    harness's order-insensitive compare does not).
    """
    pruned = time_filter(fact, start, stop)
    labeled = apply_labels(pruned, label_map)
    cols = list(dict.fromkeys([*sanitise_columns(labeled, selectcols), *FORCED_COLUMNS]))
    out = labeled.select(*cols)
    if order:
        out = out.orderBy(LABEL_COL, "timestamp")
    return out
