"""Stateful streaming anomaly detection — the online sibling of
``operators/timeseries.py``'s EWMA / Holt-Winters batch detectors.

The batch operators need per-series history windows; on an unbounded
stream the state that must survive micro-batches is three scalars per
series — the exponentially-weighted mean, the exponentially-weighted
variance, and the observation count.  ``applyInPandasWithState`` keeps
exactly that in the state store (checkpointed, recoverable, partitioned
by stream — constant state per key, so millions of series cost millions
of scalar triples, not history buffers).

Online recursion (West's EW update, the streaming-standard form):

    delta = x - mean;  incr = alpha * delta
    mean' = mean + incr
    var'  = (1 - alpha) * (var + delta * incr)

An event is scored BEFORE it updates the state (self-exclusion, as the
batch ``rolling_zscore`` does): flagged when at least ``min_points``
prior observations exist and ``|x - mean| > nsigma * sqrt(var)``.

The reference's ecosystem runs this detector class downstream of the
export stream (its event monitor consumes NNTSC live feeds); pushing it
into the engine makes the alert stream one more streaming DataFrame.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SCORE_SCHEMA = StructType(
    [
        StructField("stream_id", LongType()),
        StructField("timestamp", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("score", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

#: (ew mean, ew variance, observation count) — constant size per stream
STATE_SCHEMA = StructType(
    [
        StructField("mean", DoubleType()),
        StructField("var", DoubleType()),
        StructField("n", LongType()),
    ]
)

_OUT_COLS = ["stream_id", "timestamp", "value", "ewma", "score", "is_anomaly"]


def _make_scorer(alpha: float, nsigma: float, min_points: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        (stream_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "timestamp", kind="mergesort"
        )
        mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
        rows = []
        for ts, value in zip(batch["timestamp"], batch["value"]):
            x = float(value)
            if n >= int(min_points):
                sd = math.sqrt(var) if var > 0 else 0.0
                score = (x - mean) / sd if sd > 0 else None
                flag = (
                    abs(x - mean) > float(nsigma) * sd
                    if sd > 0
                    else x != mean
                )
            else:
                score, flag = None, None
            delta = x - mean if n else 0.0
            incr = float(alpha) * delta
            if n:
                mean = mean + incr
                var = (1.0 - float(alpha)) * (var + delta * incr)
            else:
                mean, var = x, 0.0
            n += 1
            rows.append(
                (
                    stream_id,
                    int(ts),
                    x,
                    round(mean, 4),
                    None if score is None else round(score, 4),
                    flag,
                )
            )
        state.update((mean, var, n))
        out = pd.DataFrame(rows, columns=_OUT_COLS)
        out["is_anomaly"] = pd.array(out["is_anomaly"], dtype="boolean")
        yield out

    return fn


def streaming_anomaly_scores(
    events: DataFrame,
    alpha: float = 0.25,
    nsigma: float = 4.0,
    min_points: int = 10,
) -> DataFrame:
    """Per-event anomaly scores from an unbounded (stream_id, timestamp,
    value) stream; every event is emitted with its post-update ewma, its
    self-excluded z-score against the pre-update state, and the flag
    (NULL during the per-stream warmup).

    ``events`` must be a streaming DataFrame.  Within a micro-batch
    events are sorted by timestamp per stream; across batches the
    recursion follows arrival order, as with the reference's ingest.
    """
    return events.groupBy("stream_id").applyInPandasWithState(
        _make_scorer(alpha, nsigma, min_points),
        outputStructType=SCORE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
