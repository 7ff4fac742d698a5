"""Stateful streaming sessionization — applyInPandasWithState.

The batch sessionizer (operators/sessions.py) needs the whole history to
number sessions; on an unbounded stream the state that must survive between
micro-batches is exactly one open session per stream.  This is the charter's
"custom stateful operator" shape: Structured Streaming's
``applyInPandasWithState`` keeps that state in the state store (checkpointed,
recoverable, partitioned by the group key — scales to millions of streams
because each executor holds only its key range).

Semantics match the batch operator: a session closes when a later event
arrives more than ``timeout`` seconds after the session's last event.  Closed
sessions are emitted as soon as the closing event is seen; the final open
session per stream stays in state (on a real deployment an event-time
timeout would flush idle sessions via ``GroupStateTimeout.EventTimeTimeout``).

No reference analogue (the reference has only fixed time bins); cited as a
charter extension in COVERAGE.md.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

SESSION_SCHEMA = StructType(
    [
        StructField("stream_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

#: open-session carry-over between micro-batches
STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

_OUT_COLS = ["stream_id", "session_start", "session_end", "n_events", "value_sum"]


def _make_session_fn(timeout: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (stream_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("timestamp")
        if state.exists:
            start, end, n, vsum = state.get
        else:
            start, end, n, vsum = None, None, 0, 0.0
        closed: list[tuple[int, int, int, int, float]] = []
        for ts, value in zip(batch["timestamp"], batch["value"]):
            ts = int(ts)
            if start is None:
                start, end, n, vsum = ts, ts, 1, float(value)
            elif ts - end > timeout:
                closed.append((stream_id, start, end, n, vsum))
                start, end, n, vsum = ts, ts, 1, float(value)
            else:
                end = max(end, ts)
                n += 1
                vsum += float(value)
        state.update((start, end, n, vsum))
        yield pd.DataFrame(closed, columns=_OUT_COLS)

    return fn


def streaming_sessionize(events: DataFrame, timeout: int) -> DataFrame:
    """Closed sessions from an unbounded (stream_id, timestamp, value) stream.

    ``events`` must be a streaming DataFrame.  Within a micro-batch events
    may arrive unordered (sorted per group before folding); across batches
    ordering follows arrival order, as with the reference's ingest.
    """
    return events.groupBy("stream_id").applyInPandasWithState(
        _make_session_fn(timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
