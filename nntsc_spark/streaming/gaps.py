"""Online gap / outage detection — applyInPandasWithState with a
processing-time timeout.

The reference ecosystem detects measurement gaps DOWNSTREAM of export:
the exporter estimates each stream's frequency (reference:
libnntsc/exporter.py frequency estimation; batch analogue
operators/frequency.py, T9) and the graphing/eventing consumers break
lines / raise events where the series goes silent longer than a few
periods.  This operator runs that detection ONLINE, inside ingest, with
two complementary channels:

* **closed gaps** — when a stream RESUMES after a silence longer than
  ``k x`` its learned frequency, emit (gap_start, gap_end, missed)
  immediately: the retrospective channel, exact event-time arithmetic.
* **open outages** — a stream that stops entirely never delivers the
  resuming event, so the state registers a PROCESSING-TIME timeout
  (``silence_timeout_ms``); when it fires with no new data the operator
  emits an ``open=True`` row with ``gap_end`` NULL — the alerting
  channel no batch query can produce.  Exactly one open row per outage
  (the state remembers it reported); the eventual resume emits the
  closing row with real bounds, which consumers pair by (stream,
  gap_start).  A resume that arrives IN cadence (the timeout was a
  false positive — late/backfilled data) still closes the open row,
  with ``missed=0`` as the retraction signal, and ANY processed
  arrival re-arms the timeout — so one false positive can never
  permanently disarm the channel.

Frequency is learned per stream as an exponentially-weighted mean of
inter-arrival deltas, EXCLUDING outage deltas (a gap folded into the
estimate would inflate it and mask the next gap — the same
contaminated-estimator trap as rolling_zscore's self-exclusion).

State per stream is four scalars — constant memory per key in the
checkpointed state store, scaling to millions of streams the same way
the sessionizer does.
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

GAP_SCHEMA = StructType(
    [
        StructField("stream_id", LongType()),
        StructField("gap_start", LongType()),
        StructField("gap_end", LongType()),
        StructField("missed", LongType()),
        StructField("est_freq", DoubleType()),
        StructField("open", BooleanType()),
    ]
)

#: (last_seen, ew_freq, n_deltas, open_reported)
GAP_STATE_SCHEMA = StructType(
    [
        StructField("last_seen", LongType()),
        StructField("ew_freq", DoubleType()),
        StructField("n_deltas", LongType()),
        StructField("open_reported", LongType()),
    ]
)

_COLS = ["stream_id", "gap_start", "gap_end", "missed", "est_freq", "open"]


def _make_gap_fn(k: float, alpha: float, silence_timeout_ms: int | None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (stream_id,) = key
        if state.hasTimedOut:
            # the stream went silent and nothing arrived to close the
            # gap: emit the open-outage row ONCE and stop re-arming (a
            # re-armed timeout would re-report the same outage forever)
            last_seen, ew_freq, n_deltas, reported = state.get
            out = []
            if not reported:
                out.append(
                    (stream_id, last_seen, None, None, ew_freq, True)
                )
            state.update((last_seen, ew_freq, n_deltas, 1))
            yield pd.DataFrame(out, columns=_COLS)
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "timestamp"
        )
        if state.exists:
            last_seen, ew_freq, n_deltas, reported = state.get
        else:
            last_seen, ew_freq, n_deltas, reported = None, None, 0, 0
        out = []
        for ts in batch["timestamp"]:
            ts = int(ts)
            # a duplicate or late arrival (sorted within the batch, but
            # a WHOLE batch can arrive behind a previous one) must not
            # rewind last_seen nor feed a non-positive delta into the
            # cadence estimate — either would fabricate the next gap
            if last_seen is not None and ts <= last_seen:
                continue
            if last_seen is not None:
                delta = ts - last_seen
                gap = (
                    ew_freq is not None
                    and n_deltas >= 2
                    and delta > k * ew_freq
                )
                if gap:
                    out.append(
                        (
                            stream_id,
                            last_seen,
                            ts,
                            max(int(delta / ew_freq) - 1, 1),
                            ew_freq,
                            False,
                        )
                    )
                else:
                    if reported:
                        # false-positive open outage: the timeout fired
                        # (e.g. late/backfilled data) but the resume
                        # arrived in cadence.  Emit the closing row
                        # anyway — consumers pair open/close on
                        # (stream, gap_start), and a close with
                        # missed=0 is their retraction signal.
                        out.append(
                            (stream_id, last_seen, ts, 0, ew_freq, False)
                        )
                    # only in-cadence deltas teach the estimator
                    ew_freq = (
                        float(delta)
                        if ew_freq is None
                        else (1 - alpha) * ew_freq + alpha * float(delta)
                    )
                    n_deltas += 1
                # ANY processed arrival means the outage, if one was
                # reported open, has ended — re-arming must not depend
                # on the resume delta qualifying as a gap, or one
                # false-positive timeout permanently disarms the
                # open-outage channel for this stream
                reported = 0
            last_seen = ts
        state.update((last_seen, ew_freq, n_deltas, reported))
        if silence_timeout_ms is not None and not reported:
            state.setTimeoutDuration(int(silence_timeout_ms))
        yield pd.DataFrame(out, columns=_COLS)

    return fn


def streaming_gap_detect(
    events: DataFrame,
    k: float = 3.0,
    alpha: float = 0.3,
    silence_timeout_ms: int | None = None,
) -> DataFrame:
    """Gap/outage events from an unbounded (stream_id, timestamp, ...)
    stream.  ``k`` is the silence threshold in learned periods;
    ``silence_timeout_ms`` arms the open-outage channel (wall-clock —
    for live ingest event time tracks processing time; None disables
    timeouts and only the resume-time channel fires).

    Run timeout-armed queries with a ``processingTime`` trigger: a
    registered processing-time timeout always schedules future work, so
    ``availableNow``/``once`` triggers NEVER self-terminate with this
    operator (measured: the query idles in empty micro-batches until
    externally stopped).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if silence_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("stream_id").applyInPandasWithState(
        _make_gap_fn(float(k), float(alpha), silence_timeout_ms),
        outputStructType=GAP_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
