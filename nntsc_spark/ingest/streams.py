"""Stream identity: insert-or-find with a global sequential stream_id.

The reference draws every stream_id from one shared Postgres sequence with
insert-or-find-on-duplicate semantics (reference: libnntsc/database.py:568,
731-787, 884-888).  A distributed engine can't use a database sequence;
SURVEY.md §7.3 "Hard #2" plans a single-writer catalog MERGE per micro-batch,
which is what this implements:

- new stream keys are discovered with a LEFT ANTI join against the existing
  dimension table (small — streams are rare relative to data rows);
- ids are assigned ``max_existing_id + dense rank over the unique columns``,
  making assignment deterministic for a given batch;
- the rank window is single-partition, which is fine because it only ever
  sees the (tiny) set of NEW streams in one micro-batch, never fact rows.

At 100 TB scale the dimension table stays in the thousands-to-millions range
and this remains a broadcast-sized operation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: Hard ceiling on NEW identities assigned in one batch.  Sequential id
#: assignment is single-partition by design (same bounded-growth argument as
#: the reference's shared Postgres sequence); the cap turns an accidental
#: fact-table-sized input into a loud error instead of a silent one-reducer
#: sort of millions of rows.
MAX_NEW_PER_BATCH = 1_000_000


def upsert_dimension(
    existing: DataFrame | None,
    observed: DataFrame,
    unique_cols: Sequence[str],
    id_col: str = "stream_id",
    max_new: int = MAX_NEW_PER_BATCH,
) -> DataFrame:
    """Generic insert-or-find for a dimension table (streams, traceroute
    path/aspath dictionaries — the reference's CTE upsert at
    libnntsc/amp_traceroute.py:279-340 maps here too).

    ``observed`` carries one row per observed identity tuple (extra columns
    beyond ``unique_cols`` are kept as metadata, first-observed wins).
    Returns the updated dimension.

    The per-batch cap is enforced INSIDE the plan (``raise_error`` folded
    into the id expression), not by an eager ``count()``: a driver-side
    count would cost an extra job per upsert and force a persist whose
    unknown stats rob the downstream attach join of its broadcast.  The
    guard evaluates on the same single reducer that assigns ids, costs
    nothing when the invariant holds, and fails the job loudly when it
    doesn't — see :data:`MAX_NEW_PER_BATCH`.
    """
    first_seen = observed.dropDuplicates(list(unique_cols))
    if existing is None:
        new = first_seen
        base = F.lit(0)
    else:
        new = first_seen.join(
            existing.select(*unique_cols), list(unique_cols), "left_anti"
        )
        base = F.lit(existing.agg(F.max(id_col)).collect()[0][0] or 0)
    # Global (unpartitioned) window = one reducer: safe ONLY while the
    # new-identity set stays dimension-sized, which the guard enforces.
    w = Window.orderBy(*[F.col(c) for c in unique_cols])
    rn = F.row_number().over(w)
    guard = F.when(
        rn > int(max_new),
        F.raise_error(
            F.lit(
                f"upsert_dimension: more than max_new={max_new} new "
                "identities in one batch; sequential id assignment is "
                "deliberately single-partition (bounded new-identity "
                "invariant) — split the batch or raise max_new"
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    assigned = new.withColumn(id_col, (base + rn + guard).cast("long"))
    assigned = assigned.select(
        id_col, *[c for c in assigned.columns if c != id_col]
    )
    if existing is None:
        return assigned
    return existing.unionByName(assigned, allowMissingColumns=True)


def upsert_streams(
    existing: DataFrame | None,
    observed_props: DataFrame,
    unique_cols: Sequence[str],
) -> DataFrame:
    """Streams-table specialization of :func:`upsert_dimension`."""
    return upsert_dimension(existing, observed_props, unique_cols, "stream_id")


def attach_stream_ids(
    data: DataFrame, streams: DataFrame, unique_cols: Sequence[str]
) -> DataFrame:
    """Broadcast-join fact rows to their stream_id via the unique columns."""
    dim = F.broadcast(streams.select("stream_id", *unique_cols))
    return data.join(dim, list(unique_cols), "inner")
