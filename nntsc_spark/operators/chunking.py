"""History chunking policy — SURVEY.md §2.6 O5.

The reference pages history queries in <=7-day chunks, aligning chunk ends
to ``binsize - 1`` so no bin is split across chunks (libnntsc/
exporter.py:102, 197-235; MAX_HISTORY_QUERY = 7 days).  Spark doesn't need
chunking to execute (one job covers any range), but the policy remains part
of the export protocol (client-visible batching), so the alignment math is
kept and equivalence (chunked union == direct aggregation) is oracle-tested.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

MAX_HISTORY_QUERY = 7 * 24 * 60 * 60  # seconds (exporter.py:102)


def chunk_ranges(
    start: int, stop: int, binsize: int, max_chunk: int = MAX_HISTORY_QUERY
) -> list[tuple[int, int]]:
    """Split [start, stop] into <=max_chunk inclusive ranges whose
    boundaries never split a bin: each chunk end is aligned to
    ``binsize-1`` past a bin boundary (exporter.py:205-214).

    Binsizes >= the chunk size bypass chunking entirely (exporter.py:200).
    """
    if binsize and binsize >= max_chunk:
        return [(start, stop)]
    out = []
    cur = start
    while cur <= stop:
        end = cur + max_chunk - 1
        if binsize:
            # align to the last whole bin boundary - 1
            end = end - ((end + 1) % binsize)
        if end >= stop:
            end = stop
        out.append((cur, end))
        cur = end + 1
    return out


def chunked_union(
    query_fn, start: int, stop: int, binsize: int
) -> DataFrame:
    """Run ``query_fn(chunk_start, chunk_end)`` per chunk and union —
    result must equal the unchunked query when chunk ends are bin-aligned
    (the equivalence the reference relies on implicitly)."""
    parts = [query_fn(s, e) for s, e in chunk_ranges(start, stop, binsize)]
    if not parts:
        # inverted window (start > stop): chunk_ranges yields nothing and
        # a bare reduce would raise on the empty iterable — run the query
        # on the inverted range itself: schema intact, zero rows
        return query_fn(start, stop)
    return reduce(lambda a, b: a.unionByName(b), parts)
