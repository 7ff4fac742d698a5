"""Scalar/array helper expressions, including the AS-path run-length encoding.

The reference's `_extract_paths` (libnntsc/parsers/amp_traceroute.py:588-654)
walks each traceroute result's hop list in Python, building:

- ``path``      : hop IP addresses (NULL per unresponsive hop)
- ``hop_rtt``   : hop RTTs (NULL where missing)
- ``aspath``    : run-length-encoded AS path, elements ``"<count>.<asn>"``
- ``aspathlen`` : number of hops with AS information
- ``responses`` : aspathlen minus the trailing run when it is the null-AS
  marker (-1)
- ``uniqueas``  : distinct non-negative AS numbers

Spark-first: all of it is higher-order array functions (filter/transform/
aggregate) — fully JVM-side, no Python in the per-row path.  Hops arrive as
``array<struct<address string, rtt long, asn long>>`` (asn NULL when the hop
carried no AS info — such hops are transparent to the RLE, matching the
reference's ``continue``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RUNS_TYPE = "array<struct<asn:bigint,cnt:bigint>>"


def as_values(hops: Column) -> Column:
    """AS numbers of hops that carry AS info (order preserved)."""
    return F.transform(
        F.filter(hops, lambda h: h["asn"].isNotNull()), lambda h: h["asn"]
    )


def run_starts(asvals: Column) -> Column:
    """1-based start positions of each run of consecutive equal values.

    O(n) single pass: position p starts a run when p == 1 or the value
    differs from its predecessor.  ``asvals`` must be a plain materialized
    column reference (not a compound expression) so each ``element_at`` is
    an O(1) array index — `extract_paths_columns` stages the intermediates
    in separate projections for exactly this reason.
    """
    return F.filter(
        F.transform(asvals, lambda _, i: i + 1),
        lambda p: (p == 1)
        | (F.element_at(asvals, p) != F.element_at(asvals, p - 1)),
    )


def runs_from_starts(asvals: Column, starts: Column) -> Column:
    """(values, run-start positions) -> array<struct<asn,cnt>>, O(runs).

    Run j spans [starts[j], starts[j+1]) — the last run ends at n+1.
    """
    n = F.size(asvals)
    return F.transform(
        starts,
        lambda s, j: F.struct(
            F.element_at(asvals, s).alias("asn"),
            (F.coalesce(F.try_element_at(starts, j + 2), n + 1) - s)
            .cast("bigint")
            .alias("cnt"),
        ),
    )


def rle_runs(asvals: Column) -> Column:
    """Run-length encode consecutive equal values -> array<struct<asn,cnt>>.

    Matches amp_traceroute.py:596-640.  Boundary-index form (find run
    starts, then diff consecutive starts) instead of a fold — the fold's
    per-step slice+concat copies made it O(n²) in the interpreted HOF
    evaluator.  Stays shuffle-free (pure array expressions, no explode/
    window), which is what survives a 100 TB fact table.
    """
    return runs_from_starts(asvals, run_starts(asvals))


def aspath_strings(runs: Column) -> Column:
    """runs -> ["<count>.<asn>", ...] (amp_traceroute.py:616)."""
    return F.transform(
        runs,
        lambda r: F.concat(
            r["cnt"].cast("string"), F.lit("."), r["asn"].cast("string")
        ),
    )


def extract_paths_columns(df, hops_col: str = "hops"):
    """Add path/hop_rtt/aspath/aspath_length/uniqueas/responses columns."""
    hops = F.col(hops_col)
    asvals = as_values(hops)
    df = (
        df.withColumn("path", F.transform(hops, lambda h: h["address"]))
        .withColumn("hop_rtt", F.transform(hops, lambda h: h["rtt"]))
        .withColumn("_asvals", asvals)
        .withColumn("_starts", run_starts(F.col("_asvals")))
        .withColumn(
            "_runs", runs_from_starts(F.col("_asvals"), F.col("_starts"))
        )
    )
    last_run = F.element_at(F.col("_runs"), -1)
    has_as = F.size(F.col("_runs")) > 0
    return (
        df.withColumn("aspath", F.when(has_as, aspath_strings(F.col("_runs"))))
        .withColumn("aspath_length", F.when(has_as, F.size(F.col("_asvals")).cast("long")))
        .withColumn(
            "responses",
            F.when(
                has_as,
                (
                    F.size(F.col("_asvals"))
                    - F.when(last_run["asn"] == -1, last_run["cnt"]).otherwise(0)
                ).cast("long"),
            ),
        )
        .withColumn(
            "uniqueas",
            F.when(
                has_as,
                F.size(
                    F.array_distinct(F.filter(F.col("_asvals"), lambda x: x >= 0))
                ).cast("long"),
            ),
        )
        .drop("_asvals", "_starts", "_runs")
    )
