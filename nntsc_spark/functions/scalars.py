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


def rle_runs(asvals: Column) -> Column:
    """Run-length encode consecutive equal values -> array<struct<asn,cnt>>.

    A pure fold (F.aggregate): extend the last run when the value repeats,
    else append a new run.  Matches amp_traceroute.py:596-640.
    """

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(acc, -1)
        extended = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(x.alias("asn"), (last["cnt"] + 1).alias("cnt"))),
        )
        appended = F.concat(
            acc,
            F.array(
                F.struct(x.alias("asn"), F.lit(1).cast("bigint").alias("cnt"))
            ),
        )
        return F.when((F.size(acc) > 0) & (last["asn"] == x), extended).otherwise(
            appended
        )

    return F.aggregate(asvals, F.array().cast(RUNS_TYPE), step)


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
        .withColumn("_runs", rle_runs(F.col("_asvals")))
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
        .drop("_asvals", "_runs")
    )
