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


# ---------------------------------------------------------------------------
# Mergeable percentile rollups (fixed-range histograms)
# ---------------------------------------------------------------------------
#
# The algebraic rules above re-merge sum/count/avg/max/min/stddev exactly,
# but PERCENTILES have no exact merge — which is why the reference's wide-
# range smoke routes to a raw-data percentile fan (A11/T11) instead of its
# rollups.  A fixed-range histogram closes that gap approximately: per-bin
# count vectors merge EXACTLY (element-wise addition is associative and
# commutative), and any percentile read off the merged histogram is correct
# to within one bucket's width — a provable, configuration-chosen error
# bound, unlike sketch families whose error depends on data order.  At
# 100 TB this turns "p95 latency by label for last month" from a raw scan
# into a rollup-table scan 1/binsize the size, with the same merge-anywhere
# property the other rollup columns have (hourly -> daily -> monthly by
# addition at every level).

def bucket_expr(value_col: str, lo: float, hi: float, nbins: int) -> F.Column:
    """Fixed-range bucket index: floor((v - lo) / width) clamped into
    [0, nbins-1] — out-of-range values land in the edge buckets (their
    percentile contribution stays order-correct; only their position
    saturates at the range edge, the documented fixed-range trade).

    The VALUE is clamped into [lo, hi] BEFORE the divide/floor/cast, so
    an arbitrarily large finite value (or +/-Infinity) can never push
    the intermediate past the int range — clamping only after the cast
    would ANSI-fail (or, with ANSI off, wrap into the WRONG edge bucket)
    once ``(v - lo) / width`` exceeds 2^31.  NaN maps to NULL (no
    ordered position exists for it) and is dropped by the rollup build.
    """
    width = (float(hi) - float(lo)) / int(nbins)
    v = F.col(value_col).cast("double")
    clamped = F.least(F.greatest(v, F.lit(float(lo))), F.lit(float(hi)))
    idx = F.least(
        F.floor((clamped - float(lo)) / width), F.lit(int(nbins) - 1)
    ).cast("int")
    return F.when(F.isnan(v), F.lit(None).cast("int")).otherwise(idx)


def histogram_rollup(
    fact: DataFrame,
    binsize: int,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 250,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-(stream, bin) count-histogram rollup: (stream_id, binstart,
    hist array<long>[nbins], n long).

    Two-level build: the corpus-scale shuffle is the (stream, bin,
    bucket) count — map-side combinable, output bounded by rollup rows x
    nbins — and the array assembly re-aggregates THAT table (never the
    corpus) into dense vectors via a map lookup projection.

    The assembly stage is fed by an explicit ``repartition(stream_id)``
    rather than the groupBy's own (stream, binstart) exchange: hash
    partitioning on a SUBSET of the grouping keys satisfies the
    aggregation's clustering requirement, so the assembly runs with no
    exchange of its own AND every downstream per-stream consumer (the
    element-wise rollup merge, per-stream percentile reads) inherits the
    stream-keyed partitioning — one exchange where the previous shape
    paid two, and the eliminated one was the fat one (2 KB hist arrays
    per row vs the scalar bucket counts this one carries; optimization
    guide §2.4: two operations keyed the same way share one exchange).
    Skew bound: a stream's rows within one partition are bins x nbins —
    the rollup's own output contract, not corpus-sized.
    """
    b = bucket_expr(value_col, lo, hi, nbins)
    counts = (
        fact.where(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .groupBy(
            "stream_id",
            (F.col(ts_col) - (F.col(ts_col) % F.lit(int(binsize)))).alias(
                BINSTART_COL
            ),
            b.alias("_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    dense = F.expr(
        f"transform(sequence(0, {int(nbins) - 1}), "
        "i -> coalesce(element_at(_m, i), 0L))"
    )
    return (
        counts.repartition("stream_id")
        .groupBy("stream_id", BINSTART_COL)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_bucket", "_cnt"))
            ).alias("_m")
        )
        .select(
            "stream_id",
            BINSTART_COL,
            dense.alias("hist"),
            F.expr(
                "aggregate(map_values(_m), 0L, (a, x) -> a + x)"
            ).alias("n"),
        )
    )


def merged_histogram_agg(hist_col: str, nbins: int) -> F.Column:
    """Aggregation expression merging histogram vectors element-wise —
    the percentile counterpart of the algebraic merge rules above.
    Per output group it folds #input-rows arrays (bins merged, e.g. 24
    hourly rows -> 1 daily row), each fold a zip_with addition."""
    return F.expr(
        f"aggregate(collect_list({hist_col}), "
        f"array_repeat(0L, {int(nbins)}), "
        "(acc, h) -> zip_with(acc, h, (a, b) -> a + b))"
    )


def merge_histograms(
    df: DataFrame,
    group_cols: list[str],
    hist_col: str,
    nbins: int,
) -> DataFrame:
    """Element-wise histogram merge as relational codegen: posexplode the
    vectors, drop the zero entries, sum per (group, bucket), rebuild the
    dense array — bit-identical long sums to :func:`merged_histogram_agg`
    (addition of the dropped zeros changes nothing), pinned by
    test_merge_histograms_matches_agg_expression.

    Exists because the fold form (``aggregate`` over ``collect_list`` with
    a ``zip_with`` per input row) is CodegenFallback: every per-element
    lambda step runs interpreted, and it allocates one fresh nbins-array
    per input row per group — measured 2.6 s of the registered
    rollup_percentile's 4.0 s at sf0.1 (~10.5M interpreted steps), where
    this shape runs the same merge in ~0.2 s (guide §4.1: built-ins with
    codegen over higher-order lambdas).  Sparsity pays twice: rollup
    vectors here are ~0.4% non-zero, and only non-zero cells survive the
    explode.  No new exchange: hash partitioning on ``group_cols`` (the
    upstream ``repartition(stream_id)``) satisfies both the per-bucket
    and the assembly grouping, so the whole merge is partition-local.

    Contract: a group whose EVERY input entry is zero would produce no
    output row (the fold form would emit its zero vector).  Impossible
    for :func:`histogram_rollup` output — a (stream, bin) row exists only
    when at least one event counted into it — so rollup merges are exact;
    do not feed hand-built all-zero vectors through this.
    """
    cells = (
        df.select(
            *group_cols, F.posexplode(F.col(hist_col)).alias("_i", "_v")
        )
        .where(F.col("_v") != 0)
        .groupBy(*group_cols, "_i")
        .agg(F.sum("_v").alias("_v"))
    )
    dense = F.expr(
        f"transform(sequence(0, {int(nbins) - 1}), "
        "i -> coalesce(element_at(_m, i), 0L))"
    )
    return (
        cells.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_i", "_v"))
            ).alias("_m")
        )
        .select(*group_cols, dense.alias(hist_col))
    )


def histogram_percentile(
    hist_col: str, lo: float, hi: float, p: float
) -> F.Column:
    """Percentile estimate from a merged histogram, pure expression:
    walk to the bucket holding the ceil(p * n)-th sample and
    interpolate linearly inside it.  Error is bounded by ONE bucket
    width ((hi - lo) / nbins) by construction; NULL on an empty
    histogram.  Every step is integer/IEEE arithmetic on identical
    inputs, so the estimate is engine-deterministic (oracle-comparable),
    unlike order-sensitive sketches.
    """
    width = f"(({float(hi)}d - {float(lo)}d) / size({hist_col}))"
    total = f"aggregate({hist_col}, 0L, (a, x) -> a + x)"
    target = f"greatest(1L, cast(ceil({float(p)}d * {total}) as bigint))"
    # fold to the first bucket where the running count reaches target:
    # acc = (cum, idx, before); idx >= 0 marks "found"
    found = (
        f"aggregate(zip_with({hist_col}, "
        f"sequence(0, size({hist_col}) - 1), "
        "(c, i) -> named_struct('c', c, 'i', i)), "
        "named_struct('cum', 0L, 'idx', -1, 'before', 0L), "
        "(acc, x) -> IF(acc.idx >= 0, acc, "
        f"IF(acc.cum + x.c >= {target}, "
        "named_struct('cum', acc.cum + x.c, 'idx', x.i, "
        "'before', acc.cum), "
        "named_struct('cum', acc.cum + x.c, 'idx', -1, 'before', 0L))))"
    )
    return F.expr(
        f"CASE WHEN {total} > 0 THEN "
        f"{float(lo)}d + {width} * (({found}).idx + "
        f"cast({target} - ({found}).before as double) / "
        f"element_at({hist_col}, ({found}).idx + 1)) END"
    )


def histogram_percentiles(
    df: DataFrame,
    hist_col: str,
    lo: float,
    hi: float,
    ps: dict[str, float],
    total_col: str | None = None,
) -> DataFrame:
    """Staged multi-percentile read: adds one column per ``ps`` entry
    (name -> p), plus optionally the histogram total as ``total_col``.

    Same estimate, same float chain as :func:`histogram_percentile` —
    but staged across projections instead of one self-contained
    expression.  The single-expression form syntactically inlines its
    O(nbins) walk three times (idx twice, before once) and — worse —
    re-derives the O(nbins) TOTAL fold inside the walk's per-step
    predicate, O(nbins^2) interpreted work per percentile per row;
    higher-order functions never enter codegen, so no subexpression
    elimination rescues it.  Here total, target, and the walk each
    become their OWN projected column (CollapseProject keeps non-cheap
    expressions un-inlined), so every fold evaluates exactly once:
    O(nbins) per percentile per row.  Use this on rollup-scale outputs;
    the expression form stays for one-off single-column reads.
    """
    tcol = "_hp_total"
    width = f"(({float(hi)}d - {float(lo)}d) / size({hist_col}))"
    df = df.withColumn(
        tcol, F.expr(f"aggregate({hist_col}, 0L, (a, x) -> a + x)")
    )
    temps = [tcol]
    for name, p in ps.items():
        tg, fd = f"_hp_tg_{name}", f"_hp_f_{name}"
        temps += [tg, fd]
        df = df.withColumn(
            tg,
            F.expr(
                f"greatest(1L, cast(ceil({float(p)}d * {tcol}) as bigint))"
            ),
        )
        df = df.withColumn(
            fd,
            F.expr(
                f"aggregate(zip_with({hist_col}, "
                f"sequence(0, size({hist_col}) - 1), "
                "(c, i) -> named_struct('c', c, 'i', i)), "
                "named_struct('cum', 0L, 'idx', -1, 'before', 0L), "
                "(acc, x) -> IF(acc.idx >= 0, acc, "
                f"IF(acc.cum + x.c >= {tg}, "
                "named_struct('cum', acc.cum + x.c, 'idx', x.i, "
                "'before', acc.cum), "
                "named_struct('cum', acc.cum + x.c, 'idx', -1, "
                "'before', 0L))))"
            ),
        )
        df = df.withColumn(
            name,
            F.expr(
                f"CASE WHEN {tcol} > 0 THEN "
                f"{float(lo)}d + {width} * ({fd}.idx + "
                f"cast({tg} - {fd}.before as double) / "
                f"element_at({hist_col}, {fd}.idx + 1)) END"
            ),
        )
    if total_col is not None:
        df = df.withColumn(total_col, F.col(tcol))
    return df.drop(*temps)
