"""Streaming rollup maintenance — the Influx continuous queries (T6).

Reference: CQs recompute 1-minute bins every minute over a trailing 15-minute
window and 1-hour bins hourly over a trailing 3-hour window (RESAMPLE EVERY
1m FOR 15m / EVERY 1h FOR 3h, libnntsc/influx.py:183-195) — late data within
the FOR horizon is absorbed by recomputation.

Spark-first: ``foreachBatch`` on the ingest stream recomputes exactly the
bins the micro-batch touched (not a fixed trailing window — strictly more
precise) and overwrites those bins in the rollup table via dynamic partition
overwrite.  Because the rollup rows carry counts (magiccount), recomputing a
bin from raw rows is idempotent, giving the CQ's late-data semantics with a
watermark equal to whatever retention the raw table has.

The aggregation expressions are shared with the batch builder
(operators.rollup.build_rollup), so batch backfill and streaming maintenance
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import BINSTART_COL
from ..operators.rollup import build_rollup
from ..storage import BATCH_COL, DATE_COL, read_dimension, time_slice, write_dimension


class RollupMaintainer:
    """Maintains one rollup granularity for one fact table."""

    #: widest touched-bin set refreshed via an exact IN-list; a batch
    #: touching more distinct bins (a months-spanning backfill) falls back
    #: to refreshing the full [min_bin, max_bin] range — recomputing some
    #: untouched bins (idempotent, just extra work) instead of building a
    #: plan-exploding million-entry IN predicate or collecting an
    #: unbounded bin list onto the driver.
    max_inlist_bins = 1024

    def __init__(
        self,
        spark: SparkSession,
        fact_path: str,
        rollup_path: str,
        binsize: int,
        value_cols: list[str],
    ) -> None:
        self.spark = spark
        self.fact_path = fact_path
        self.rollup_path = rollup_path
        self.binsize = binsize
        self.value_cols = list(value_cols)

    def touched_bins(self, batch: DataFrame) -> DataFrame:
        return batch.select(
            (F.col("timestamp") - F.col("timestamp") % self.binsize).alias(
                BINSTART_COL
            )
        ).distinct()

    def refresh_for_batch(self, batch: DataFrame) -> None:
        """Recompute only the (stream-agnostic) bins the batch touched.

        Reads raw rows for those bins from the fact table (bin boundaries
        map 1:1 onto timestamp ranges so the date-partitioned scan prunes),
        rebuilds the rollup rows, and swaps them in.

        The touched-bin stats (count, min, max) come back as ONE aggregated
        row; the exact bin list is collected only when it fits
        ``max_inlist_bins``, so the driver never holds an unbounded list
        and the refresh predicate never exceeds the cap (wide batches use
        the [min_bin, max_bin] range instead).
        """
        # persist: the stats aggregate and the capped bin-list collect are
        # two actions over the same distinct — uncached, each would rescan
        # and re-deduplicate the whole micro-batch (r5 review finding)
        tb = self.touched_bins(batch).persist()
        try:
            stats = tb.agg(
                F.count(F.lit(1)).alias("n"),
                F.min(BINSTART_COL).alias("lo"),
                F.max(BINSTART_COL).alias("hi"),
            ).collect()[0]
            if not stats["n"]:
                return
            lo_bin, hi_bin = stats["lo"], stats["hi"]
            bins = (
                [r[0] for r in tb.collect()]
                if stats["n"] <= self.max_inlist_bins
                else None
            )
        finally:
            tb.unpersist()
        lo, hi = lo_bin, hi_bin + self.binsize - 1
        if bins is not None:
            # range guard first (partition/zone pruning), exact isin second
            refresh_pred = (
                (F.col(BINSTART_COL) >= lo_bin)
                & (F.col(BINSTART_COL) <= hi_bin)
                & F.col(BINSTART_COL).isin(bins)
            )
        else:
            refresh_pred = (F.col(BINSTART_COL) >= lo_bin) & (
                F.col(BINSTART_COL) <= hi_bin
            )
        # time_slice adds date-partition bounds alongside the timestamp
        # predicate: per-micro-batch refreshes touch a handful of days, and
        # without the explicit date filter every refresh would list/footer-
        # read EVERY partition of the fact table (r5 review finding)
        fact = self.spark.read.parquet(self.fact_path)
        slice_df = time_slice(fact, lo, hi).drop(DATE_COL, BATCH_COL)
        fresh = build_rollup(slice_df, self.binsize, self.value_cols).where(
            refresh_pred
        )
        old_all = read_dimension(self.spark, self.rollup_path)
        if old_all is not None:
            merged = old_all.where(~refresh_pred).unionByName(fresh)
        else:
            merged = fresh
        # snapshot-commit (storage.write_dimension): the new rollup is
        # staged and atomically renamed in, so a crash mid-refresh keeps
        # the previous rollup readable (T4)
        write_dimension(merged, self.rollup_path)

    def read(self) -> DataFrame:
        out = read_dimension(self.spark, self.rollup_path)
        if out is None:
            raise FileNotFoundError(self.rollup_path)
        return out
