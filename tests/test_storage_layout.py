"""File-skipping evidence for the Z-order fact layout.

The linear (stream_id, timestamp) within-partition sort (storage.write_fact)
gives tight per-file stream_id stats but each file spans nearly the whole
day in time — a sub-day time predicate must open every file.  The Z-order
layout (storage.write_fact_zorder) interleaves stream and time bits so per-
file footer stats are tight on BOTH columns.  This test measures real
parquet footer min/max stats with pyarrow: no timing, fully deterministic.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from nntsc_spark.storage import write_fact, write_fact_zorder, zorder_key

DAY = 86400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)
N_STREAMS = 64
PER_STREAM = 200  # measurements per stream over the day


def _fact(spark):
    # one day of data: every stream measured across the full day
    rows = spark.range(N_STREAMS * PER_STREAM)
    return rows.select(
        (F.col("id") % N_STREAMS).alias("stream_id"),
        (F.lit(T0) + (F.col("id") / N_STREAMS).cast("long") * (DAY // PER_STREAM)
         ).alias("timestamp"),
        (F.col("id") % 997).cast("double").alias("value"),
    )


def _file_stats(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(f"{path}/date=*/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _files_matching(stats: list[tuple[int, int]], lo: int, hi: int) -> int:
    return sum(1 for (mn, mx) in stats if not (mx < lo or mn > hi))


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    df = _fact(spark)
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    # equal file counts so the comparison is fair
    write_fact(df.repartition(8, "stream_id"), linear, mode="overwrite")
    write_fact_zorder(df, zordered, mode="overwrite", num_ranges=8)

    # same rows either way
    n_lin = spark.read.parquet(linear).count()
    n_z = spark.read.parquet(zordered).count()
    assert n_lin == n_z == N_STREAMS * PER_STREAM

    # predicate 1: one stream -> both layouts must skip most files
    lin_stream = _file_stats(linear, "stream_id")
    z_stream = _file_stats(zordered, "stream_id")
    assert _files_matching(lin_stream, 7, 7) <= len(lin_stream) // 2
    assert _files_matching(z_stream, 7, 7) <= len(z_stream) // 2

    # predicate 2: a 90-minute slice of the day
    t_lo, t_hi = T0 + 6 * 3600, T0 + 6 * 3600 + 5400
    lin_time = _file_stats(linear, "timestamp")
    z_time = _file_stats(zordered, "timestamp")
    # linear layout: every file spans ~the whole day -> no time skipping
    assert _files_matching(lin_time, t_lo, t_hi) == len(lin_time)
    # z-order: the slice lives in at most half the files (measured: 3/8)
    assert _files_matching(z_time, t_lo, t_hi) <= len(z_time) // 2


def test_compact_fact_merges_closed_partitions(spark, tmp_path):
    """r6 verdict task: micro-batch appends leave commitfreq-scale files
    forever; compact_fact must merge closed date partitions row-
    identically, idempotently, and only past the min-age cutoff."""
    from nntsc_spark.storage import (
        BATCH_COL,
        compact_fact,
        epoch_day,
        read_fact,
    )

    path = str(tmp_path / "fact")
    df = _fact(spark)  # one full day starting at T0
    day2 = df.withColumn("timestamp", F.col("timestamp") + DAY)
    # 4 micro-batches per day -> 2 days x 4 ingest_batch dirs of files
    for b in range(4):
        part = df.where(F.col("stream_id") % 4 == b)
        write_fact(part, path, batch_id=b + 1)
        write_fact(
            day2.where(F.col("stream_id") % 4 == b), path, batch_id=10 + b
        )
    before = {
        tuple(r) for r in read_fact(spark, path).collect()
    }
    n_files_before = len(glob.glob(f"{path}/date=*/*/*.parquet"))
    assert n_files_before >= 8  # one file set per (day, batch)

    # day 2 is still open (now = start of day 3): only day 1 compacts
    now = T0 + 2 * DAY
    done = compact_fact(spark, path, target_bytes=1 << 30, now=now)
    assert done == [f"date={epoch_day(T0)}"]
    after = {tuple(r) for r in read_fact(spark, path).collect()}
    assert after == before  # row-identical
    # the closed day collapsed to the sentinel batch level, single file
    day1 = glob.glob(f"{path}/date=*/{BATCH_COL}=-1/*.parquet")
    assert len(day1) == 1
    # idempotent: a second run is a no-op
    assert compact_fact(spark, path, target_bytes=1 << 30, now=now) == []
    # now=None compacts everything remaining
    assert len(compact_fact(spark, path, target_bytes=1 << 30)) == 1
    assert {tuple(r) for r in read_fact(spark, path).collect()} == before


def test_fact_stats_reports_layout_health(spark, tmp_path):
    """fact_stats feeds the compaction scheduler: per-day file/batch
    counts drop after compact_fact and the byte total is preserved."""
    from nntsc_spark.storage import compact_fact, fact_stats

    path = str(tmp_path / "fact")
    for b in range(3):
        write_fact(_fact(spark).where(F.col("stream_id") % 3 == b), path,
                   batch_id=b + 1)
    before = fact_stats(path)
    assert len(before) == 1 and before[0]["n_batches"] == 3
    assert before[0]["n_files"] >= 3 and before[0]["bytes"] > 0
    compact_fact(spark, path, target_bytes=1 << 30)
    after = fact_stats(path)
    assert after[0]["n_files"] == 1 and after[0]["n_batches"] == 1
    assert fact_stats(str(tmp_path / "missing")) == []


def test_maintain_fact_retention_then_compaction(spark, tmp_path):
    """Retention runs before compaction: an expired day is dropped, never
    wastefully rewritten; surviving closed days compact."""
    from nntsc_spark.storage import maintain_fact, read_fact

    path = str(tmp_path / "fact")
    df = _fact(spark)
    for b in range(3):
        part = df.where(F.col("stream_id") % 3 == b)
        write_fact(part, path, batch_id=b + 1)  # day 1
        write_fact(part.withColumn("timestamp", F.col("timestamp") + DAY),
                   path, batch_id=10 + b)  # day 2
    # now = start of day 4; keep 2 days -> day 1 expires, day 2 is closed
    now = T0 + 3 * DAY
    res = maintain_fact(spark, path, keep_seconds=2 * DAY, now=now,
                        target_bytes=1 << 30)
    assert len(res["dropped"]) == 1 and len(res["compacted"]) == 1
    assert set(res["dropped"]).isdisjoint(res["compacted"])
    left = read_fact(spark, path)
    assert left.count() == N_STREAMS * PER_STREAM  # day 2 intact
    assert left.agg(F.min("timestamp")).first()[0] >= T0 + DAY


def test_compact_fact_crash_recovery(spark, tmp_path):
    """A crash at any swap point leaves every row readable exactly once
    after the next run's recovery sweep."""
    import os
    import shutil

    from nntsc_spark.storage import compact_fact, read_fact

    path = str(tmp_path / "fact")
    for b in range(3):
        write_fact(_fact(spark).where(F.col("stream_id") % 3 == b), path,
                   batch_id=b + 1)
    before = {tuple(r) for r in read_fact(spark, path).collect()}
    [part] = glob.glob(f"{path}/date=*")
    pname = os.path.basename(part)

    # crash state A: mid-swap — original renamed to trash, stage lost
    os.rename(part, f"{path}/.compact-trash-{pname}")
    compact_fact(spark, path, target_bytes=1 << 30)  # recovery + compact
    assert {tuple(r) for r in read_fact(spark, path).collect()} == before

    # crash state B: after swap, trash cleanup missed + a dead stage dir
    shutil.copytree(part, f"{path}/.compact-trash-{pname}")
    os.makedirs(f"{path}/.compact-stage-deadbeef/data")
    compact_fact(spark, path, target_bytes=1 << 30)
    assert not glob.glob(f"{path}/.compact-*")
    assert {tuple(r) for r in read_fact(spark, path).collect()} == before


def test_zorder_key_orders_locally(spark):
    # key is monotone in each dimension when the other is fixed
    df = spark.createDataFrame(
        [(1, T0), (1, T0 + 64), (2, T0), (2, T0 + 64)],
        "stream_id long, timestamp long",
    ).withColumn(
        "z", zorder_key(stream_range=(0, 3), ts_range=(T0, T0 + 64))
    )
    rows = {(r.stream_id, r.timestamp): r.z for r in df.collect()}
    assert rows[(1, T0)] < rows[(1, T0 + 64)]
    assert rows[(1, T0)] < rows[(2, T0)]
    assert all(z >= 0 for z in rows.values())
