"""SparkSession factory with scale-oriented defaults.

The engine targets 1000-executor clusters over ~100 TB of fact data; the
settings here are the ones that matter at that scale and are harmless on
``local[*]``:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) — the
  reference hand-rolled per-stream partition pruning instead
  (reference: libnntsc/dbselect.py:674-723); we let Catalyst + AQE do it.
- small shuffle partition count locally; on a real cluster this should be
  ~2-3x total cores or left to AQE's coalescing.
- Arrow enabled for the (rare) pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _env_int(name: str) -> int:
    """Integer env override, or 0 when unset/blank/garbage — a malformed
    value must not make every get_spark() raise a bare ValueError."""
    raw = (os.environ.get(name) or "").strip()
    try:
        return int(raw) if raw else 0
    except ValueError:
        import warnings

        warnings.warn(f"ignoring non-integer {name}={raw!r}")
        return 0


def get_spark(
    app_name: str = "sparktsc",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start every shuffle WIDE and let AQE coalesce down: with only
        # shuffle.partitions=cores, a 100x data step makes each shuffle
        # partition 100x bigger and the heavy dedup/contamination
        # aggregations spill (measured 13.7x step for 10x data at x100;
        # 2.8x with enough partitions — tools/scaling_probe.py).  AQE
        # merges small post-shuffle partitions at runtime, so wide
        # defaults cost small queries nothing.  On a real cluster raise
        # this to ~2-3x total cores or beyond; it is an upper bound, not
        # a target.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(_env_int("SPARK_GRAFT_INITIAL_PARTITIONS") or 16 * int(cpus)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOT enabled: spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
        # (AQE's runtime SMJ->SHJ conversion).  Measured on the planted
        # x1000 near-dup cell — the workload whose re-attach joins looked
        # like the textbook case (wide vector probe rows, scalar build
        # side): min-of-2 warm 246 s with SMJ vs 395 s with the
        # conversion at 128m.  The sort spills SEQUENTIALLY at disk
        # bandwidth while the hash build+probe pays random access, so on
        # spill-bound single-box shapes SMJ wins; leave the default off
        # and re-evaluate on a cluster where build maps live in memory.
        # Without this, AQE is OFF inside every .persist()ed plan (cached
        # plans pin their output partitioning by default), so the wide
        # initial above would freeze 512 tiny partitions into small-scale
        # caches (measured ~2x slowdown on the cached dedup pipeline at
        # sf0.1) AND the pipeline caches could never coalesce.  Cache
        # reuse still works; only the cached plan's partitioning becomes
        # AQE-managed like everything else.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # shuffle/spill/broadcast block codec.  Default lz4, MEASURED
        # (SCALING.md r15, tools/planted_probe.py): zstd is ~14% faster
        # on the planted x100 cell but a wash (500.0 vs 496.5 s) at the
        # spill-bound x1000 decade that motivated the experiment — the
        # job is CPU-saturated while spilling, so zstd's compression CPU
        # eats what its ratio saves at disk speed.  Counters bit-
        # identical under both.  lz4 stays for artifact comparability;
        # re-measure on a cluster where network bytes also pay.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
