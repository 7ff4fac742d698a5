"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized to the driver via Arrow (`toPandas`) so the
measured time includes the whole plan AND full result delivery, not just the
scan.  Arrow batches are the engine's sanctioned transfer path everywhere
else (pandas UDFs, mapInPandas); row-at-a-time ``collect()`` was measured
2-3x slower than the queries themselves on wide ~100k-row results, i.e. it
benchmarks py4j deserialization, not the engine.  A warmup absorbs one-time session startup —
JVM/codegen (flagship query) and the Python/Arrow worker pool (a 1-row
mapInPandas no-op) — so per-query numbers reflect steady-state throughput;
in production both are long-lived.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
MINIMUM: the first execution pays one-time per-query analysis + codegen
(amortized to zero on a long-lived cluster), and min-of-N also suppresses
noisy-neighbor variance on shared hardware (observed single-run jitter here
is up to 4x on identical plans).  A global deadline (default 540 s) drops to
single runs if the machine is slow, so the bench always completes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nntsc_spark.plans import queries as _q
from nntsc_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("sparktsc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = _q.queries()
    # warmup: JVM + codegen + parquet footer caches
    registry["agg_bin"](spark, sf_dir).collect()
    # warmup: Python/Arrow worker pool (paid once per executor in prod)
    spark.range(1).mapInPandas(lambda it: it, "id long").collect()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_DEADLINE", "540"))
    t_start = time.time()
    deadline = t_start + budget
    # soft deadline: past 60% of the budget, drop to min-of-2 instead of
    # jumping straight to single COLD runs — a hard cut mid-run used to
    # leave every later query single-rep, and their first-execution
    # plan-compile noise (~1.4x) then read as phantom round-over-round
    # regressions on exactly the tail of the registry
    soft = t_start + 0.6 * budget

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in registry.items():
        try:
            # fn() runs INSIDE the timer on every rep: for most queries it
            # is pure plan construction, but the iterative operators
            # (dedup_clusters' label propagation, contamination's checkpointed
            # shingling) do real work during construction — excluding it
            # would under-report exactly the most expensive queries.
            best = None
            for rep in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).toPandas()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                now = time.time()
                if now > deadline:  # out of budget: keep what we have
                    break
                if now > soft and rep >= 1:  # soft regime: min-of-2
                    break
            timings[name] = round(best, 3)
        except Exception as exc:  # keep benching: one bad query != no bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # the driver stores a truncated tail of the printed line, losing the
    # head rows and blocking round-over-round comparison of exactly the
    # first-registered queries (r10 verdict task #8) — so ALSO persist
    # the complete artifact next to this script, CORRECTNESS_FULL-style
    try:
        full = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        )
        with open(full, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # a read-only checkout must not fail the bench
        print(f"bench: BENCH_FULL.json not written: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
