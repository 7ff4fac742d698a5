"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized to the driver via Arrow (`toPandas`) so the
measured time includes the whole plan AND full result delivery, not just the
scan.  Arrow batches are the engine's sanctioned transfer path everywhere
else (pandas UDFs, mapInPandas); row-at-a-time ``collect()`` was measured
2-3x slower than the queries themselves on wide ~100k-row results, i.e. it
benchmarks py4j deserialization, not the engine.  A warmup absorbs one-time
session startup — JVM/codegen (flagship query) and the Python/Arrow worker
pool (a 1-row mapInPandas no-op) — so per-query numbers reflect steady-state
throughput; in production both are long-lived.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
MINIMUM: the first execution pays one-time per-query analysis + codegen
(amortized to zero on a long-lived cluster), and min-of-N also suppresses
noisy-neighbor variance on shared hardware (observed single-run jitter here
is up to 4x on identical plans).  A global deadline (default 540 s) drops to
single runs if the machine is slow, so the bench always completes.

Two tiers:

- **full** (default): the whole registry, deadline-tiered reps, writes
  BENCH_FULL.json.  Before it starts it spawns ``--headline`` in a FRESH
  subprocess (skip with SPARK_GRAFT_SKIP_HEADLINE=1).
- **--headline**: the fixed HEADLINE_QUERIES list only, full min-of-3 with
  NO deadline tiering, writes BENCH_HEADLINE.json.  This is the
  round-over-round comparison tier: the full registry's numbers drift with
  registry growth (133 queries sharing one JVM + scratch pool — three
  rounds of unattributable 1.1-1.6x tail drift on bit-identical pinned
  plans, r10-r12), so deltas are only attributable when the list, the rep
  policy, and the JVM state are all pinned.  Both artifacts carry
  provenance fields (sf, registry size, rep policy, deadline, driver mem)
  so a reader can tell two runs were comparable before comparing them.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nntsc_spark.plans import queries as _q
from nntsc_spark.session import get_spark

#: the fixed round-over-round comparison list: the plan-audit heavyweights
#: (everything the r12 verdict's expensive-five covered), the ten rows that
#: drifted unattributably r11->r12, and a spread of core operator families
#: (select/agg/window/ingest/dedup/ANN/text).  FIXED BY CONTRACT — append
#: only; reordering or removing entries breaks round-over-round comparison.
HEADLINE_QUERIES = [
    "select_raw",
    "agg_bin",
    "smoke",
    "ingest_sip",
    "holt_winters",
    "rollup_percentile",
    "ngram_diversity",
    "stream_corr",
    "availability_bounded",
    "gap_report_summary_bounded",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "contamination",
    "contamination_suite",
    "vocab_fuzzy",
    "fuzzy_linkage",
    "semantic_dedup",
    "embedding_neardup",
    "embedding_clusters",
    "embedding_curation",
    "training_corpus_curated",
    "bm25_search",
    "cms_topk",
]


def _provenance(sf: str, tier: str, n_queries: int, registry_size: int,
                reps: int, budget: float) -> dict:
    """Stamp enough run context that two artifacts can be judged
    comparable before their numbers are compared (the r10-r12 drift
    lesson: numbers without provenance invited apples-to-oranges reads)."""
    prov = {
        "tier": tier,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": n_queries,
        "registry_size": registry_size,
        "reps": reps,
        "deadline_sec": budget,
        "deadline_tiering": tier == "full",
        "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "8g"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    try:
        prov["git_rev"] = (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or None
        )
    except Exception:
        prov["git_rev"] = None
    return prov


def _may_write_full(sf: str, force: bool) -> bool:
    """BENCH_FULL.json is the committed sf0.1 round artifact; a run at any
    other SF (e.g. an sf0.01 iteration loop) must not silently replace it.
    ``--force`` overrides for deliberate re-baselining."""
    return force or sf == "0.1"


def _write_artifact(filename: str, out: dict) -> None:
    try:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), filename
        )
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # a read-only checkout must not fail the bench
        print(f"bench: {filename} not written: {exc}", file=sys.stderr)


def run_tier(headline: bool, force: bool) -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("sparktsc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = _q.queries()
    if headline:
        missing = [n for n in HEADLINE_QUERIES if n not in registry]
        if missing:  # a renamed registry entry must fail loudly, not shrink
            raise SystemExit(f"bench --headline: unknown queries {missing}")
        names = list(HEADLINE_QUERIES)
    else:
        names = list(registry)

    # warmup: JVM + codegen + parquet footer caches
    registry["agg_bin"](spark, sf_dir).collect()
    # warmup: Python/Arrow worker pool (paid once per executor in prod)
    spark.range(1).mapInPandas(lambda it: it, "id long").collect()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_DEADLINE", "540"))
    t_start = time.time()
    deadline = t_start + budget
    # soft deadline (FULL tier only): past 60% of the budget, drop to
    # min-of-2 instead of jumping straight to single COLD runs — a hard cut
    # mid-run used to leave every later query single-rep, and their
    # first-execution plan-compile noise (~1.4x) then read as phantom
    # round-over-round regressions on exactly the tail of the registry.
    # The headline tier NEVER tiers: its whole point is a pinned rep
    # policy, so it runs full min-of-N or reports that it could not.
    soft = t_start + 0.6 * budget

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = registry[name]
        try:
            # fn() runs INSIDE the timer on every rep: for most queries it
            # is pure plan construction, but the iterative operators
            # (dedup_clusters' label propagation, contamination's
            # checkpointed shingling) do real work during construction —
            # excluding it would under-report exactly the most expensive
            # queries.
            best = None
            for rep in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).toPandas()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                if headline:
                    continue  # pinned policy: always full min-of-N
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
    tier = "headline" if headline else "full"
    prov = _provenance(sf, tier, len(names), len(registry), reps, budget)
    # Key ORDER is load-bearing (r13 verdict task 8): the driver's
    # captured stdout clips the middle of this (long) line, keeping its
    # head and tail — so the summary fields sit BEFORE the per-query
    # table, and a compact duplicate ("head") sits AFTER it, making the
    # full-registry total and provenance recoverable from either
    # surviving end of a clipped artifact.
    out = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "provenance": prov,
        "queries": timings,
    }
    if errors:
        out["errors"] = errors
    out["head"] = {
        "value": total,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "git_rev": prov.get("git_rev"),
        "sf": out["sf"],
        "tier": tier,
    }

    if headline:
        if _may_write_full(sf, force):
            _write_artifact("BENCH_HEADLINE.json", out)
        else:
            print(
                f"bench: refusing to overwrite BENCH_HEADLINE.json at "
                f"sf={sf} (committed artifact is sf0.1; --force overrides)",
                file=sys.stderr,
            )
    else:
        # the driver stores a truncated tail of the printed line, losing
        # the head rows and blocking round-over-round comparison of exactly
        # the first-registered queries (r10 verdict task #8) — so ALSO
        # persist the complete artifact next to this script ...
        if _may_write_full(sf, force):
            _write_artifact("BENCH_FULL.json", out)
        else:
            # ... but never let an sf0.01 iteration loop silently replace
            # the committed sf0.1 round artifact (r12 verdict task #7)
            print(
                f"bench: refusing to overwrite BENCH_FULL.json at sf={sf} "
                f"(committed artifact is sf0.1; --force overrides)",
                file=sys.stderr,
            )
    return out


def main() -> None:
    headline = "--headline" in sys.argv[1:]
    force = "--force" in sys.argv[1:]
    unknown = [
        a for a in sys.argv[1:] if a not in ("--headline", "--force")
    ]
    if unknown:
        raise SystemExit(f"bench: unknown args {unknown}")

    if not headline and os.environ.get("SPARK_GRAFT_SKIP_HEADLINE") != "1":
        # the attributable tier runs FIRST, in a FRESH subprocess JVM, so
        # its numbers never depend on how much registry ran before it
        args = [sys.executable, os.path.abspath(__file__), "--headline"]
        if force:
            args.append("--force")
        try:
            res = subprocess.run(args, stdout=subprocess.DEVNULL)
            if res.returncode != 0:
                print(
                    f"bench: headline tier exited {res.returncode}",
                    file=sys.stderr,
                )
        except Exception as exc:
            print(f"bench: headline tier failed: {exc}", file=sys.stderr)

    out = run_tier(headline, force)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
