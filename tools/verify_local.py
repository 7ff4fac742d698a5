"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, compares row counts, column sets, and (order-
insensitively, columns sorted by name) the cell values.  Floats compare
exactly — queries are expected to round identically on both sides.

When run over the FULL registry (no query filter), writes
``CORRECTNESS_FULL.json`` at the repo root — one row per registered query,
including the tail beyond the driver's 50-query window — so tail oracle
status is a committed artifact, not a claim.  ``--plans`` additionally
regenerates PERF.md via tools/plan_report.py after a green run, making the
plan-audit habit part of the same verification pass.

Usage: python tools/verify_local.py [--plans] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from nntsc_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return norm_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def _session():
    """Tuned session by default; SPARK_GRAFT_VANILLA=1 builds a bare
    SparkSession like the driver's (no AQE/tz/partition tuning) so session-
    config-dependent bugs surface here instead of in the driver run."""
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        from pyspark.sql import SparkSession

        return SparkSession.builder.master("local[8]").appName(
            "verify-vanilla"
        ).getOrCreate()
    return get_spark("verify-local")


def main() -> int:
    argv = list(sys.argv[1:])
    with_plans = "--plans" in argv
    if with_plans:
        argv.remove("--plans")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = _session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(_session(), sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # record, keep verifying the rest
            failures.append((name, f"spark error: {exc}"))
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "err": str(exc)[:500],
            }
            print(f"{name}: spark ERROR  FAIL")
            continue
        spark_t = time.time() - t0
        status_parts = [f"{name}: spark {len(srows)} rows {spark_t:.1f}s"]
        if name not in oracles:
            # "rows-only" means exactly: the query RAN (any error was
            # caught above) — record literal True, not a vacuous
            # comparison that implies a value check happened
            results[name] = {
                "rows_match": True, "schema_match": None,
                "hash_match": None, "err": None, "mode": "rows-only",
            }
            print(status_parts[0] + "  (no oracle — rows-only)")
            continue
        # oracle side gets the same record-and-continue treatment as the
        # Spark side: one bad oracle (e.g. a DuckDB upgrade changing
        # comprehension syntax) must not abort the run and lose the
        # committed artifact for every later query
        try:
            rel = con.sql(oracles[name])
            # The driver normalizes through pandas: DuckDB HUGEINT/DECIMAL
            # columns come out as float64/object there and hash-mismatch
            # even when values are numerically identical.  Flag the
            # known-bad types explicitly (not an allowlist — benign widths
            # like SMALLINT or INTEGER[] compare fine, shouldn't hard-fail).
            _BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")
            bad_types = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if any(b in str(t) for b in _BAD)
            ]
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as exc:
            failures.append((name, f"oracle error: {exc}"))
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "err": f"oracle: {str(exc)[:500]}",
            }
            print(status_parts[0] + "  oracle ERROR  FAIL")
            continue
        ok = True
        rows_ok = schema_ok = hash_ok = True
        if bad_types:
            failures.append((name, f"oracle emits driver-hostile types: {bad_types}"))
            ok = schema_ok = False
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"columns differ: spark={sorted(scols)} duck={sorted(ocols)}"))
            ok = schema_ok = hash_ok = False
        elif len(srows) != len(orows):
            failures.append((name, f"rowcount spark={len(srows)} duck={len(orows)}"))
            ok = rows_ok = hash_ok = False
        else:
            sm = rows_to_multiset(scols, srows)
            om = rows_to_multiset(ocols, orows)
            if sm != om:
                diff_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                diff_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                failures.append(
                    (name, f"values differ; spark-only={diff_s} duck-only={diff_o}")
                )
                ok = hash_ok = False
        results[name] = {
            "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": hash_ok, "err": None,
        }
        print(status_parts[0] + ("  OK" if ok else "  FAIL"))
    print()
    if not only:  # full-registry run: commit-able artifact incl. the tail
        artifact = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_FULL.json",
        )
        with open(artifact, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(results),
                 "queries": results},
                f, indent=1,
            )
        print(f"wrote {artifact} ({len(results)} queries)")
    if failures:
        for name, msg in failures:
            print(f"FAIL {name}: {msg}")
        return 1
    print("all queries match")
    if with_plans:
        import subprocess

        print("regenerating PERF.md (plan_report)...")
        rc = subprocess.call(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plan_report.py")]
        )
        if rc != 0:
            print("plan_report FAILED")
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
