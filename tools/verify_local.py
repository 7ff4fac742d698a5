"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, compares row counts, column sets, and (order-
insensitively, columns sorted by name) the cell values.  Floats compare
exactly — queries are expected to round identically on both sides.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = _session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(_session(), sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_t = time.time() - t0
        status_parts = [f"{name}: spark {len(srows)} rows {spark_t:.1f}s"]
        if name not in oracles:
            print(status_parts[0] + "  (no oracle — rows-only)")
            continue
        rel = con.sql(oracles[name])
        # The driver normalizes through pandas: DuckDB HUGEINT/DECIMAL
        # columns come out as float64/object there and hash-mismatch even
        # when values are numerically identical.  Flag the known-bad types
        # explicitly (not an allowlist — benign widths like SMALLINT or
        # INTEGER[] compare fine and shouldn't hard-fail).
        _BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")
        bad_types = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(b in str(t) for b in _BAD)
        ]
        ocols = rel.columns
        orows = rel.fetchall()
        ok = True
        if bad_types:
            failures.append((name, f"oracle emits driver-hostile types: {bad_types}"))
            ok = False
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"columns differ: spark={sorted(scols)} duck={sorted(ocols)}"))
            ok = False
        elif len(srows) != len(orows):
            failures.append((name, f"rowcount spark={len(srows)} duck={len(orows)}"))
            ok = False
        else:
            sm = rows_to_multiset(scols, srows)
            om = rows_to_multiset(ocols, orows)
            if sm != om:
                diff_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                diff_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                failures.append(
                    (name, f"values differ; spark-only={diff_s} duck-only={diff_o}")
                )
                ok = False
        print(status_parts[0] + ("  OK" if ok else "  FAIL"))
    print()
    if failures:
        for name, msg in failures:
            print(f"FAIL {name}: {msg}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
