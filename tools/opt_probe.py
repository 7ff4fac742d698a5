"""r15 optimization probe: isolated per-query timing + plan capture.

Usage:
    python tools/opt_probe.py [--sf DIR] [--reps N] [--plan SUFFIX] q1 q2 ...

For each named registry query it reports, from ONE warm session (same
``get_spark()`` defaults the bench uses):

- ``noop``   min-of-N wall for the computation alone (guide §1.4 — the
  built-in no-op sink materializes every column of every row without
  paying result delivery), and
- ``pandas`` min-of-N wall for the bench's own methodology (``toPandas``,
  i.e. plan + full Arrow delivery), so a probe number is directly
  comparable to BENCH_FULL rows.

``--plan before`` / ``--plan after`` additionally writes
``plans/r15/<query>_<suffix>.txt`` with ``explain('formatted')`` output —
the judge-checkable evidence for plan-shape claims.

This is an instrument, not part of the driver contract; bench.py remains
the only artifact writer.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nntsc_spark.plans import queries as _q  # noqa: E402
from nntsc_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="suffix: before|after")
    ap.add_argument("--plandir", default="r16", help="plans/<dir>/ target")
    ap.add_argument(
        "--no-noop", action="store_true",
        help="skip the noop-sink timing (pandas only)",
    )
    args = ap.parse_args()

    spark = get_spark(
        "opt-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = _q.queries()
    unknown = [n for n in args.names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # same warmup as bench.py: JVM/codegen + Arrow worker pool
    registry["agg_bin"](spark, args.sf).collect()
    spark.range(1).mapInPandas(lambda it: it, "id long").collect()

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.plandir,
    )
    for name in args.names:
        fn = registry[name]
        if args.plan:
            os.makedirs(plan_dir, exist_ok=True)
            txt = fn(spark, args.sf)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, args.sf)._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plan_dir, f"{name}_{args.plan}.txt"), "w"
            ) as fh:
                fh.write(txt)
        times_noop, times_pd = [], []
        for _ in range(args.reps):
            if not args.no_noop:
                spark.sparkContext.setJobDescription(f"probe-noop:{name}")
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                times_noop.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"probe-pandas:{name}")
            t0 = time.time()
            fn(spark, args.sf).toPandas()
            times_pd.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        noop = f"{min(times_noop):7.3f}" if times_noop else "      -"
        print(
            f"{name:32s} noop={noop}  pandas={min(times_pd):7.3f}  "
            f"(reps={args.reps})",
            flush=True,
        )


if __name__ == "__main__":
    main()
