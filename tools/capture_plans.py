#!/usr/bin/env python
"""Capture `.explain("formatted")` for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
"before"). Runs under the same small-profile env the bench uses, but with
NO pre-timed-region table caching — the plans must match what bench.py
actually times (round-14 methodology).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "1")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    from bench import BENCH_QUERIES
    import __spark_entry__ as entrymod
    from epiteam_network_etl_functions_spark.session import get_session

    registry = entrymod.queries()
    if not names:
        names = list(BENCH_QUERIES)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("plan-capture")
    for name in names:
        fn = registry.get(name)
        if fn is None:
            print(f"# skip {name}: not registered", file=sys.stderr)
            continue
        try:
            # A .cache() inside an earlier query's plan would otherwise show
            # up here as an InMemoryTableScan over a shared subtree (seen on
            # home_winners after contact_probs) — capture each query's own
            # cold plan, the one bench.py times.
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            txt = f"ERROR capturing plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
