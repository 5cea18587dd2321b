"""Registry-wide physical-plan audit: flag duplicated exchange signatures
and scan-count blowups.

The device_rg round-5 find (the winner-subquery join evaluated the visits
subtree twice; a full-frame first() window removed the duplicate and cut
0.85 s -> 0.25 s) generalizes: a query whose plan TEXT repeats the same
Exchange signature may be re-evaluating a subtree per consumer. This
script prints the suspects so they can be eyeballed — AQE's ReuseExchange
and runtime caching clear many of them, so a hit here is a LEAD, not a
verdict; confirm with wall-clock before rewriting.

Usage: python tools/plan_audit.py [sf_dir] [--only name,name]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epiteam_network_etl_functions_spark.session import get_session  # noqa: E402
from epiteam_network_etl_functions_spark import workload  # noqa: E402

# Eager iteratives execute at plan-build; their final plan is a stub.
SKIP = {"colocation_pagerank", "colocation_communities"}


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    only = None
    for arg in sys.argv[1:]:
        if arg.startswith("--only"):
            only = set(arg.split("=", 1)[1].split(","))
        else:
            sf_dir = arg
    workload.load_all()
    spark = get_session()
    flagged = 0
    for name, fn in workload.REGISTRY.items():
        if name in SKIP or (only and name not in only):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"ERR    {name}: {str(exc)[:120]}")
            flagged += 1
            continue
        sigs: dict[str, int] = {}
        for line in plan.splitlines():
            m = re.search(r"(Exchange hashpartitioning\([^)]*\))", line)
            if m and "Reused" not in line:
                sig = re.sub(r"#\d+L?", "#", m.group(1))
                sigs[sig] = sigs.get(sig, 0) + 1
        dups = {s: c for s, c in sigs.items() if c > 2}
        scans = plan.count("FileScan parquet")
        if dups or scans > 8:
            flagged += 1
            print(f"LEAD   {name}: scans={scans} dups={dups}")
    print(f"done: {flagged} lead(s) (verify with wall-clock before rewriting)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
