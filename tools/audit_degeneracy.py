#!/usr/bin/env python
"""Registry-wide degeneracy audit: row counts at three SFs.

The round-9 two-hop cap incident (a fixed degree threshold that kept
ZERO nodes at sf0.1 density, making tier walls hollow) generalizes:
any query with a fixed threshold can silently degenerate to empty —
still oracle-green (both engines agree on nothing) but measuring
nothing. This audit runs every registered query at sf0.001 / sf0.01 /
sf0.1 and flags:

- EMPTY: zero rows at some SF (legitimate for audits of clean data;
  suspicious for analytic outputs);
- SHRINKING: fewer rows at a larger SF (often fine — thresholds bite
  harder — but worth an eyeball).

Usage: python tools/audit_degeneracy.py [--only name,name]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    from epiteam_network_etl_functions_spark.session import get_session
    import __spark_entry__ as entrymod

    only = None
    for arg in sys.argv[1:]:
        if arg.startswith("--only"):
            only = set(arg.split("=", 1)[1].split(","))
    spark = get_session("degeneracy-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    flags = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        counts = []
        for d in SFS:
            try:
                counts.append(fn(spark, d).count())
            except Exception as exc:
                counts.append(f"ERR:{str(exc)[:40]}")
        tags = []
        nums = [c for c in counts if isinstance(c, int)]
        if any(c == 0 for c in nums):
            tags.append("EMPTY")
        if len(nums) == 3 and (nums[1] < nums[0] or nums[2] < nums[1]):
            tags.append("SHRINKING")
        if any(isinstance(c, str) for c in counts):
            tags.append("ERROR")
        if tags:
            flags += 1
            print(f"{'/'.join(tags):<16} {name}: {counts}", flush=True)
    print(f"done: {flags} flagged of {len(qs)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
