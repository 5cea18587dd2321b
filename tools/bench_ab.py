#!/usr/bin/env python
"""Same-session Spark/DuckDB bench A/B — the drift tripwire.

Round 3->4 showed a uniform ~1.3x per-query slowdown that turned out to be
VM drift, not a regression (the judge's re-timed DuckDB moved by the same
factor). Timing both engines back-to-back in one invocation makes every
round self-normalizing: the committed artifact carries the ratio, not two
absolute numbers measured hours apart.

Usage: python tools/bench_ab.py [round_tag]
Writes DUCK_<tag>.json and AB_<tag>.json at the repo root and prints the
per-query ratio table. bench.py's own JSON line goes to stdout untouched
(the driver still owns BENCH_r{N}.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str]) -> dict:
    out = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in output of {cmd}: {out[-500:]}")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "local"
    # Load stamp BEFORE the run: 1/5/15-min loadavg at sample time, so a
    # reader can mechanically pick the idle-host samples (loadavg1 < ~1)
    # out of a set instead of guessing which were taken during a pytest
    # storm (VM drift has flipped the aggregate ratio by 25%+ before).
    load_before = os.getloadavg()
    spark = _run([sys.executable, "bench.py"])
    duck = _run([sys.executable, "tools/duckdb_bench.py"])
    load_after = os.getloadavg()

    common = sorted(set(spark["queries"]) & set(duck["queries"]))
    rows = []
    s_tot = d_tot = 0.0
    for q in common:
        s, d = spark["queries"][q], duck["queries"][q]
        s_tot += s
        d_tot += d
        rows.append((q, s, d, round(s / d, 2) if d else None))
    ab = {
        "spark_total": round(s_tot, 3),
        "duckdb_total": round(d_tot, 3),
        "ratio": round(s_tot / d_tot, 3) if d_tot else None,
        "sf": spark.get("sf"),
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
        "queries": {
            q: {"spark": s, "duckdb": d, "ratio": r} for q, s, d, r in rows
        },
    }
    with open(os.path.join(ROOT, f"DUCK_{tag}.json"), "w") as f:
        json.dump(duck, f, indent=1)
    with open(os.path.join(ROOT, f"AB_{tag}.json"), "w") as f:
        json.dump(ab, f, indent=1)
    for q, s, d, r in sorted(rows, key=lambda x: -(x[3] or 0)):
        print(f"{q:32s} spark={s:7.3f} duck={d:7.3f} ratio={r}")
    print(
        f"TOTAL spark={s_tot:.3f} duck={d_tot:.3f} "
        f"ratio={s_tot / d_tot:.3f} over {len(common)} queries"
    )


if __name__ == "__main__":
    main()
