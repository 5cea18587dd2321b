#!/usr/bin/env python
"""Protocol-matched DuckDB timing for the bench oracle set.

Times each BENCH_QUERIES oracle (from __spark_entry__.oracle_sql()) in
DuckDB on the same parquet tables bench.py reads, with the bench's own
protocol: tables registered as views, one un-timed warm pass, then
best-of-3 min per query, each timed execution wrapped as
SELECT count(*) FROM (<oracle>) so neither engine pays result
serialization. Prints ONE JSON line shaped like bench.py's.

Usage: python tools/duckdb_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = entrymod.oracle_sql()
    names = [q for q in BENCH_QUERIES if q in oracles]

    for name in names:  # warm pass: OS page cache + any duckdb caches
        try:
            con.execute(f"SELECT count(*) FROM ({oracles[name]})").fetchall()
        except Exception as exc:  # pragma: no cover - surfaced in timings
            print(f"# warm {name} failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in names:
        sql = f"SELECT count(*) FROM ({oracles[name]})"
        dt = None
        n = None
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                n = con.execute(sql).fetchall()[0][0]
                run = time.perf_counter() - t0
                dt = run if dt is None else min(dt, run)
        except Exception as exc:
            errors[name] = str(exc)
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
            continue
        timings[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.4f}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "duckdb_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
