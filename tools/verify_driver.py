#!/usr/bin/env python
"""Driver-contract verification under a HOSTILE session.

Simulates the external driver exactly: a plain SparkSession with a
non-UTC timezone and none of our tuned confs (session.prep must repair
everything), then runs queries() against oracle_sql() via DuckDB at
sf0.01 with the driver's order-insensitive compare.

Differs from tools/parity_sf001.py (which uses OUR tuned session): this
is the "would it pass on the driver's session" gate the verify skill
runs before committing query changes.

Usage: python tools/verify_driver.py [--only name,name] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _cell(v):
    if v is None:
        return ("n", "")
    if isinstance(v, float):
        return ("f", repr(round(v, 9)))
    return ("v", str(v))


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (
        [cols[i] for i in order],
        sorted(tuple(_cell(r[i]) for i in order) for r in rows),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Hostile on purpose: the driver won't use our tuned session factory.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/Mexico_City")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    names = args.only.split(",") if args.only else list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            sc, sr = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as exc:
            print(f"FAIL {name}: spark error {exc}")
            failures.append(name)
            continue
        if name not in osql:
            print(f"ok   {name}: rows-only ({len(sr)} rows)")
            continue
        try:
            cur = con.execute(osql[name])
            dc, dr = _norm([c[0] for c in cur.description], cur.fetchall())
        except Exception as exc:
            print(f"FAIL {name}: oracle error {exc}")
            failures.append(name)
            continue
        if sc == dc and sr == dr:
            print(f"ok   {name}: {len(sr)} rows {time.time() - t0:.2f}s")
        else:
            print(
                f"FAIL {name}: cols={sc == dc} "
                f"rows spark={len(sr)} duck={len(dr)}"
            )
            failures.append(name)

    print(
        f"\n{len(names) - len(failures)}/{len(names)} green"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
