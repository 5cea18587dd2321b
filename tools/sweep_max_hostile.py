#!/usr/bin/env python
"""Max-hostile random-sample sweep: the round-13 prefix gate, generalized.

Builds the most adversarial plausible driver session — AQE OFF, an odd
prime shuffle width (97), a far-from-UTC timezone (Pacific/Auckland),
none of our tuned confs — samples N registered queries with a seeded
RNG, and runs the driver-identical compare against the DuckDB oracles.
Catches anything that silently depends on AQE coalescing, shuffle
width, or session timezone (session.prep must repair all of it).

Usage: python tools/sweep_max_hostile.py [--sample N] [--seed S]
       [--sf-dir DIR] [--only name,name]
"""

from __future__ import annotations

import argparse
import random
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
    ap.add_argument("--sample", type=int, default=60)
    ap.add_argument("--seed", type=int, default=14)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "97")
        .config("spark.sql.session.timeZone", "Pacific/Auckland")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    if args.only:
        names = [n for n in args.only.split(",") if n]
    else:
        rng = random.Random(args.seed)
        names = sorted(rng.sample(sorted(qs), min(args.sample, len(qs))))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    n_ok = n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            sc, sr = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
            if name not in osql:
                print(f"rows {name}: {len(sr)} rows {time.time()-t0:.2f}s")
                n_ok += 1
                continue
            cur = con.execute(osql[name])
            dc, dr = _norm([c[0] for c in cur.description], cur.fetchall())
            if sc == dc and sr == dr:
                print(f"ok   {name}: {len(sr)} rows {time.time()-t0:.2f}s")
                n_ok += 1
            else:
                print(
                    f"FAIL {name}: cols={sc == dc} "
                    f"rows={len(sr)}/{len(dr)}"
                )
                n_bad += 1
        except Exception as e:  # noqa: BLE001 - sweep reports, not raises
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_bad += 1

    print(f"\n{n_ok}/{len(names)} green (seed={args.seed}, AQE off, "
          f"shuffle=97, Pacific/Auckland)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
