"""Audit every registered oracle for driver-hash type hazards.

The external driver's value hash is type-sensitive: DuckDB types an un-cast
``sum()`` of an integer column as HUGEINT (int128), which hash-mismatches a
byte-identical Spark BIGINT (round-4 verdict: `props_json_stats`,
`props_bpe_tokens`, `inter_event_gaps` were value-equal but red).  This
script runs each oracle at sf0.001 and flags any output column whose DuckDB
type is HUGEINT / UHUGEINT / DECIMAL — types Spark never emits from the
paired queries.

Usage: python tools/oracle_type_audit.py [sf_dir]
Exit code 1 if any hazard found.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epiteam_network_etl_functions_spark import workload  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

HAZARD_TYPES = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workload.load_all()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    bad = 0
    for name, sql in workload.ORACLES.items():
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as exc:  # pragma: no cover - surfacing only
            print(f"ERROR  {name}: {exc}")
            bad += 1
            continue
        hazards = [
            (c, t)
            for c, t in cols
            if t.upper() in HAZARD_TYPES or t.upper().startswith("DECIMAL")
        ]
        if hazards:
            bad += 1
            print(f"HAZARD {name}: {hazards}")
    print(f"checked {len(workload.ORACLES)} oracles, {bad} hazard(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
