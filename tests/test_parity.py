"""Differential oracle parity — local replica of the driver's t2 gate.

Every registered query runs on Spark and (when an oracle exists) as DuckDB
SQL over the same parquet; results are compared order-insensitively after
sorting columns by name, mirroring the driver's hash comparison. Strict
equality on strings/ints; floats must match to 1e-9 (queries pre-round, so
this catches any engine-formatting drift before the driver does).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import PARITY_SF_DIR

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{PARITY_SF_DIR}/{name}.parquet')"
        )
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(("f", round(v, 9)))
            elif v is None:
                vals.append(("n", None))
            else:
                vals.append(("v", str(v)))
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in order], out


def _cells_equal(a, b):
    if a[0] != b[0]:
        return False
    if a[0] == "f":
        if a[1] is None or b[1] is None:
            return a[1] == b[1]
        return math.isclose(a[1], b[1], rel_tol=0, abs_tol=1e-9)
    return a[1] == b[1]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, name):
    sdf = QUERIES[name](spark, PARITY_SF_DIR)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    oracle = ORACLES.get(name)
    if oracle is None:
        assert len(s_rows) >= 0  # rows-only check, as the driver records
        return

    con = _duck()
    cur = con.execute(oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    s_cols_sorted, s_norm = _normalize(s_rows, s_cols)
    d_cols_sorted, d_norm = _normalize(d_rows, d_cols)

    assert s_cols_sorted == d_cols_sorted, f"{name}: column mismatch"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count spark={len(s_norm)} duckdb={len(d_norm)}"
    )
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        assert len(sr) == len(dr)
        for sc, dc in zip(sr, dr):
            assert _cells_equal(sc, dc), (
                f"{name}: row {i} differs: spark={sr} duckdb={dr}"
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_driver_prefix_is_exactly_the_uncertified_set():
    """The external driver snapshots the first 50 registered names; a green
    row in any round certifies a query permanently. Invariant: the prefix
    must be exactly the non-demoted set (every never-certified query inside,
    nothing wasted on already-certified proxies), each with an oracle —
    a registration-order drift would silently burn certification slots."""
    from epiteam_network_etl_functions_spark import workload

    workload.load_all()
    names = list(workload.REGISTRY)
    fresh = [
        n
        for n in names
        if n not in workload.DEMOTED and n not in workload.DEFERRED
    ]
    assert len(fresh) <= 50, (
        f"{len(fresh)} uncertified non-deferred queries exceed the 50-slot "
        "driver prefix — demote certified proxies (or defer late additions) "
        "before adding more"
    )
    assert names[: len(fresh)] == fresh
    # the DEFERRED tier sits immediately after the prefix, before the
    # certified tail, so it inherits the freed slots at the next rotation
    deferred = [n for n in workload.DEFERRED if n in workload.REGISTRY]
    assert names[len(fresh) : len(fresh) + len(deferred)] == deferred
    missing = [n for n in fresh + deferred if n not in workload.ORACLES]
    assert not missing, f"prefix/deferred queries without oracles: {missing}"
