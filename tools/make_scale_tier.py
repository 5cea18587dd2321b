#!/usr/bin/env python
"""Synthesize an N-fold scale tier from sf0.1 for the SCALING.md probes.

Replication is the ADVERSARIAL direction for the co-location flagship:
every replica keeps the original (cell, time-bucket) structure but gets a
fresh device population (user_id + 100000*rep), so devices per
(cell, bucket) grow N-fold and pair output grows ~N² — the worst case a
hot cell can do at 100 TB. Documents get per-replica suffixes so near-dup
groups span replicas.

Usage: python tools/make_scale_tier.py N [out_dir] [--horizontal]

--horizontal flips events replication to the REALISTIC growth direction:
each replica's events get a per-replica cell namespace (event_type
suffixed with the replica id), so the co-location graph gains N-fold
nodes and edges at FIXED degree — more cities, not denser cells. The
default (density) direction keeps one shared cell namespace, growing
devices per (cell, bucket) N-fold: degrees inflate ~N and any
degree-quadratic operator (wedge joins) inflates ~N^2. Measure both:
density bounds the skew story, horizontal bounds the throughput story.
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--horizontal"]
    horizontal = "--horizontal" in sys.argv[1:]
    n = int(args[0])
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = args[1] if len(args) > 1 else (
        f"/tmp/tier{n}xh" if horizontal else f"/tmp/tier{n}x"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    etype = (
        "concat(e.event_type, '#', CAST(r.rep AS VARCHAR))"
        if horizontal
        else "e.event_type"
    )
    con.execute(
        f"""
        COPY (
            SELECT e.event_id + 10000000 * r.rep AS event_id,
                   e.user_id + 100000 * r.rep AS user_id,
                   e.ts, {etype} AS event_type, e.value, e.props
            FROM read_parquet('{src}/events.parquet') e
            CROSS JOIN (SELECT unnest(range({n})) AS rep) r
        ) TO '{out}/events.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT d.doc_id + 1000000 * r.rep AS doc_id,
                   concat(d.text, ' shard', CAST(r.rep AS VARCHAR)) AS text,
                   d.lang, d.source,
                   d.n_chars + 6 + CAST(length(CAST(r.rep AS VARCHAR)) AS BIGINT)
                       AS n_chars
            FROM read_parquet('{src}/documents.parquet') d
            CROSS JOIN (SELECT unnest(range({n})) AS rep) r
        ) TO '{out}/documents.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT e.vec_id + 1000000 * r.rep AS vec_id,
                   list_transform(e.embedding,
                       x -> CAST(x + 0.001 * r.rep AS FLOAT)) AS embedding,
                   e.label
            FROM read_parquet('{src}/embeddings.parquet') e
            CROSS JOIN (SELECT unnest(range({n})) AS rep) r
        ) TO '{out}/embeddings.parquet' (FORMAT parquet)
        """
    )
    # TPC-H facts replicate with remapped keys (the sf0.1 -> sf1 analog):
    # customers/orders/lineitem grow N-fold, orderkey/custkey offsets keep
    # referential integrity per replica; part/supplier/region/nation stay
    # dims (replicas reference the same catalog, as a real scale-up would).
    con.execute(
        f"""
        COPY (
            SELECT t.* REPLACE (c_custkey + 100000 * r.rep AS c_custkey)
            FROM read_parquet('{src}/customer.parquet') t
            CROSS JOIN (SELECT unnest(range({n})) AS rep) r
        ) TO '{out}/customer.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT t.* REPLACE (o_orderkey + 10000000 * r.rep AS o_orderkey,
                                o_custkey + 100000 * r.rep AS o_custkey)
            FROM read_parquet('{src}/orders.parquet') t
            CROSS JOIN (SELECT unnest(range({n})) AS rep) r
        ) TO '{out}/orders.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT t.* REPLACE (l_orderkey + 10000000 * r.rep AS l_orderkey)
            FROM read_parquet('{src}/lineitem.parquet') t
            CROSS JOIN (SELECT unnest(range({n})) AS rep) r
        ) TO '{out}/lineitem.parquet' (FORMAT parquet)
        """
    )
    for t in ("region", "nation", "supplier", "part"):
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"COPY (SELECT * FROM read_parquet('{p}')) TO '{out}/{t}.parquet' (FORMAT parquet)")
    print(out)


if __name__ == "__main__":
    main()
