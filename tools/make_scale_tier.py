#!/usr/bin/env python
"""Synthesize an N-fold scale tier from sf0.1 for the SCALING.md probes.

Replication is the ADVERSARIAL direction for the co-location flagship:
every replica keeps the original (cell, time-bucket) structure but gets a
fresh device population (user_id + 100000*rep), so devices per
(cell, bucket) grow N-fold and pair output grows ~N² — the worst case a
hot cell can do at 100 TB. Documents get per-replica suffixes so near-dup
groups span replicas.

Usage: python tools/make_scale_tier.py N [out_dir]   (default /tmp/tier{N}x)
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    n = int(sys.argv[1])
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/tier{n}x"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(
        f"""
        COPY (
            SELECT e.event_id + 10000000 * r.rep AS event_id,
                   e.user_id + 100000 * r.rep AS user_id,
                   e.ts, e.event_type, e.value, e.props
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
                   d.n_chars + 7 + CAST(length(CAST(r.rep AS VARCHAR)) AS BIGINT)
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
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"COPY (SELECT * FROM read_parquet('{p}')) TO '{out}/{t}.parquet' (FORMAT parquet)")
    print(out)


if __name__ == "__main__":
    main()
