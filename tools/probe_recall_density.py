#!/usr/bin/env python
"""Multi-probe mutual-kNN recall at density (VERDICT r8 item 4).

mutual_knn_recall_audit certifies pair_recall at sf0.01 only; this probe
runs the same audit at sf0.1 and the 10x density tier so the
37x-probes-for-16x-recall trade is documented where bucket crowding makes
it hardest. The exact arm is n^2 by design (it IS the ground truth), so
this is a measurement campaign, not a registered query.

Usage: python tools/probe_recall_density.py [dir ...]
Default dirs: sf0.01, sf0.1, /tmp/tier10xh9 (generate with
`python tools/make_scale_tier.py 10 /tmp/tier10xh9 --horizontal` —
embeddings replicate identically under either direction flag).
Tier runs use the SCALE shuffle profile (the round-8 methodology rule).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "0")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/tmp/tier10xh9",
]


def main() -> None:
    from epiteam_network_etl_functions_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("recall-density-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    print("| dir | n_vectors | wall s | exact pairs | bucketed pairs | common | pair_recall |")
    print("|---|---|---|---|---|---|---|")
    for d in DIRS:
        nv = (
            spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        )
        t0 = time.perf_counter()
        row = qs["mutual_knn_recall_audit"](spark, d).collect()[0]
        wall = time.perf_counter() - t0
        print(
            f"| {d} | {nv} | {wall:.1f} | {row['n_exact_pairs']} |"
            f" {row['n_bucketed_pairs']} | {row['n_common']} |"
            f" {row['pair_recall']} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
