#!/usr/bin/env python
"""Shuffle-byte accounting for the headline queries: how much data each
plan MOVES relative to what it READS — the 'minimize shuffles' design
rule turned into a measured ratio.

Runs each query cold-per-plan under a UI-enabled SCALE-profile session at
sf0.1 and sums its stages' inputBytes / shuffleWriteBytes /
shuffleReadBytes from the REST API. A plan whose shuffle-write is a small
fraction of its input is map-side-reduced / pre-pruned; a ratio > 1 means
the plan amplifies data movement (fan-outs, exploded joins) and must be
candidate- or output-bounded to scale.

Usage: python tools/probe_shuffle_bytes.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SMALL_PROFILE", "0")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "colocation_pairs",
    "colocation_pairs_bucketed",
    "pings_fact_base",
    "tfidf_top_terms",
    "near_dup_pairs",
    "mutual_knn_bucketed",
    "doc_unigram_logprob",
    "two_hop_reach_capped",
]


def _rest(url: str):
    import json
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    from pyspark.sql import SparkSession

    from epiteam_network_etl_functions_spark.session import prep
    import __spark_entry__ as entrymod

    names = sys.argv[1:] or DEFAULT
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4047")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("shuffle-bytes-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)
    app = spark.sparkContext.applicationId
    base = "http://localhost:4047"
    qs = entrymod.queries()

    def stage_totals():
        tot = {"in": 0, "sw": 0, "sr": 0}
        for st in _rest(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ):
            tot["in"] += st.get("inputBytes", 0)
            tot["sw"] += st.get("shuffleWriteBytes", 0)
            tot["sr"] += st.get("shuffleReadBytes", 0)
        return tot

    print("| query | wall s | input MB | shuffle write MB | shuffle read MB | write/input |")
    print("|---|---|---|---|---|---|")
    for name in names:
        before = stage_totals()
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        time.sleep(0.5)  # let the UI ingest the last stages
        after = stage_totals()
        mb = 1024.0 * 1024.0
        inb = (after["in"] - before["in"]) / mb
        sw = (after["sw"] - before["sw"]) / mb
        sr = (after["sr"] - before["sr"]) / mb
        ratio = f"{sw / inb:.2f}" if inb > 0 else "-"
        print(
            f"| {name} | {wall:.2f} | {inb:.1f} | {sw:.1f} | {sr:.1f} |"
            f" {ratio} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
