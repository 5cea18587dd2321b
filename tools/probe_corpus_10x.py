#!/usr/bin/env python
"""Run the composed corpus pipeline end-to-end at a synthetic scale tier
with per-stage walls — the off-operating-point check for the fuzzy
stage's candidate-bounded claim (SCALING.md).

Each stage boundary is localCheckpointed and timed via count(), so a
stage's wall includes exactly its own work (the boundary cut means no
upstream replay leaks into downstream timings — the materialized-IR
discipline run_corpus_pipeline(materialize=True) uses). The candidate
pair count is probed separately so the growth factor of the fuzzy
stage's dominant input is a printed number, not an inference.

Usage: python tools/probe_corpus_10x.py [tier_dir] [out_dir]
Defaults: /tmp/tier10x (build it first: python tools/make_scale_tier.py 10)
and /tmp/corpus10x_out for the shard export.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIER = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tier10x"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus10x_out"
BENCH_MAX_ID = 20  # docs 0..19 stand in for the benchmark set


def main() -> None:
    from pyspark.sql import functions as F

    from epiteam_network_etl_functions_spark.plans import corpus_pipeline as cp
    from epiteam_network_etl_functions_spark.operators.dedup import (
        prefix_filter_candidates,
    )
    from epiteam_network_etl_functions_spark.operators.text import (
        explode_shingles,
    )
    from epiteam_network_etl_functions_spark.session import get_session

    spark = get_session("probe-corpus-10x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(TIER, "documents.parquet"))
    corpus = docs.where(F.col("doc_id") % 1_000_000 >= BENCH_MAX_ID)
    bench = docs.where(F.col("doc_id") % 1_000_000 < BENCH_MAX_ID)
    cfg = cp.CorpusConfig()

    t0 = time.perf_counter()
    walls: list[tuple[str, float, int]] = []
    cur = corpus

    def stage(name, fn):
        nonlocal cur
        t = time.perf_counter()
        cur = fn(cur).localCheckpoint()
        n = cur.count()
        walls.append((name, time.perf_counter() - t, n))

    stage("gate_quality", lambda d: cp.gate_quality(d, cfg))
    stage("dedup_exact", lambda d: cp.dedup_exact(d))
    # candidate-pair probe on the exact-deduped input (the fuzzy stage's
    # dominant intermediate), timed separately from the stage itself
    t = time.perf_counter()
    sh = explode_shingles(cur, "doc_id", "text", k=cfg.shingle_k).cache()
    n_cands = prefix_filter_candidates(
        sh, "doc_id", threshold=cfg.jaccard_threshold
    ).count()
    sh.unpersist()
    print(f"# fuzzy candidate pairs: {n_cands} "
          f"(probe {time.perf_counter() - t:.1f}s)")
    stage("dedup_fuzzy", lambda d: cp.dedup_fuzzy(d, cfg))
    stage("decontaminate", lambda d: cp.decontaminate(d, bench, cfg))
    clean = cur  # the export consumes the decontaminated set, as in
    # run_corpus_pipeline; pack_bins is a separate consumer
    stage("pack_bins", lambda d: cp.pack_bins(d, cfg))
    t = time.perf_counter()
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    from epiteam_network_etl_functions_spark.sources.io import (
        write_jsonl_shards,
    )

    n = clean.count()
    write_jsonl_shards(clean, OUT, records_per_shard=max(1, -(-n // 8)))
    walls.append(("export_jsonl", time.perf_counter() - t, n))

    total = time.perf_counter() - t0
    print(f"{'stage':16} {'wall_s':>8} {'rows_out':>10}")
    for name, w, n in walls:
        print(f"{name:16} {w:8.1f} {n:10d}")
    print(f"{'TOTAL':16} {total:8.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
