"""Streaming MinHash/LSH near-duplicate detection — the live-ingest
complement of the batch chain in operators/dedup.py (minhash_signatures →
lsh_bands → lsh_candidate_pairs).

A training-data feed lands documents continuously; waiting for a nightly
batch near-dup pass means every downstream consumer sees hours of
near-duplicates. This surface flags them at ingest:

1. **Row-wise MinHash** (`rowwise_minhash`): the batch kernel's exact
   hash family (disjoint 16-bit slices of seeded md5, operators/dedup.py)
   computed as `array_min(transform(shingles, ...))` over the per-row
   shingle array — a pure projection, no shuffle, no Python. Identical
   output to the batch groupBy-MIN for the same document (MIN over a
   multiset equals MIN over its distinct set), locked by test.
2. **Band explosion** (`stream_bands`): the signature cut into bands,
   each hashed to one bucket key — same expression as the batch
   `lsh_bands`, emitted as a long (doc, band_idx, band_hash) stream.
3. **Stateful bucket matcher** (`streaming_lsh_candidates`):
   `applyInPandasWithState` keyed by (band_idx, band_hash). State per
   bucket: the (id, signature) pairs seen inside the watermark horizon,
   capped at `max_bucket` entries. Each arriving doc emits one candidate
   row per stored doc it shares the bucket with, with the signature
   agreement fraction as the Jaccard estimate.

State bounds (both required for an unbounded stream):
- **Horizon**: an event-time timeout drops a bucket once the watermark
  passes its last arrival + the horizon — cold buckets cost nothing.
- **Cap**: hot buckets (boilerplate text hashing to one band value) keep
  only the `max_bucket` most recent entries (FIFO eviction). A capped
  bucket under-reports pairs among >max_bucket-sized duplicate swarms —
  the right trade at ingest: such swarms are already flagged by their
  first max_bucket pairings, and the periodic batch pass (near_dup_pairs)
  is the exhaustive sweep.

The same pair can surface from several bands (one candidate row per
shared bucket, exactly the batch pre-DISTINCT semantics); consumers
dedup on (a_id, b_id) or verify exactly with jaccard_verify in the
sweep. Reference has no streaming (SURVEY.md §2.10) — this is
beyond-reference surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import HASHES_PER_MD5
from ..operators.text import shingles_col, tokens_col

SIG_SEP = "|"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("a_id", T.LongType()),
        T.StructField("b_id", T.LongType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)

# Arrays, not a map: GroupState rows must be fixed-schema; parallel arrays
# keep insertion (= arrival) order, which FIFO eviction needs.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.StringType())),
        T.StructField("last_us", T.LongType()),
    ]
)


def rowwise_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    n_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """(id, ts, sig): per-row MinHash signature as one projection.

    Same hash family as the batch minhash_signatures (ceil(n/8) md5 calls
    per shingle, 4-hex disjoint slices, lexicographic MIN over fixed-width
    hex); works on a stream because nothing aggregates across rows. Docs
    with no shingles (< k tokens) get NULL mins — emitted as the literal
    string 'zzzz'-padded sentinel so the signature never collides with a
    real min (hex is [0-9a-f])."""
    sig_parts = []
    for i in range(n_hashes):
        d, slot = divmod(i, HASHES_PER_MD5)
        sig_parts.append(
            f"coalesce(array_min(transform(__sh, s -> "
            f"substring(md5(cast(concat('{d}:', s) as binary)), {slot * 4 + 1}, 4)"
            f")), 'zzzz')"
        )
    sig = f"concat_ws('{SIG_SEP}', {', '.join(sig_parts)})"
    return (
        df.withColumn("__t", tokens_col(text_col))
        .withColumn("__sh", shingles_col(F.col("__t"), k))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("ts"),
            F.expr(sig).alias("sig"),
        )
    )


def stream_bands(
    sigs: DataFrame, n_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """(doc_id, ts, sig, band_idx, band_hash) long stream — the batch
    lsh_bands cut, applied to the packed signature string. Band b hashes
    the concatenation of its slots, exactly matching the batch
    md5(concat(mh_i..)) bucket keys, so a streaming bucket and a batch
    bucket for the same document coincide."""
    if n_hashes % band_size:
        raise ValueError("band_size must divide n_hashes")
    n_bands = n_hashes // band_size
    rows = []
    for b in range(n_bands):
        parts = ", ".join(
            # split() is 1-based via element_at; sig slots are fixed-width
            f"element_at(split(sig, '[{SIG_SEP}]'), {b * band_size + j + 1})"
            for j in range(band_size)
        )
        rows.append(f"{b}, md5(concat({parts}))")
    stack = f"stack({n_bands}, {', '.join(rows)}) AS (band_idx, band_hash)"
    return sigs.selectExpr("doc_id", "ts", "sig", stack)


def _est_jaccard(sig_a: str, sig_b: str) -> float:
    a, b = sig_a.split(SIG_SEP), sig_b.split(SIG_SEP)
    return sum(x == y for x, y in zip(a, b)) / len(a)


def _make_matcher(max_bucket: int, horizon_us: int):
    def _match(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        band_idx = int(key[0])
        if state.hasTimedOut:
            # Watermark passed last arrival + horizon: no future doc can
            # pair inside the horizon — drop the bucket.
            state.remove()
            return
        if state.exists:
            ids, sigs, last_us = state.get
            ids, sigs = list(ids), list(sigs)
        else:
            ids, sigs, last_us = [], [], 0
        # Drain all chunks, then order by (ts, doc_id): a group's rows can
        # span Arrow batches unordered, and candidate emission must be
        # deterministic (a = earlier arrival).
        rows = []
        for pdf in pdf_iter:
            rows.extend(
                zip(pdf["doc_id"].astype("int64"), pdf["sig"], pdf["ts"])
            )
        rows.sort(key=lambda r: (pd.Timestamp(r[2]).value, r[0]))
        out_a, out_b, out_j = [], [], []
        for doc_id, sig, ts in rows:
            doc_id = int(doc_id)
            for prev_id, prev_sig in zip(ids, sigs):
                if prev_id == doc_id:
                    continue  # retry/replay of the same doc: not a pair
                a, b = sorted((prev_id, doc_id))
                out_a.append(a)
                out_b.append(b)
                out_j.append(_est_jaccard(prev_sig, sig))
            ids.append(doc_id)
            sigs.append(sig)
            if len(ids) > max_bucket:  # FIFO: keep the most recent
                ids, sigs = ids[-max_bucket:], sigs[-max_bucket:]
            last_us = max(last_us, pd.Timestamp(ts).value // 1000)
        state.update((ids, sigs, last_us))
        state.setTimeoutTimestamp((last_us + horizon_us) // 1000)
        if out_a:
            yield pd.DataFrame(
                {
                    "band_idx": band_idx,
                    "a_id": out_a,
                    "b_id": out_b,
                    "est_jaccard": out_j,
                }
            )

    return _match


def streaming_lsh_candidates(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    n_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
    watermark: str = "1 hour",
    horizon: str = "1 hour",
    max_bucket: int = 64,
) -> DataFrame:
    """Near-dup candidate stream from a (id, text, ts) document stream.

    One candidate row per (pair, shared band) within the horizon; the
    est_jaccard column is the signature agreement fraction (the standard
    MinHash estimator). Shuffles once, on (band_idx, band_hash) — the
    same key the batch LSH join uses, with the same hot-bucket hazard,
    here bounded by max_bucket instead of AQE."""
    horizon_us = _parse_duration_us(horizon)
    sigs = rowwise_minhash(stream, id_col, text_col, ts_col, n_hashes, k)
    bands = stream_bands(sigs, n_hashes, band_size)
    return (
        bands.withWatermark("ts", watermark)
        .groupBy("band_idx", "band_hash")
        .applyInPandasWithState(
            _make_matcher(max_bucket, horizon_us),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_UNITS_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def _parse_duration_us(s: str) -> int:
    n, unit = s.strip().split()
    if unit not in _UNITS_US:
        raise ValueError(f"unsupported duration unit {unit!r} in {s!r}")
    return int(n) * _UNITS_US[unit]
