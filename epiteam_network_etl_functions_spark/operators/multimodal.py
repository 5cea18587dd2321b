"""Multimodal-column plumbing (beyond-reference surface required by
BASELINE.json: image/audio/video as opaque binary columns with typed
metadata, decoded via Arrow-batched Pandas UDFs).

The container has no image/audio libraries, so the *decode* is stubbed
(gated import; deterministic md5-derived fake dimensions), but everything
Spark-side is real and tested: binary column handling, mapInPandas batch
iteration, explicit output schema, Arrow transfer.

The fake decode is intentionally md5-arithmetic so the whole mapInPandas
path is differentially checkable against a SQL oracle — the only Pandas-UDF
operator in the engine with an exact cross-engine oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real image header parse: md5-derived."""
    h = hashlib.md5(payload).hexdigest()
    return int(h[:4], 16) % 1024, int(h[4:8], 16) % 1024


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio bytes)
    plus its typed metadata — the storage shape a multimodal table uses."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.col(text_col)).cast("bigint").alias("payload_len"),
    )


def decode_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    Real decode (PIL) is gated; without it the deterministic fake runs. The
    plumbing — Arrow batches in, typed DataFrame out, one pass, no driver
    involvement — is exactly what a real decoder uses. Partitioning note:
    decode is CPU-bound and embarrassingly parallel; repartition upstream to
    ~cores × 2 tasks, never collect."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            # A real decoder would branch on _HAVE_PIL here and parse image
            # headers; the payloads in this repo are synthetic (text bytes),
            # so the deterministic fake runs regardless of PIL presence —
            # the gate must never turn into a crash path.
            dims = [_fake_dims(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int64"),
                    "height": pd.Series([d[1] for d in dims], dtype="int64"),
                    "channels": pd.Series([3] * len(pdf), dtype="int64"),
                    "decoder": pd.Series(["fake-md5"] * len(pdf)),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("resizer", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch image resize over binary payloads (1 row in -> 1 row out,
    payload REPLACED — the write-amplification shape of a preprocessing
    pipeline: output partitions carry new bytes, so repartition by size
    *after* this stage, not before).

    With PIL present a real `Image.resize` would run; the container has no
    pixel libraries, so a deterministic fake produces a payload whose
    bytes derive from (input digest, target dims) — size-faithful
    (3 × w × h, capped at 1 MiB per row to bound Arrow batch memory the
    same way a real RGB buffer would be row-group bounded)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                if _HAVE_PIL:  # pragma: no cover - PIL absent here
                    # Real path: Image.open(BytesIO(raw)).resize((w, h))
                    # then .tobytes(); the synthetic payloads are not real
                    # encodings, so fall through to the fake even with PIL.
                    pass
                n = min(3 * target_w * target_h, 1 << 20)
                seed = hashlib.md5(raw + f":{target_w}x{target_h}".encode()).digest()
                body = (seed * (n // len(seed) + 1))[:n]
                outs.append((int(did), body))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series([o[0] for o in outs], dtype="int64"),
                    "payload": pd.Series([o[1] for o in outs], dtype="object"),
                    "width": pd.Series([target_w] * len(outs), dtype="int64"),
                    "height": pd.Series([target_h] * len(outs), dtype="int64"),
                    "resizer": pd.Series(["fake-md5"] * len(outs)),
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sampler", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling over video payloads: the 1 row in -> N rows out
    mapInPandas shape (a decoder would emit one row per kept frame; output
    cardinality is data-dependent, which is why this is mapInPandas and
    not a scalar pandas UDF — the Arrow batch out need not align with the
    batch in).

    Without a video library, frames are deterministic fixed-width slices
    of the payload (64-byte "frames", every ``every_n``-th kept) — the
    fan-out, ordering column, and per-frame binary plumbing are exactly
    the real pipeline's; only the codec is fake. Frame explosion is the
    skew hazard at 100 TB (one long video -> thousands of rows in one
    task): keep payloads row-group-sized upstream and repartition on
    (doc_id, frame_idx) before any per-frame shuffle work."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    frame_bytes = 64

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, totals = [], [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                chunks = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                kept = chunks[::every_n]
                for k, fr in enumerate(kept):
                    ids.append(int(did))
                    idxs.append(k * every_n)
                    frames.append(fr)
                    totals.append(len(chunks))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "n_frames": pd.Series(totals, dtype="int64"),
                    "sampler": pd.Series(["fake-slice"] * len(ids)),
                }
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("chunk_offset", T.LongType()),
        T.StructField("chunk_bytes", T.LongType()),
        T.StructField("chunk", T.BinaryType()),
        T.StructField("n_chunks", T.LongType()),
    ]
)


def chunk_payload(
    df: DataFrame,
    chunk_bytes: int = 96,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Fixed-size chunk manifest over binary payloads: the
    upload/transfer sharding every multimodal store does before moving
    large media (range-request offsets, resumable-upload parts,
    content-defined dedup all start from exactly this table). Same
    1-row-in -> N-rows-out mapInPandas shape as sample_frames, but
    keeping EVERY slice with its byte offset — the manifest must
    reassemble the payload exactly (offsets contiguous, lengths sum to
    payload size, last chunk ragged). Chunk explosion is the same skew
    hazard as frame explosion: one huge object fans out into one task's
    output; keep payloads row-group-sized upstream."""
    if chunk_bytes < 1:
        raise ValueError(f"chunk_bytes must be >= 1, got {chunk_bytes}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, lens, chunks, totals = [], [], [], [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                n = max(1, -(-len(raw) // chunk_bytes))
                for k in range(n):
                    piece = raw[k * chunk_bytes : (k + 1) * chunk_bytes]
                    ids.append(int(did))
                    idxs.append(k)
                    offs.append(k * chunk_bytes)
                    lens.append(len(piece))
                    chunks.append(piece)
                    totals.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "chunk_offset": pd.Series(offs, dtype="int64"),
                    "chunk_bytes": pd.Series(lens, dtype="int64"),
                    "chunk": pd.Series(chunks, dtype="object"),
                    "n_chunks": pd.Series(totals, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, schema=CHUNK_SCHEMA)
