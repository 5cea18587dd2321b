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
