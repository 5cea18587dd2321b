"""Multimodal workload: binary payload + Pandas-UDF feature extraction.

The md5-derived fake decode makes the mapInPandas path differentially
checkable: the oracle reproduces the hex arithmetic in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from ..operators.multimodal import attach_binary_payload, decode_features
from ..session import prep
from . import query


def _hex4_to_int(h: str, start: int) -> str:
    """DuckDB expression: parse md5-hex chars [start, start+4) as an int."""
    terms = []
    for j, mult in enumerate((4096, 256, 16, 1)):
        terms.append(
            f"(strpos('0123456789abcdef', substr({h}, {start + j}, 1)) - 1) * {mult}"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST({_hex4_to_int('md5(text)', 1)} % 1024 AS BIGINT) AS width,
           CAST({_hex4_to_int('md5(text)', 5)} % 1024 AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS channels,
           'fake-md5' AS decoder
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column + mapInPandas feature extraction: documents.text stands
    in for image bytes; Arrow batches flow through the Pandas UDF and come
    back as a typed metadata table. (Corpus is ASCII, so n_bytes == n_chars
    and SQL md5(text) equals md5 of the UTF-8 payload.)"""
    prep(spark)
    docs = catalog.load(spark, sf_dir, "documents")
    payload = attach_binary_payload(docs, "doc_id", "text")
    return decode_features(payload)


FRAME_EVERY_N = 2


@query(
    "frame_sample_catalog",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               CAST(ceil(length(text) / 64.0) AS BIGINT) AS nc
        FROM documents
    ),
    k AS (
        SELECT doc_id, text, nc,
               unnest(range(0, nc, {FRAME_EVERY_N})) AS fi
        FROM f WHERE nc > 0
    )
    SELECT doc_id,
           fi AS frame_idx,
           md5(substr(text, CAST(fi * 64 + 1 AS INTEGER), 64)) AS frame_md5,
           nc AS n_frames
    FROM k
    """,
)
def frame_sample_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling catalog: the 1-row-in -> N-rows-out mapInPandas path
    (operators/multimodal.sample_frames) differentially certified — every
    kept frame's content digest, its index, and the total frame count.
    The fake codec slices the payload into 64-byte frames and keeps every
    {FRAME_EVERY_N}th; the oracle replays the identical slicing as SQL
    substr arithmetic (corpus is ASCII, so char offsets == byte offsets
    and md5(text slice) == md5 of the frame bytes). This locks the
    data-dependent fan-out shape — output cardinality, ordering column,
    per-frame binary handling — which is exactly what a real video
    decoder changes the codec of, not the plumbing."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import sample_frames

    prep(spark)
    docs = catalog.load(spark, sf_dir, "documents")
    payload = attach_binary_payload(docs, "doc_id", "text")
    frames = sample_frames(payload, every_n=FRAME_EVERY_N)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        "n_frames",
    )


RESIZE_W = 64
RESIZE_H = 64


@query(
    "resized_payload_digest",
    oracle=f"""
    SELECT doc_id,
           CAST({RESIZE_W} AS BIGINT) AS width,
           CAST({RESIZE_H} AS BIGINT) AS height,
           CAST({min(3 * RESIZE_W * RESIZE_H, 1 << 20)} AS BIGINT) AS n_bytes,
           md5(substr(repeat(md5(text || ':{RESIZE_W}x{RESIZE_H}'),
                             {min(3 * RESIZE_W * RESIZE_H, 1 << 20) // 16 + 1}),
                      1, {2 * min(3 * RESIZE_W * RESIZE_H, 1 << 20)}))
               AS body_md5
    FROM documents
    """,
)
def resized_payload_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-stage certification: the payload-REPLACING mapInPandas path
    (operators/multimodal.resize_images at {RESIZE_W}x{RESIZE_H}) with the
    output bytes content-addressed. The fake resizer emits
    (md5-digest-of input+target, repeated)[:3wh] bytes; both engines hash
    the lowercase-hex encoding of that buffer (DuckDB's md5 is
    VARCHAR-only), so truncation at a byte boundary aligns with 2 hex
    chars and the digests agree exactly. Certifies the write-amplification
    shape — new bytes per row, size-faithful buffers, Arrow batch
    round-trip — independent of any pixel library."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import resize_images

    prep(spark)
    docs = catalog.load(spark, sf_dir, "documents")
    payload = attach_binary_payload(docs, "doc_id", "text")
    resized = resize_images(payload, RESIZE_W, RESIZE_H)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5(F.lower(F.hex("payload")).cast("binary")).alias("body_md5"),
    )


CHUNK_BYTES = 96


@query(
    "payload_chunk_manifest",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               octet_length(encode(text)) AS plen,
               greatest(CAST(ceil(octet_length(encode(text)) / {CHUNK_BYTES}.0)
                             AS BIGINT), 1) AS nc
        FROM documents
    ),
    k AS (
        SELECT doc_id, text, plen, nc, unnest(range(0, nc)) AS ci
        FROM f
    )
    SELECT doc_id,
           ci AS chunk_idx,
           ci * {CHUNK_BYTES} AS chunk_offset,
           least({CHUNK_BYTES}, plen - ci * {CHUNK_BYTES}) AS chunk_bytes,
           md5(substr(text, CAST(ci * {CHUNK_BYTES} + 1 AS INTEGER),
                      {CHUNK_BYTES})) AS chunk_md5,
           nc AS n_chunks
    FROM k
    """,
)
def payload_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFER-CHUNK MANIFEST over binary payloads, differentially
    certified: every {CHUNK_BYTES}-byte chunk's index, byte offset,
    ragged tail length, content digest, and the per-object chunk count —
    the table a multimodal store derives for range requests, resumable
    uploads, and chunk-level dedup of media bytes. The Spark side is the
    real mapInPandas chunker (operators/multimodal.chunk_payload) slicing
    the actual binary column; the oracle replays the slicing as substr
    arithmetic (ASCII corpus: char offsets == byte offsets, the
    frame_sample_catalog equivalence), so offsets, ragged-tail math, AND
    chunk content are all checked cross-engine. Reassembly invariants
    (offset contiguity, lengths summing to payload size) follow from the
    certified columns."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import chunk_payload

    prep(spark)
    docs = catalog.load(spark, sf_dir, "documents")
    payload = attach_binary_payload(docs, "doc_id", "text")
    chunks = chunk_payload(payload, chunk_bytes=CHUNK_BYTES)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_offset",
        "chunk_bytes",
        F.md5("chunk").alias("chunk_md5"),
        "n_chunks",
    )
