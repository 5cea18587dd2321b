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
