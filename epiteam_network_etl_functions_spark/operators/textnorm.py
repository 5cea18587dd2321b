"""Text normalization for raw corpora (training-pipeline cleaning stage).

Arrow-vectorized pandas UDF — unicode work (NFKC, accent folding, control
stripping) has no JVM built-in equivalent, so this is a legitimate
Python-batch operator. Keep it in one projection per stage (codegen
barrier), and normalize BEFORE tokenize/shingle so dedup keys are stable
across encodings of the same text.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _clean_one(s: str | None) -> str | None:
    if s is None:
        return None
    # NFKC folds width/compatibility forms; NFD+strip-Mn removes accents.
    s = unicodedata.normalize("NFKC", s)
    s = "".join(
        c
        for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn" and (c.isprintable() or c.isspace())
    )
    return " ".join(s.lower().split())


@F.pandas_udf(T.StringType())
def _clean_udf(text: pd.Series) -> pd.Series:
    return text.map(_clean_one)


def normalize_text(df: DataFrame, text_col: str, out_col: str = "text_norm") -> DataFrame:
    """Add a normalized text column: NFKC + accent folding + control-char
    removal + lowercase + whitespace collapse."""
    return df.withColumn(out_col, _clean_udf(F.col(text_col)))


def normalized_key(text_col: str) -> Column:
    """Digest of normalized text — the exact-dedup key raw corpora should
    group on (composes with dedup.exact_dedup_groups)."""
    return F.md5(_clean_udf(F.col(text_col)).cast("binary"))
