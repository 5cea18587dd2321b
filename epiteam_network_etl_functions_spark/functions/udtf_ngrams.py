"""Spark 4 Python UDTF surface: a lateral n-gram expander.

The reference exposes row-expanding transforms only as pandas loops
(src/transforms/ntl_transforms.py row-wise handlers); Spark's modern
equivalent API surface is the Python UDTF (one input row -> N output
rows, usable lateral in SQL). This module exists to keep that API
covered and differential-locked — the PRODUCTION path for n-gram
expansion stays the JVM-side explode/transform kernel
(workload/text.py shingles, analytics12 lang_char_trigram_head):
a Python UDTF pays the Python-worker round trip per batch and should
only host logic that genuinely cannot be expressed with built-ins.

Registered as ``word_ngrams(text, n)`` via :func:`register_ngram_udtf`;
``tests/test_udtf_ngrams.py`` locks it against the explode kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, ngram: string")
class WordNgrams:
    """Emit (pos, ngram) for every word n-gram of a whitespace-
    tokenized text; 0-based position, words joined by a single space."""

    def eval(self, text: str, n: int):  # noqa: A002 - UDTF contract
        if text is None or n is None or n <= 0:
            return
        words = [w for w in text.split(" ") if w]
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


def register_ngram_udtf(spark: SparkSession, name: str = "word_ngrams") -> None:
    """Make the UDTF callable from SQL: ``SELECT * FROM
    word_ngrams('a b c', 2)`` or LATERAL against a table column."""
    spark.udtf.register(name, WordNgrams)


def ngrams_via_kernel(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """The JVM-side equivalent (explode over a transform window) the
    UDTF is differential-tested against — and the form production code
    should use."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    # sequence(0, k) counts DOWN when k < 0 (it never returns empty), so
    # short texts must short-circuit to an empty array before explode.
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(words, i + 1, n), " ").alias("ngram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,ngram:string>>"))
    return df.select(F.explode(grams).alias("g")).select(
        F.col("g.pos").alias("pos"), F.col("g.ngram").alias("ngram")
    )
