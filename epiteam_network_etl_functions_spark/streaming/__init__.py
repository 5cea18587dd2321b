"""Structured Streaming variants of the batch operators."""

from .windows import streaming_bucket_counts, streaming_colocation_candidates  # noqa: F401
