"""Structured Streaming variants of the batch operators."""

from .dedup import streaming_exact_dedup  # noqa: F401
from .windows import (  # noqa: F401
    streaming_bucket_counts,
    streaming_colocation_candidates,
    streaming_colocation_left,
    streaming_colocation_pairs,
    streaming_enrich,
)
