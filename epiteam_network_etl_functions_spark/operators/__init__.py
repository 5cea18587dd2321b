"""Pure DataFrame-in -> DataFrame-out operator kernels (SURVEY.md §2)."""

from .timebucket import with_time_bucket  # noqa: F401
from .winners import top1_per_key, category_winner  # noqa: F401
from .colocation import colocation_pairs, colocation_edges  # noqa: F401
from .contacts import (  # noqa: F401
    group_sizes,
    total_contacts,
    observed_contacts,
    total_vs_observed,
    contact_probs,
)
