"""Shared literals.

The reference uses zero-string sentinels instead of NULL at interface
boundaries (SURVEY.md §1.3): 15-char for a missing home H3 cell
(ntl_queries.py:59) and 13-char for a missing home AGEB
(localization_transforms.py:73, IndexingHomeAgebs.py:122-123). Centralized
here (SURVEY.md §7 "sentinel zoo").
"""

SENTINEL_H3_15 = "0" * 15
SENTINEL_AGEB_13 = "0" * 13

# Reference bucket width: TIME_BUCKET(INTERVAL '600 seconds', ...)
# (interaction_queries.py:17)
DEFAULT_BUCKET_SECONDS = 600

# Reference night window: hour >= 22 OR hour < 6 (ntl_queries.py:109)
NIGHT_START_HOUR = 22
NIGHT_END_HOUR = 6
