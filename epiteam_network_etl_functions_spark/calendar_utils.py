"""Date-window helpers (reference DateUtils.py:7-43 semantics).

Pure Python — these produce the partition predicates that drive Catalyst
partition pruning (the reference built `month=/day=` paths by hand instead;
SURVEY.md §4 row 1).
"""

from __future__ import annotations

import datetime as dt

# The reference hard-clamps its horizon to the study years
# (DateUtils.py:17-18; context.py:62-63 exits on invalid year).
CLAMP_MIN = dt.date(2020, 1, 1)
CLAMP_MAX = dt.date(2022, 12, 31)


def _clamp(d: dt.date) -> dt.date:
    return min(max(d, CLAMP_MIN), CLAMP_MAX)


def trusted_range(day: str | dt.date, radius: int = 5) -> list[str]:
    """±radius-day window around a date, clamped to the study horizon
    (DateUtils.py:7-23 'trusted range'). Returns ISO date strings suitable
    for `.isin(...)` partition predicates."""
    d = dt.date.fromisoformat(day) if isinstance(day, str) else day
    lo, hi = _clamp(d - dt.timedelta(days=radius)), _clamp(d + dt.timedelta(days=radius))
    out = []
    cur = lo
    while cur <= hi:
        out.append(cur.isoformat())
        cur += dt.timedelta(days=1)
    return out


def last_n_days(day: str | dt.date, n: int = 15) -> list[str]:
    """The n dates ending at `day` inclusive (DateUtils.py:33-36
    get_last_dates — the home-inference look-back window), clamped."""
    d = dt.date.fromisoformat(day) if isinstance(day, str) else day
    out = []
    for i in range(n):
        cur = d - dt.timedelta(days=i)
        if CLAMP_MIN <= cur <= CLAMP_MAX:
            out.append(cur.isoformat())
    return sorted(out)


def ymd_parts(day: str | dt.date) -> tuple[str, str, str]:
    """Zero-padded (year, month, day) partition values
    (IndexingHomeAgebs.py:124-126 RIGHT(CONCAT('0', ...), 2) idiom)."""
    d = dt.date.fromisoformat(day) if isinstance(day, str) else day
    return f"{d.year:04d}", f"{d.month:02d}", f"{d.day:02d}"
