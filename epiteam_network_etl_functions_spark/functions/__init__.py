"""Vectorized (pandas UDF) function layer — the only Python-row code."""

from .hexgrid import (  # noqa: F401
    HAVE_H3,
    cell_of,
    cell_centroid,
    grid_distance,
    k_ring,
)
