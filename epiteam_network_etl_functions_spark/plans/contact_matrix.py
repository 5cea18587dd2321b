"""End-to-end contact-matrix pipeline (reference §3.1 NetworkBuilder staging):
pings -> presence -> sizes/total -> observed -> total-vs-observed -> dense
probability matrix -> (optionally) SBM network.

Stage boundaries that the reference materializes to `side_results/` parquet
(NetworkBuilder.py:120,151,209,260) are kept as *optional* checkpoints —
they are the pipeline's restart points, not a memory crutch (Spark spills
shuffles on its own).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..operators.colocation import colocation_pairs
from ..operators.contacts import (
    contact_probs,
    group_sizes,
    observed_contacts,
    total_contacts,
    total_vs_observed,
)
from ..operators.timebucket import with_time_bucket
from ..sources.io import checkpoint as ckpt


def contact_prob_table(
    pings: DataFrame,
    homes: DataFrame,
    id_col: str = "caid",
    cell_col: str = "h3index_15",
    ts_col: str = "cdmx_datetime",
    home_col: str = "home_ageb",
    bucket_seconds: int = 600,
    checkpoint_dir: str | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Long-form (a_block, b_block, total_pairs, observed, prob) table —
    the full NetworkBuilder get_tables() flow as one lazy DAG. Pass a
    precomputed ``pairs`` table to reuse the co-location join output
    across consumers (the widest shuffle in the product)."""
    if pairs is None:
        b = with_time_bucket(pings, ts_col, bucket_seconds)
        pairs = colocation_pairs(b, id_col=id_col, cell_col=cell_col, tw_col="tw")
    if checkpoint_dir:
        pairs = ckpt(pairs, f"{checkpoint_dir}/pairs")
    homes = homes.localCheckpoint()  # feeds sizes + both endpoint attaches
    sizes = group_sizes(homes, block_col=home_col, id_col=id_col)
    total = total_contacts(sizes, block_col=home_col)
    obs = observed_contacts(
        pairs,
        homes,
        pair_a=f"a_{id_col}",
        pair_b=f"b_{id_col}",
        home_key=id_col,
        home_val=home_col,
    )
    tvo = total_vs_observed(total, obs, f"a_{home_col}", f"b_{home_col}")
    return contact_probs(tvo, f"a_{home_col}", f"b_{home_col}")


def probs_to_matrix(probs: DataFrame, a_col: str, b_col: str) -> tuple[list, np.ndarray]:
    """Dense numpy matrix from the long table (NetworkBuilder.py:286-325
    pivot -> .npy). The matrix is n_blocks² — driver-sized by construction.
    Returns (sorted block labels, matrix)."""
    rows = probs.select(a_col, b_col, "prob").collect()
    labels = sorted({r[a_col] for r in rows} | {r[b_col] for r in rows})
    idx = {b: i for i, b in enumerate(labels)}
    m = np.zeros((len(labels), len(labels)))
    for r in rows:
        m[idx[r[a_col]], idx[r[b_col]]] = r["prob"]
    return labels, m
