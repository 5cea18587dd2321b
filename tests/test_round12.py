"""Round-12 regression tests for the ADVICE r11 fixes.

1. ``footer_stats_content_parity`` must be invariant to the number of
   row groups per file (it aggregates per (table, column) over row
   groups; a single-row-group assumption would break at larger SFs).
2. ``l2_norms_arrow`` must handle empty list segments (reduceat returns
   sq[start], not 0, for an empty segment) and sliced ListArray offsets
   (offsets[0] != 0 misaligns against the flattened values buffer).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# footer_stats_content_parity: row-group-count invariance
# ---------------------------------------------------------------------------


def test_footer_parity_rowgroup_invariant(spark, tmp_path):
    import pyarrow.parquet as pq

    from epiteam_network_etl_functions_spark.workload.analytics16 import (
        footer_stats_content_parity,
    )

    # Rewrite the four audited tables into a sibling dir with tiny row
    # groups (many per file) and compare against the original result.
    multi = str(tmp_path / "multi_rg")
    os.makedirs(multi)
    for t in ("customer", "events", "lineitem", "orders"):
        src = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.write_table(
            src, os.path.join(multi, f"{t}.parquet"), row_group_size=100
        )
        meta = pq.ParquetFile(os.path.join(multi, f"{t}.parquet")).metadata
        assert meta.num_row_groups > 1, t

    base = {
        tuple(r)
        for r in footer_stats_content_parity(spark, SF_DIR).collect()
    }
    rewritten = {
        tuple(r) for r in footer_stats_content_parity(spark, multi).collect()
    }
    assert base == rewritten
    assert len(base) > 0


# ---------------------------------------------------------------------------
# l2_norms_arrow: empty segments and rebased offsets
# ---------------------------------------------------------------------------


def test_arrow_norms_empty_vectors(spark):
    from epiteam_network_etl_functions_spark.operators.arrow_kernels import (
        l2_norms_arrow,
    )

    rows = [
        (1, 0, [3.0, 4.0]),
        (2, 0, []),  # empty segment: norm must be 0, not sq[start]
        (3, 1, [5.0]),
        (4, 1, []),  # second empty segment, mid-batch
        (5, 2, [1.0, 2.0, 2.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    ).coalesce(1)
    got = {
        r["vec_id"]: (r["dim"], r["l2_norm"])
        for r in l2_norms_arrow(df).collect()
    }
    assert got == {
        1: (2, 5.0),
        2: (0, 0.0),
        3: (1, 5.0),
        4: (0, 0.0),
        5: (3, 3.0),
    }


def test_arrow_norms_trailing_empty_vector(spark):
    # trailing empty list: its reduceat start index == len(values),
    # which would raise without the clip
    from epiteam_network_etl_functions_spark.operators.arrow_kernels import (
        l2_norms_arrow,
    )

    df = spark.createDataFrame(
        [(1, 0, [6.0, 8.0]), (2, 0, [])],
        "vec_id long, label int, embedding array<float>",
    ).coalesce(1)
    got = {
        r["vec_id"]: (r["dim"], r["l2_norm"])
        for r in l2_norms_arrow(df).collect()
    }
    assert got == {1: (2, 10.0), 2: (0, 0.0)}


def test_reduceat_kernel_sliced_offsets():
    # Exercise the rebase directly on a sliced pyarrow ListArray, whose
    # offsets do not start at 0 while flatten() returns only the slice.
    import numpy as np
    import pyarrow as pa

    full = pa.array(
        [[1.0, 1.0], [3.0, 4.0], [], [6.0, 8.0], []],
        type=pa.list_(pa.float32()),
    )
    arr = full.slice(1, 4)  # offsets[0] == 2, not 0; trailing empty
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    assert offsets[0] != 0
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    starts = offsets[:-1] - offsets[0]
    dims = offsets[1:] - offsets[:-1]
    sq = flat * flat
    nonempty = dims > 0
    sums = np.zeros(len(dims))
    if len(flat) and nonempty.any():
        sums[nonempty] = np.add.reduceat(sq, starts[nonempty])
    norms = np.sqrt(sums)
    assert norms.tolist() == [5.0, 0.0, 10.0, 0.0]


def test_arrow_norms_still_match_oracle_table(spark):
    from epiteam_network_etl_functions_spark import catalog
    from epiteam_network_etl_functions_spark.operators.arrow_kernels import (
        l2_norms_arrow,
    )
    from epiteam_network_etl_functions_spark.operators.similarity import (
        as_double,
        l2_norm,
    )

    e = catalog.load(spark, SF_DIR, "embeddings")
    arrow = l2_norms_arrow(e)
    jvm = e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm(as_double(F.col("embedding"))), 6).alias("l2_norm"),
    )
    assert arrow.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(arrow).count() == 0
