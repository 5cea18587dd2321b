"""mapInArrow kernels — Arrow-native batch processing without the
pandas conversion layer.

The engine's Python batch paths are pandas UDFs and mapInPandas
(multimodal decode, Gram partials); ``mapInArrow`` is the third batch
API and the right one when the computation is itself columnar: batches
arrive as ``pyarrow.RecordBatch`` and the pandas materialization (object
boxing for list columns!) is skipped entirely. For a list<float>
embedding column that conversion is the dominant cost — pandas builds a
Python list per row, Arrow keeps the flat values buffer.

The kernel here computes per-vector L2 norms from the ListArray's flat
buffer with one vectorized numpy pass (`np.add.reduceat` over the
offsets — sequential accumulation within each segment, so results match
the JVM left-fold `F.aggregate` form bit-for-bit on the same doubles);
``embedding_norms_arrow`` locks it against the same SQL oracle as the
JVM-side ``embedding_norms``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def l2_norms_arrow(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, label, dim, l2_norm) via mapInArrow. Expects the
    embeddings table layout; norms accumulate in float64."""

    def _batches(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            arr = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(arr, pa.ChunkedArray):  # defensive; batches are flat
                arr = arr.combine_chunks()
            offsets = np.asarray(arr.offsets, dtype=np.int64)
            flat = np.asarray(arr.flatten(), dtype=np.float64)
            # a sliced ListArray's offsets need not start at 0, while
            # flatten() returns only the sliced values — rebase so the
            # segment starts index the flat buffer correctly
            starts = offsets[:-1] - offsets[0]
            dims = offsets[1:] - offsets[:-1]
            sq = flat * flat
            # reduceat returns sq[start] (not 0) for an empty segment and
            # rejects start == len(sq) (empty trailing segment), so reduce
            # only over non-empty segment starts — each such segment runs
            # to the next non-empty start, and intervening empty segments
            # contribute nothing — then scatter back, leaving empties at 0
            nonempty = dims > 0
            sums = np.zeros(len(dims))
            if len(flat) and nonempty.any():
                sums[nonempty] = np.add.reduceat(sq, starts[nonempty])
            yield pa.record_batch(
                [
                    batch.column(batch.schema.get_field_index("vec_id")),
                    batch.column(batch.schema.get_field_index("label")),
                    pa.array(dims, type=pa.int64()),
                    pa.array(np.round(np.sqrt(sums), 6), type=pa.float64()),
                ],
                names=["vec_id", "label", "dim", "l2_norm"],
            )

    return df.mapInArrow(
        _batches, "vec_id long, label int, dim long, l2_norm double"
    )
