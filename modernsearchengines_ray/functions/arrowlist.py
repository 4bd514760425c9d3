"""Offset-safe readers for Arrow list<T> columns.

``ListArray.values`` returns the UNSLICED child array: when Ray slices
a block into batches (``batch_size`` smaller than the block, the normal
case at scale) the array carries a nonzero slice offset and
``values``-based reshapes misalign or raise.  ``flatten()`` applies the
offset, so every matrix/flat read in the engine goes through here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_values(column: pa.ChunkedArray | pa.Array) -> pa.Array:
    """The flattened (offset-applied) child values of a list column."""
    arr = column
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.flatten()


def list_matrix(column: pa.ChunkedArray | pa.Array, num_rows: int,
                dtype=np.float64) -> np.ndarray:
    """list<float> column -> (num_rows, dim) numpy matrix, offset-safe.

    Requires fixed-length rows (embedding columns); raises on ragged
    input via the reshape."""
    flat = list_values(column).to_numpy(zero_copy_only=False).astype(dtype)
    if num_rows == 0:
        return flat.reshape(0, 0)
    return flat.reshape(num_rows, -1)
