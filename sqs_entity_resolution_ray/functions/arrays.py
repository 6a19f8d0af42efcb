"""Arrow ↔ numpy array helpers (zero-copy where the layout allows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_matrix(col, dtype=np.float32) -> np.ndarray:
    """An Arrow ``list<float>`` / ``fixed_size_list<float>`` column →
    (n, dim) numpy matrix WITHOUT a Python list-of-lists round-trip.

    ``flatten()`` respects slice offsets and null/list offsets, so the
    value buffer is reused (one dtype cast at most). Falls back to
    ``to_pylist`` only for ragged rows (never the embedding-table case,
    where dim is constant)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(flat, dtype=dtype).reshape(n, -1)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if (widths == widths[0]).all() and arr.null_count == 0:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(flat, dtype=dtype).reshape(n, -1)
    return np.asarray(arr.to_pylist(), dtype=dtype)  # ragged fallback
