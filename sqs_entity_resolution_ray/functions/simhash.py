"""64-bit SimHash + Hamming distance, vectorized over flat shingle arrays."""

from __future__ import annotations

import numpy as np

_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash_from_shingles(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash ``uint64[n]`` of each doc's shingle-hash multiset.

    Bit ``j`` of the simhash is 1 iff more than half the doc's shingle
    hashes have bit ``j`` set. Vectorized: unpack all hashes to a bit
    matrix once, per-doc bit sums via ``np.add.reduceat``.
    """
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # (N, 64) bit matrix, little-endian byte order of the uint64 view
    as_bytes = flat.astype("<u8").view(np.uint8).reshape(-1, 8)
    bits = np.unpackbits(as_bytes, axis=1, bitorder="little")  # (N, 64)
    starts = offsets[:-1]
    sums = np.add.reduceat(bits.astype(np.int32), starts, axis=0)  # (n, 64)
    lens = np.diff(offsets).reshape(-1, 1)
    bitset = (sums * 2 > lens).astype(np.uint8)  # (n, 64)
    packed = np.packbits(bitset, axis=1, bitorder="little")  # (n, 8)
    return packed.view("<u8").reshape(-1).astype(np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between two uint64 arrays → uint8[n]."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    by = x.astype("<u8").view(np.uint8).reshape(-1, 8)
    return _POPCOUNT_TABLE[by].sum(axis=1).astype(np.uint8)
