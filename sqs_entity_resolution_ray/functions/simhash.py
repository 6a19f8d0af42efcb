"""64-bit SimHash + Hamming distance, vectorized over flat shingle arrays."""

from __future__ import annotations

import numpy as np

_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash_from_shingles(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash ``uint64[n]`` of each doc's shingle-hash multiset.

    Bit ``j`` of the simhash is 1 iff more than half the doc's shingle
    hashes have bit ``j`` set. 64 flat vectorized passes (shift + mask +
    ``np.add.reduceat`` on a contiguous 1-D array) — ~30× faster than
    the bit-matrix + axis-0 reduceat formulation (strided access).
    """
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    starts = offsets[:-1]
    lens = np.diff(offsets)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        bits = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
        s = np.add.reduceat(bits, starts)
        out |= (s * 2 > lens).astype(np.uint64) << np.uint64(b)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between two uint64 arrays → uint8[n]."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    by = x.astype("<u8").view(np.uint8).reshape(-1, 8)
    return _POPCOUNT_TABLE[by].sum(axis=1).astype(np.uint8)
