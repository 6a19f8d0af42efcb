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
    lens = np.diff(offsets)
    out = np.zeros(n, dtype=np.uint64)
    # cache-blocked like minhash_signatures: 64 bit-passes over one
    # L2-resident chunk at a time
    chunk_target = 48 * 1024
    d0 = 0
    while d0 < n:
        d1 = d0
        while d1 < n and offsets[d1 + 1] - offsets[d0] <= chunk_target:
            d1 += 1
        d1 = max(d1, d0 + 1)
        seg = flat[offsets[d0]:offsets[d1]]
        seg_starts = (offsets[d0:d1] - offsets[d0])
        seg_lens = lens[d0:d1]
        for b in range(64):
            bits = ((seg >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
            s = np.add.reduceat(bits, seg_starts)
            out[d0:d1] |= (s * 2 > seg_lens).astype(np.uint64) << np.uint64(b)
        d0 = d1
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between two uint64 arrays → uint8[n]."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    by = x.astype("<u8").view(np.uint8).reshape(-1, 8)
    return _POPCOUNT_TABLE[by].sum(axis=1).astype(np.uint8)
