"""Mergeable sketches — the 100-TB path for cardinality and quantiles.

The exact operators (``Dataset.unique``, ``agg.group_quantiles``) need a
full shuffle of the keyed values; at petabyte scale the right trade is a
fixed-size mergeable summary computed per batch (combiner), merged
associatively — shuffle volume becomes O(sketch × partitions),
independent of row count. Two classics, both vectorized numpy:

- :func:`approx_distinct` — HyperLogLog (Flajolet et al. 2007, public
  algorithm): 2^p max-rank registers, harmonic-mean estimator with the
  standard small-range correction. Relative error ≈ 1.04/sqrt(2^p)
  (~3.2% at p=10).
- :func:`digest_quantiles` — a t-digest-style centroid summary (Dunning
  & Ertl 2019, public algorithm, simplified): per batch the sorted
  values compress into ≤C equal-weight (mean, weight) centroids;
  merging concatenates + re-compresses; quantiles interpolate the
  cumulative-weight curve. Mid-quantile error is O(1/C) in rank.

Both are deterministic for a given input multiset (hashing is seeded
SipHash; compression is rank-based), so tests can pin tolerances.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_HLL_P = 10                      # 2^10 = 1024 registers, ±3.2%
_HLL_M = 1 << _HLL_P


def _hll_registers(values: pd.Series) -> np.ndarray:
    """Max leading-zero-rank register array for a value series."""
    h = pd.util.hash_pandas_object(values, index=False).to_numpy(
        dtype=np.uint64, copy=False
    )
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    # rank = position of the highest set bit from the top, 1-based
    # (number of leading zeros in the remaining 64-p bits, +1)
    nbits = 64
    lz = np.full(len(rest), nbits, dtype=np.int64)
    nz = rest != 0
    # log2 on uint64 via float is exact for the high bit position
    top = np.zeros(len(rest), dtype=np.int64)
    # clip to 63: float64 rounding can push log2 of values near 2^64 to
    # exactly 64, which would yield a bogus negative leading-zero count
    top[nz] = np.minimum(
        np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64), 63
    )
    lz[nz] = nbits - 1 - top[nz]
    rank = (lz + 1).clip(max=64 - _HLL_P + 1)
    regs = np.zeros(_HLL_M, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)      # linear counting, small range
    return float(est)


def approx_distinct(ds: rd.Dataset, col: str) -> int:
    """Approximate COUNT(DISTINCT col): one 1 KiB register blob per
    batch crosses the wire; merge is an elementwise max on the driver
    (partials are tiny — number-of-blocks × 1 KiB)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_registers(batch[col]) if len(batch) else np.zeros(
            _HLL_M, dtype=np.int8)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    blobs = ds.map_batches(partial, batch_format="pandas").take_all()
    merged = np.zeros(_HLL_M, dtype=np.int8)
    for row in blobs:
        merged = np.maximum(merged, np.frombuffer(row["regs"], dtype=np.int8))
    return int(round(_hll_estimate(merged)))


def _compress(means: np.ndarray, weights: np.ndarray, c: int):
    """Equal-rank-weight compression of weight-sorted centroids to ≤c."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    if len(means) <= c or total == 0:
        return means, weights
    # bucket by cumulative weight: centroid i -> floor(cum_before / (total/c))
    cum = np.cumsum(weights) - weights
    bucket = np.minimum((cum / (total / c)).astype(np.int64), c - 1)
    # reduce per bucket (buckets are sorted: use reduceat)
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    w = np.add.reduceat(weights, starts)
    m = np.add.reduceat(means * weights, starts) / w
    return m, w


class QuantileDigest:
    """Mergeable centroid summary. ``compression`` = max centroids."""

    def __init__(self, compression: int = 256):
        self.c = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = np.inf
        self.max = -np.inf

    def add(self, values: np.ndarray) -> "QuantileDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self.min = min(self.min, float(v.min()))
            self.max = max(self.max, float(v.max()))
            self.means = np.concatenate([self.means, np.sort(v)])
            self.weights = np.concatenate(
                [self.weights, np.ones(len(v), dtype=np.float64)])
            self.means, self.weights = _compress(
                self.means, self.weights, self.c)
        return self

    def merge(self, other: "QuantileDigest") -> "QuantileDigest":
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.means, self.weights = _compress(self.means, self.weights, self.c)
        return self

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if q <= 0:
            return self.min
        if q >= 1:
            return self.max
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        xp = np.r_[0.0, cum, self.weights.sum()]
        fp = np.r_[self.min, self.means, self.max]
        return float(np.interp(target, xp, fp))

    def to_bytes(self) -> bytes:
        head = np.array([self.min, self.max], dtype=np.float64)
        return np.concatenate([head, self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, compression: int = 256):
        arr = np.frombuffer(blob, dtype=np.float64)
        d = cls(compression)
        d.min, d.max = float(arr[0]), float(arr[1])
        n = (len(arr) - 2) // 2
        d.means = arr[2:2 + n].copy()
        d.weights = arr[2 + n:].copy()
        return d


def digest_quantiles(
    ds: rd.Dataset,
    keys: list[str],
    value_col: str,
    quantiles: dict[str, float],
    compression: int = 256,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Approximate per-group quantiles with bounded memory per group:
    per-batch digests (combiner — ≤``compression`` centroids per key per
    batch cross the shuffle), single-int-key bucket shuffle, associative
    merge per group. The any-cardinality / any-group-size counterpart of
    :func:`..stages.agg.group_quantiles`."""
    keys = list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in batch.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            d = QuantileDigest(compression).add(g[value_col].to_numpy())
            rows.append(dict(zip(keys, kv), digest=d.to_bytes()))
        out = pd.DataFrame(rows, columns=keys + ["digest"])
        key_hash = pd.util.hash_pandas_object(out[keys], index=False)
        out["part"] = (key_hash % np.uint64(num_partitions)).astype(np.int64)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in group.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            d = QuantileDigest(compression)
            for blob in g["digest"]:
                d.merge(QuantileDigest.from_bytes(blob, compression))
            row = dict(zip(keys, kv))
            for out_col, q in quantiles.items():
                row[out_col] = d.quantile(q)
            rows.append(row)
        return pd.DataFrame(rows, columns=keys + list(quantiles))

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("part", num_partitions=num_partitions).map_groups(
        final, batch_format="pandas"
    )
