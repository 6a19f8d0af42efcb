"""Stable, vectorized 64-bit hashing.

All ids and blocking keys in the engine derive from these functions, so
every run (and every resume) is byte-stable — the determinism requirement
of SURVEY.md §7 ("no wall-clock or randomness inside operators"). The
reference gets stable ids from Senzing's Postgres sequence; we get them
from content hashes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# pandas' SipHash-1-3 with its fixed default key — deterministic across
# processes and platforms; vectorized in C over object/str arrays.
_HASH_KEY = "0123456789123456"

# Mersenne prime 2^61 - 1 for universal hashing (a*x + b mod p) — fits
# products of 61-bit values in uint128-free numpy via Python-int-free
# modular arithmetic on uint64 (we accept the tiny bias of mod on 64-bit
# lanes; see minhash.py).
MERSENNE_P = np.uint64((1 << 61) - 1)


_SALT_KEYS: dict[str, str] = {}


def _salt_key(salt: str) -> str:
    """Derive a 16-char SipHash key from a salt (cached) — hashing with a
    per-salt key gives independent families WITHOUT allocating
    salt-concatenated copies of every input string."""
    k = _SALT_KEYS.get(salt)
    if k is None:
        k = hashlib.sha256(("saltkey:" + salt).encode()).hexdigest()[:16]
        _SALT_KEYS[salt] = k
    return k


def hash_str_array(values, *, salt: str = "") -> np.ndarray:
    """Hash an array-like of strings to uint64, deterministically.

    Vectorized via ``pandas.util.hash_pandas_object`` (SipHash-1-3).
    ``salt`` selects an independent hash family via a derived hash key.
    """
    s = pd.Series(values, dtype="object")
    key = _salt_key(salt) if salt else _HASH_KEY
    out = pd.util.hash_pandas_object(s, index=False, hash_key=key)
    return out.to_numpy(dtype=np.uint64)


def hash_u64_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Combine two uint64 arrays into one (order-sensitive mix).

    A cheap splitmix-style finalizer over ``a * C1 ^ b`` — used to fold a
    band id into a band hash, or to combine column hashes.
    """
    x = (a * np.uint64(0x9E3779B97F4A7C15) + b).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hash_u64_pairs_inplace(acc: np.ndarray, b: np.ndarray,
                           tmp: np.ndarray) -> None:
    """``acc[:] = hash_u64_pairs(acc, b)`` with zero allocations
    (``tmp`` is caller-provided scratch of the same shape/dtype) — the
    rolling-shingle combine otherwise allocates ~4 full-size
    temporaries per round."""
    np.multiply(acc, np.uint64(0x9E3779B97F4A7C15), out=acc)
    np.add(acc, b, out=acc)
    np.right_shift(acc, np.uint64(30), out=tmp)
    np.bitwise_xor(acc, tmp, out=acc)
    np.multiply(acc, np.uint64(0xBF58476D1CE4E5B9), out=acc)
    np.right_shift(acc, np.uint64(27), out=tmp)
    np.bitwise_xor(acc, tmp, out=acc)
    np.multiply(acc, np.uint64(0x94D049BB133111EB), out=acc)
    np.right_shift(acc, np.uint64(31), out=tmp)
    np.bitwise_xor(acc, tmp, out=acc)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array (stateless, vectorized)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def splitmix64_inplace(x: np.ndarray, tmp: np.ndarray) -> None:
    """``x[:] = splitmix64(x)`` with zero allocations (``tmp`` is
    caller-provided same-shape uint64 scratch) — the per-permutation
    MinHash loop otherwise allocates two fresh arrays per permutation."""
    np.add(x, np.uint64(0x9E3779B97F4A7C15), out=x)
    np.right_shift(x, np.uint64(30), out=tmp)
    np.bitwise_xor(x, tmp, out=x)
    np.multiply(x, np.uint64(0xBF58476D1CE4E5B9), out=x)
    np.right_shift(x, np.uint64(27), out=tmp)
    np.bitwise_xor(x, tmp, out=x)
    np.multiply(x, np.uint64(0x94D049BB133111EB), out=x)
    np.right_shift(x, np.uint64(31), out=tmp)
    np.bitwise_xor(x, tmp, out=x)


def node_ids_from_strings(values) -> np.ndarray:
    """Deterministic 63-bit node ids (int64, non-negative) for string
    keys. 63 bits: several shuffle backends round-trip through Python
    ints + int64 Arrow inference, which overflows on uint64. Collision
    odds follow the birthday bound (~n²/2^64) — negligible per pair and
    tolerable in aggregate for dedup semantics; switch to a 128-bit key
    if exact-at-10^10-docs is ever required.
    """
    h = hash_str_array(values, salt="node")
    return (h & np.uint64((1 << 63) - 1)).astype(np.int64)


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.sha256(data).hexdigest()


def stable_rng(seed: int | str) -> np.random.Generator:
    """A numpy Generator seeded deterministically from an int or string."""
    if isinstance(seed, str):
        seed = int.from_bytes(hashlib.sha256(seed.encode()).digest()[:8], "big")
    return np.random.default_rng(np.uint64(seed))
