"""String-similarity kernels: Jaro-Winkler, bounded Levenshtein, Jaccard.

Used by the pair scorer for SHORT fields (titles, names, urls) — long
texts are compared via MinHash/SimHash sketches, never edit distance.
Pure Python per pair (strings are ≤ ~100 chars) with batch wrappers.
"""

from __future__ import annotations

import numpy as np


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def levenshtein(a: str, b: str, max_dist: int | None = None) -> int:
    """Edit distance with optional early-exit bound (returns max_dist+1
    when the true distance exceeds ``max_dist``)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if max_dist is not None and lb - la > max_dist:
        return max_dist + 1
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        cb = b[j - 1]
        row_min = j
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == cb else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            if cur[i] < row_min:
                row_min = cur[i]
        if max_dist is not None and row_min > max_dist:
            return max_dist + 1
        prev = cur
    return prev[la]


def levenshtein_ratio(a: str, b: str) -> float:
    n = max(len(a), len(b))
    if n == 0:
        return 1.0
    return 1.0 - levenshtein(a, b) / n


def token_jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def batch_jaro_winkler(a_list, b_list) -> np.ndarray:
    return np.fromiter(
        (jaro_winkler(x or "", y or "") for x, y in zip(a_list, b_list)),
        dtype=np.float64,
        count=len(a_list),
    )


def batch_levenshtein_ratio(a_list, b_list) -> np.ndarray:
    return np.fromiter(
        (levenshtein_ratio(x or "", y or "") for x, y in zip(a_list, b_list)),
        dtype=np.float64,
        count=len(a_list),
    )
