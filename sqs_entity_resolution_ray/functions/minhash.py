"""Vectorized MinHash over token shingles.

This is the engine's candidate-generation primitive — the distributed
replacement for Senzing's shared candidate index in Postgres (reference
behavior implied by MATCH_KEYs in ``test/fixtures/flow-output.jsonl``;
SURVEY.md §2.4 J2). Everything is numpy over flat arrays + offsets; no
per-row Python in the hot path beyond tokenization itself.

Permutations are true 64-bit bijections: ``x -> splitmix64(x ^ r_i)``
(splitmix64 is invertible), so ``min`` over the permuted shingle set is a
proper MinHash and ``P(sig_a[i] == sig_b[i]) = Jaccard(A, B)``.
"""

from __future__ import annotations

import numpy as np

from .hashing import (hash_str_array, hash_u64_pairs,
                      hash_u64_pairs_inplace, splitmix64,
                      splitmix64_inplace, stable_rng)
from .textnorm import tokenize

# ---- vectorized byte-level tokenizer + rolling hash -----------------------
#
# Tokenizing to Python strings allocates ~1.5k objects per web page —
# the dominant memory-bandwidth cost when 32 cores sketch concurrently.
# Instead: casefold once per DOC, then find \w+ runs and hash them with
# a positional polynomial over the raw bytes, fully vectorized.
#
# Polynomial prefix hashes are a sequential recurrence H[i+1]=H[i]·B+a[i],
# but B is odd ⇒ invertible mod 2^64, giving the closed form
#   token_hash(s,e) = B^e · (S[e] − S[s]),  S[n] = Σ_{i<n} a[i]·B^{-(i+1)}
# which is one cumsum + two gathers. A splitmix64 finalizer fixes the
# polynomial hash's weak high bits before MinHash consumes it.

_B = np.uint64(0x9E3779B97F4A7C15 | 1)           # odd multiplier
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))     # modular inverse
# word bytes: a-z 0-9 _ plus all >=0x80 (UTF-8 sequences stay in-token)
_WORD_BYTE = np.zeros(256, dtype=bool)
for _c in range(ord("a"), ord("z") + 1):
    _WORD_BYTE[_c] = True
for _c in range(ord("0"), ord("9") + 1):
    _WORD_BYTE[_c] = True
_WORD_BYTE[ord("_")] = True
_WORD_BYTE[0x80:] = True


def _pow_series(base: np.uint64, n: int, out: np.ndarray | None = None) -> np.ndarray:
    """base^(i+1) for i in 0..n-1 (mod 2^64), O(log n) vectorized doubling.

    np.multiply.accumulate on uint64 runs a scalar inner loop (~180x slower
    than batched multiplies at n=2e6, measured); each doubling pass copies
    the filled prefix scaled by its last element, so source [0, end-step)
    and dest [step, end) never overlap.
    """
    p = out if out is not None else np.empty(n, dtype=np.uint64)
    if n == 0:
        return p
    p[0] = base
    step = 1
    while step < n:
        end = min(2 * step, n)
        np.multiply(p[: end - step], p[step - 1], out=p[step:end])
        step = end
    return p


# reusable per-process scratch: the hot path otherwise allocates ~50
# bytes of fresh uint64 temporaries per input byte — large numpy allocs
# are mmap'd and munmap'd every call (kernel page-fault churn, measured
# 60x first-call inflation under host memory pressure), and the dense
# temporaries stream DRAM instead of staying cache-resident. Workers
# execute one map_batches task at a time, so a module-level scratch is
# safe per process.
_SCRATCH: dict[str, np.ndarray] = {}

# joined-text chunk target: all per-byte temporaries (~50 B/byte) for a
# 256 KB chunk fit in a per-core L2, so DRAM sees only the input bytes
# and the per-token outputs even with 32 concurrent workers
_CHUNK_BYTES = 256 * 1024


def _scratch(name: str, size: int, dtype) -> np.ndarray:
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < size:
        buf = np.empty(max(size, _CHUNK_BYTES + 2), dtype=dtype)
        _SCRATCH[name] = buf
    return buf[:size]


def _pow_cached(name: str, base: np.uint64, n: int) -> np.ndarray:
    """``base^(i+1)`` for i in 0..n-1, served from a per-process cache —
    the series depends only on POSITION, not data, so recomputing it per
    chunk (two ``_pow_series`` builds ≈ 4 full passes over the chunk)
    is pure waste. Callers must treat the slice as read-only."""
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < n:
        buf = _pow_series(base, max(n, _CHUNK_BYTES + 2))
        _SCRATCH[name] = buf
    return buf[:n]


def _token_hashes_chunk(bufs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Token hashes + per-doc counts for one doc-group chunk.

    The polynomial closed form ``B^e · (S[e] − S[s])`` telescopes to
    content-relative weights, so hashes are independent of absolute
    position — chunking by doc groups is exact."""
    nb = len(bufs)
    # single space separators force token breaks at doc boundaries
    joined = b" ".join(bufs) + b" "
    arr = np.frombuffer(joined, dtype=np.uint8)
    N = len(arr)
    mask = _scratch("mask", N, bool)
    np.take(_WORD_BYTE, arr, out=mask)
    m8 = _scratch("m8", N, np.int8)
    np.copyto(m8, mask)
    d = _scratch("d", N - 1, np.int8)
    np.subtract(m8[1:], m8[:-1], out=d)
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if mask[0]:
        starts = np.concatenate(([0], starts))
    # trailing space guarantees mask[-1] is False → ends covers all runs

    # prefix machinery: S[i] = sum_{j<i} (a[j]+1) * BINV^(j+1)
    binv_pows = _pow_cached("binv", _BINV, N)             # BINV^(i+1)
    b_pows1 = _pow_cached("bpow", _B, N)                  # B^(i+1)
    terms = _scratch("terms", N, np.uint64)
    np.copyto(terms, arr)                                 # u8 → u64 cast
    np.add(terms, np.uint64(1), out=terms)
    np.multiply(terms, binv_pows, out=terms)
    S = _scratch("S", N + 1, np.uint64)
    S[0] = np.uint64(0)
    np.cumsum(terms, out=S[1:])                           # wraps mod 2^64
    # B^e = b_pows1[e-1]; every run end is ≥ 1 by construction
    tok_hash = splitmix64(b_pows1[ends - 1] * (S[ends] - S[starts]))

    # doc ownership of each token: doc d spans bytes
    # [doc_start[d], doc_start[d] + len(bufs[d]))
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=nb)
    doc_starts = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=doc_starts[1:])               # +1 separators
    doc_of_token = np.searchsorted(doc_starts[1:], starts, side="right")
    tok_counts = np.bincount(doc_of_token, minlength=nb).astype(np.int64)
    return tok_hash, tok_counts


def token_hashes_from_texts(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray]:
    """64-bit hash per \\w+ token of each casefolded text, vectorized.

    Returns ``(flat_token_hashes: uint64[N], tok_counts: int64[n])``.
    The only per-doc Python work is ``casefold().encode()``. Processes
    doc groups in L2-sized chunks over reused scratch buffers (see
    ``_SCRATCH``); results are byte-identical to a single-pass run.
    """
    n = len(texts)
    bufs = [(t or "").casefold().encode("utf-8") for t in texts]
    tok_counts = np.zeros(n, dtype=np.int64)
    th_parts: list[np.ndarray] = []
    d0 = 0
    while d0 < n:
        d1, size = d0, 0
        while d1 < n and (size == 0 or size + len(bufs[d1]) + 1
                          <= _CHUNK_BYTES):
            size += len(bufs[d1]) + 1
            d1 += 1
        th, counts = _token_hashes_chunk(bufs[d0:d1])
        th_parts.append(th)
        tok_counts[d0:d1] = counts
        d0 = d1
    if not th_parts:
        return np.empty(0, dtype=np.uint64), tok_counts
    return np.concatenate(th_parts), tok_counts


def shingle_doc_hashes(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hash the k-token shingles of every text in one vectorized pass.

    Returns ``(flat_shingle_hashes: uint64[N], offsets: int64[n+1])`` where
    doc ``d`` owns ``flat[offsets[d]:offsets[d+1]]``. A doc with fewer than
    ``k`` tokens contributes a single shingle: the hash of its full
    normalized token string (so empty/short docs still participate).
    """
    n = len(texts)
    th, tok_counts = token_hashes_from_texts(texts)

    out_chunks: list[np.ndarray] = []
    counts = np.zeros(n, dtype=np.int64)

    if len(th):
        total = len(th)
        if total >= k:
            # rolling combine of k consecutive token hashes over the flat
            # array (in-place over scratch — no per-round temporaries);
            # then mask out windows that cross a doc boundary
            m = total - k + 1
            acc = _scratch("sh_acc", m, np.uint64)
            np.copyto(acc, th[:m])
            tmp = _scratch("sh_tmp", m, np.uint64)
            for j in range(1, k):
                hash_u64_pairs_inplace(acc, th[j : m + j], tmp)
            # window starting at token p is valid iff it stays inside one
            # doc, i.e. p ∈ [tok_off[d], tok_off[d] + max(t_d-k+1, 0)) —
            # counts are closed-form and the mask is a delta-cumsum over
            # DISJOINT runs (for k ≥ 2 a run end precedes the next start
            # by k-1 ≥ 1, so plain assignment is collision-free). This
            # replaces the former O(m) pos_doc repeat + compare + bincount.
            counts = np.maximum(tok_counts - (k - 1), 0)
            if k == 1:
                sh = acc.copy()  # every window valid; copy off scratch
            else:
                tok_off = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(tok_counts, out=tok_off[1:])
                nz = np.flatnonzero(counts)
                delta = _scratch("sh_delta", m + 1, np.int8)
                delta[: m + 1] = 0
                delta[tok_off[nz]] = 1
                delta[tok_off[nz] + counts[nz]] = -1
                run = _scratch("sh_run", m, np.int8)
                np.cumsum(delta[:m], dtype=np.int8, out=run)  # runs don't
                sh = acc[run.view(bool)]  # nest → values stay in {0, 1}
            out_chunks.append(sh)
            # flat shingles stay grouped by doc: runs are taken in
            # ascending doc order
    # fallback single shingle for docs with zero shingles: left-fold of
    # the doc's (< k) token hashes, seeded so it can't collide with a
    # k-shingle hash family value by construction
    short = np.flatnonzero(counts == 0)
    if len(short):
        tok_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tok_counts, out=tok_offsets[1:])
        fb = []
        for i in short:
            acc = np.uint64(0x5349_4E47_4C45)  # "SINGLE" seed
            for v in th[tok_offsets[i]:tok_offsets[i + 1]]:
                acc = hash_u64_pairs(
                    np.array([acc], dtype=np.uint64),
                    np.array([v], dtype=np.uint64),
                )[0]
            fb.append(acc)
        fallback = np.asarray(fb, dtype=np.uint64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    final_counts = np.where(counts == 0, 1, counts)
    np.cumsum(final_counts, out=offsets[1:])
    if out_chunks and not len(short):
        # no short-doc gaps: the valid-window layout IS the final layout
        # (a fresh array from the boolean index above, safe to return)
        return out_chunks[0], offsets
    flat = np.empty(offsets[-1], dtype=np.uint64)
    if out_chunks:
        # scatter the doc-grouped shingles into the final layout: docs
        # appear in the same order in both, only short-doc gaps shift runs
        sh = out_chunks[0]
        nonshort = np.flatnonzero(counts > 0)
        if len(nonshort):
            lens = counts[nonshort]
            src_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            dst_starts = offsets[nonshort]
            idx = np.repeat(dst_starts - src_starts, lens) + np.arange(int(lens.sum()))
            flat[idx] = sh
    for j, i in enumerate(short):
        flat[offsets[i]] = fallback[j]
    return flat, offsets


def bottom_k_shingles(
    flat: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc bottom-k (smallest hash values) shingle subset.

    Bounds per-doc sketching cost on arbitrarily long documents. The
    bottom-k of a hashed set is permutation-invariant and content-stable,
    so near-duplicate docs keep near-identical subsets; downstream
    MinHash/SimHash then estimate Jaccard of the bottom-k sets — the
    standard bounded-cost variant.
    """
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if n == 0 or int(lens.max(initial=0)) <= k:
        return flat, offsets
    new_lens = np.minimum(lens, k)
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_offsets[1:])
    new_flat = np.empty(new_offsets[-1], dtype=np.uint64)
    # per-doc C calls (a few µs each over ≤ batch-size docs), NOT per
    # shingle: partition isolates the k smallest in O(len), then only
    # those k are sorted. Replaces a global lexsort over every shingle
    # (two full 8-byte sort passes + three m-sized index temporaries —
    # the dominant allocation churn of the old path under memory
    # pressure). Output is byte-identical: each doc's k smallest hash
    # values in ascending order.
    for d in range(n):
        seg = flat[offsets[d]:offsets[d + 1]]
        if len(seg) > k:
            seg = np.partition(seg, k - 1)[:k]
        new_flat[new_offsets[d]:new_offsets[d + 1]] = np.sort(seg)
    return new_flat, new_offsets


def minhash_signatures(
    flat: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int = 42
) -> np.ndarray:
    """MinHash signatures ``uint64[n, num_perm]`` from flat shingles.

    One vectorized pass per permutation: bijective mix then
    ``np.minimum.reduceat`` over doc segments. Requires every doc to own
    ≥1 shingle (guaranteed by :func:`shingle_doc_hashes`).
    """
    n = len(offsets) - 1
    rng = stable_rng(seed)
    rs = rng.integers(0, 2**64, size=num_perm, dtype=np.uint64)
    sig = np.empty((n, num_perm), dtype=np.uint64)
    if n == 0:
        return sig
    # cache-blocked: all permutations over one L2-sized chunk of docs at
    # a time, so the shingle slice is read from DRAM once instead of
    # num_perm times (memory-bandwidth contention dominates when many
    # cores run this concurrently)
    chunk_target = 48 * 1024  # shingles per chunk ≈ 384 KB
    d0 = 0
    while d0 < n:
        d1 = d0
        while d1 < n and offsets[d1 + 1] - offsets[d0] <= chunk_target:
            d1 += 1
        d1 = max(d1, d0 + 1)  # at least one doc per chunk
        seg = flat[offsets[d0]:offsets[d1]]
        seg_starts = (offsets[d0:d1] - offsets[d0])
        y = _scratch("mh_y", len(seg), np.uint64)
        tmp = _scratch("mh_tmp", len(seg), np.uint64)
        for i in range(num_perm):
            np.bitwise_xor(seg, rs[i], out=y)
            splitmix64_inplace(y, tmp)  # == splitmix64(seg ^ rs[i])
            sig[d0:d1, i] = np.minimum.reduceat(y, seg_starts)
        d0 = d1
    return sig


def band_keys(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """LSH band keys ``uint64[n, bands]``.

    Each band key combines that band's ``rows`` signature values plus the
    band id, so identical row-groups in different bands never collide into
    one block.
    """
    n, p = sig.shape
    assert bands * rows == p, (bands, rows, p)
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
        for r in range(rows):
            acc = hash_u64_pairs(acc, sig[:, b * rows + r])
        out[:, b] = acc
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard per pair: fraction of equal signature slots."""
    return (sig_a == sig_b).mean(axis=1).astype(np.float64)
