"""LSH blocking: band emission → partitioned block scan → candidate pairs.

The distributed replacement for Senzing's shared candidate index in
Postgres (SURVEY.md §2.4 J2; behavior implied by MATCH_KEYs in reference
``test/fixtures/flow-output.jsonl``). Design decisions for 100 TB scale:

- Band rows are NARROW: ``(part, band_key, uid)`` — 24 bytes, fully
  numeric (int ids sort/hash several times faster than url strings in
  the shuffle machinery); signatures, band
  vectors and titles do NOT ride the band shuffle; pairs emitted from
  multiple bands are deduped by a cheap hash aggregate on the (much
  smaller) pair list, and signatures join back in stages/scoring.py.
  (An earlier emit-once design carried the 8·lsh_bands-byte band vector
  on every band row to skip the dedup shuffle — at 32 bands that is
  ~8 KB per doc through the widest shuffle, strictly worse.)
- ONE Python call per partition, not per block: rows are hash-bucketed
  by ``part = band_key % P`` so a single ``map_groups`` call receives a
  whole partition; block boundaries inside it are found with a
  vectorized argsort and only multi-member blocks (the near-dup sets +
  rare collisions — a tiny fraction of all band keys) are touched in
  Python. The naive ``groupby(band_key).map_groups`` alternative makes
  one Python call per band key — millions of calls at 10^5 docs, the
  measured scaling cliff.
- Skew: any block larger than ``max_block_size`` is split into
  deterministic sorted chunks with one overlapping member between
  consecutive chunks. Pair enumeration is O(chunk²) instead of
  O(block²) and the overlap preserves transitive connectivity, so a
  genuinely near-duplicate mega-cluster (template farm) still resolves
  into ONE entity. Block sizes surface in the ``block_size`` column.
  (The reference has no app-level skew handling — hot entities
  serialize on Postgres row locks; the north rule demands it.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import bucket_partitions, MatchConfig, PipelineConfig, partitions_for

# default partition count for the band shuffle (each partition is
# scanned by one task). 64 is sized for this single-node benchmark:
# 24-byte band rows × ~10^8 rows / 64 ≈ tens of MB per partition, and
# fewer partitions keep the per-task fixed cost low at small scale. At
# ~10^9+ band rows raise toward 256+ (≤ a few hundred MB per partition)
# via PipelineConfig.shuffle_partitions — every bucketed shuffle in the
# repo resolves its count through config.bucket_partitions(cfg, this).
BAND_PARTITIONS = 64

_EMPTY_PAIRS = pa.table(
    {
        "uid_a": pa.array([], pa.int64()),
        "uid_b": pa.array([], pa.int64()),
        "block_size": pa.array([], pa.int32()),
    }
)


def emit_band_rows(batch: pa.Table, *, lsh_bands: int,
                   num_parts: int = BAND_PARTITIONS) -> pa.Table:
    """profiles → exploded band rows (part, band_key, uid)."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "part": pa.array([], pa.int64()),
                "band_key": pa.array([], pa.uint64()),
                "uid": pa.array([], pa.int64()),
            }
        )
    band_blobs = batch.column("bands").to_pylist()
    mat = np.frombuffer(b"".join(band_blobs), dtype="<u8").reshape(n, lsh_bands)
    keys = mat.reshape(-1)
    uids = batch.column("uid").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "part": pa.array((keys % np.uint64(num_parts)).astype(np.int64),
                             pa.int64()),
            "band_key": pa.array(keys, pa.uint64()),
            "uid": pa.array(np.repeat(uids, lsh_bands), pa.int64()),
        }
    )


def chunk_ranges(n: int, max_size: int) -> list[tuple[int, int]]:
    """Overlap-chunk walk over a SORTED block of ``n`` members: chunks of
    at most ``max_size`` sharing ONE member between consecutive chunks,
    so pair enumeration is O(chunk²) instead of O(n²) while transitive
    connectivity across the whole block is preserved (a genuinely
    near-duplicate mega-block still resolves into ONE component)."""
    if n <= max_size:
        return [(0, n)]
    out: list[tuple[int, int]] = []
    s = 0
    while s < n - 1:
        e = min(s + max_size, n)
        out.append((s, e))
        if e == n:
            break
        s = e - 1  # overlap one member → connectivity preserved
    return out


def _pairs_for_block(urls, cfg: PipelineConfig, out_a: list,
                     out_b: list, out_size: list) -> None:
    """Enumerate one block (members already sorted); appends to the
    output lists. Applies salted chunking; cross-band duplicate pairs
    are removed by the downstream hash-aggregate dedup. Stops EXACTLY at
    ``max_pairs_per_block`` (cap checked before each append, so the
    emitted count matches :func:`_chunked_pair_count`'s math)."""
    n = len(urls)
    cap = cfg.max_pairs_per_block
    emitted = 0
    for s, e in chunk_ranges(n, cfg.max_block_size):
        for x in range(s, e):
            for y in range(x + 1, e):
                if emitted >= cap:
                    break
                out_a.append(urls[x])
                out_b.append(urls[y])
                emitted += 1
            if emitted >= cap:
                break
        if emitted >= cap:
            break
    out_size.extend([n] * emitted)


class PartitionPairEnumerator:
    """``map_groups`` body over ONE hash partition of band rows."""

    def __init__(self, cfg: PipelineConfig | None = None, lsh_bands: int = 32):
        self.cfg = cfg or PipelineConfig()
        self.lsh_bands = lsh_bands

    def __call__(self, group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _EMPTY_PAIRS
        keys = group.column("band_key").to_numpy(zero_copy_only=False)
        # vectorized block detection: sort rows by band_key, find runs
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        boundaries = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [n]))
        sizes = ends - starts
        multi = np.flatnonzero(sizes >= 2)
        if len(multi) == 0:
            return _EMPTY_PAIRS
        uids_all = group.column("uid").to_numpy(zero_copy_only=False)
        out_a: list[int] = []
        out_b: list[int] = []
        out_size: list[int] = []
        for g in multi:
            members = order[starts[g]:ends[g]]
            uids = sorted(int(uids_all[i]) for i in members)  # deterministic
            _pairs_for_block(uids, self.cfg, out_a, out_b, out_size)
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "uid_a": pa.array(out_a, pa.int64()),
                "uid_b": pa.array(out_b, pa.int64()),
                "block_size": pa.array(np.asarray(out_size, dtype=np.int32),
                                       pa.int32()),
            }
        )


def _chunked_pair_count(n: int, max_s: int, cap: int | None) -> int:
    """Pairs :func:`_pairs_for_block` emits for a block of size ``n`` —
    the same chunk walk (size ``max_s``, one overlapping member) and the
    same ``max_pairs_per_block`` cap, as counting math. ``cap=None``
    means uncapped (the dedup family chunks but never pair-caps)."""
    total = sum((e - s) * (e - s - 1) // 2 for s, e in chunk_ranges(n, max_s))
    return total if cap is None else min(total, cap)


class PartitionBlockStats:
    """Skew observability (north rule: explicit skew handling must be
    OBSERVABLE, not just implemented): per band-hash partition, block-
    size distribution stats computed from band-key run lengths alone —
    no pair materialization, same vectorized block detection as
    :class:`PartitionPairEnumerator`.

    Counts are per (band, block): a doc pair colliding in k bands is
    counted in k blocks (pair dedup happens downstream of enumeration,
    so these are the enumeration-cost numbers that matter for skew).

    Generalized over the bucketed-shuffle family: ``key_col`` names the
    bucket column (``band_key`` for LSH bands, ``bucket`` for simhash
    chunks / hyperplane codes), ``chunk_size``/``pair_cap`` override the
    enumeration geometry (the dedup operators chunk at
    ``max_block_size*4`` and never pair-cap — stages/dedup.py).
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 key_col: str = "band_key",
                 chunk_size: int | None = None,
                 pair_cap: int | None = -1):
        self.cfg = cfg or PipelineConfig()
        self.key_col = key_col
        self.chunk_size = chunk_size or self.cfg.max_block_size
        self.pair_cap = self.cfg.max_pairs_per_block if pair_cap == -1 else pair_cap

    def __call__(self, group: pa.Table) -> pa.Table:
        n = group.num_rows
        part = int(group.column("part")[0].as_py()) if n else -1
        keys = group.column(self.key_col).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        bounds = np.flatnonzero(sk[1:] != sk[:-1]) + 1
        sizes = np.diff(np.concatenate(([0], bounds, [n])))
        multi = sizes[sizes >= 2]
        exact = int((multi.astype(np.int64) * (multi - 1) // 2).sum())
        split = multi[multi > self.chunk_size]
        # only split/capped blocks need the chunk walk; small blocks
        # (the overwhelming majority) are one vectorized expression
        small_pairs = (multi.astype(np.int64) * (multi - 1) // 2)[
            multi <= self.chunk_size]
        if self.pair_cap is not None:
            small_pairs = np.minimum(small_pairs, self.pair_cap)
        emitted = int(small_pairs.sum())
        emitted += sum(
            _chunked_pair_count(int(s), self.chunk_size, self.pair_cap)
            for s in split
        )
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "n_band_rows": pa.array([n], pa.int64()),
            "n_blocks": pa.array([len(multi)], pa.int64()),
            "max_block_size": pa.array(
                [int(multi.max()) if len(multi) else 0], pa.int64()),
            "n_blocks_split": pa.array([len(split)], pa.int64()),
            "n_pairs_exact": pa.array([exact], pa.int64()),
            "n_pairs_emitted": pa.array([emitted], pa.int64()),
            "n_pairs_dropped": pa.array([exact - emitted], pa.int64()),
        })


def block_stats(profiles, match_cfg: MatchConfig, cfg: PipelineConfig):
    """LSH block skew metrics as a ONE-ROW summary Dataset.

    Columns: n_blocks (multi-member band blocks), max_block_size,
    n_blocks_split (blocks over ``cfg.max_block_size`` → salted
    chunking), n_pairs_exact (all-pairs cost the skew handling avoided),
    n_pairs_emitted (actual enumeration cost), n_pairs_dropped (pairs
    skipped by chunking + the ``max_pairs_per_block`` cap — recall
    spent, bounded-connectivity preserved via chunk overlap).
    """
    n_bucket = bucket_partitions(cfg, BAND_PARTITIONS)
    bands = profiles.map_batches(
        emit_band_rows,
        batch_format="pyarrow",
        fn_kwargs={"lsh_bands": match_cfg.lsh_bands, "num_parts": n_bucket},
    )
    stats = PartitionBlockStats(cfg)

    def stats_in_partition(group: pa.Table) -> pa.Table:
        return stats(group)

    per_part = bands.groupby("part", num_partitions=n_bucket).map_groups(
        stats_in_partition, batch_format="pyarrow"
    )

    return summarize_partition_stats(per_part)


def summarize_partition_stats(per_part):
    """Per-partition skew rows → ONE summary row (shared by the band
    block_stats above and the dedup-family skew stats, stages/dedup.py)."""

    def summarize(df):
        import pandas as pd

        return pd.DataFrame([{
            "n_blocks": int(df["n_blocks"].sum()),
            "max_block_size": int(df["max_block_size"].max()),
            "n_blocks_split": int(df["n_blocks_split"].sum()),
            "n_pairs_exact": int(df["n_pairs_exact"].sum()),
            "n_pairs_emitted": int(df["n_pairs_emitted"].sum()),
            "n_pairs_dropped": int(df["n_pairs_dropped"].sum()),
        }])

    # per-part rows are tiny (one per partition): a single final
    # combine is not a scale concern
    return per_part.map_batches(
        lambda t: t.append_column("one", pa.array([1] * t.num_rows,
                                                  pa.int64())),
        batch_format="pyarrow",
    ).groupby("one").map_groups(summarize, batch_format="pandas")


def candidate_pairs(profiles, match_cfg: MatchConfig, cfg: PipelineConfig):
    """profiles → deduped candidate pair Dataset (uid_a, uid_b, block_size).

    ``profiles`` is expected MATERIALIZED (all current callers comply):
    the pair-dedup shuffle is sized by ``profiles.count()``, which on a
    lazy dataset would execute the profile pipeline twice (once for the
    count, once for the band emit)."""
    n_bucket = bucket_partitions(cfg, BAND_PARTITIONS)
    bands = profiles.map_batches(
        emit_band_rows,
        batch_format="pyarrow",
        fn_kwargs={"lsh_bands": match_cfg.lsh_bands, "num_parts": n_bucket},
    )
    enumerator = PartitionPairEnumerator(cfg, match_cfg.lsh_bands)

    def enumerate_partition(group: pa.Table) -> pa.Table:
        return enumerator(group)

    raw_pairs = bands.groupby("part", num_partitions=n_bucket).map_groups(
        enumerate_partition, batch_format="pyarrow"
    )
    # a pair that collides in k bands is emitted k times → dedup (keep
    # the max block_size observed, for the skew metrics). Pair keys are
    # mostly unique so the per-batch combiner cannot compress — size the
    # reduce side by DATA (band-row count bounds the pair count order of
    # magnitude), never a fixed constant that funnels 10^9+ pairs
    # through 16 reducers.
    from .agg import hash_aggregate

    try:  # profiles is materialized by the pipeline → count is cheap
        n_band_rows = profiles.count() * match_cfg.lsh_bands
        pair_parts = partitions_for(n_band_rows, cfg)
    except Exception:
        from ..config import effective_partitions

        pair_parts = effective_partitions(cfg)
    return hash_aggregate(
        raw_pairs, ["uid_a", "uid_b"], {"block_size": ("block_size", "max")},
        num_partitions=pair_parts,
    )
