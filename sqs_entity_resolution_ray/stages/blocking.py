"""LSH blocking: band emission → salted groupby → candidate pairs.

The distributed replacement for Senzing's shared candidate index in
Postgres (SURVEY.md §2.4 J2; behavior implied by MATCH_KEYs in reference
``test/fixtures/flow-output.jsonl``). Design decisions for 100 TB scale:

- Band rows are NARROW: ``(band_key, url, bands)`` — signatures and
  titles do NOT ride the band shuffle; they are joined back onto the
  (much smaller) deduped pair list afterwards.
- Pair dedup is free: a pair is emitted only from the FIRST band where
  both docs collide (each band row carries the doc's full band-key
  vector, 8·lsh_bands bytes), so no second shuffle is needed to dedupe
  pairs produced by multiple bands.
- Skew: any block larger than ``max_block_size`` is split into
  deterministic sorted chunks with one overlapping member between
  consecutive chunks. Pair enumeration is O(chunk²) instead of O(block²)
  and the overlap preserves transitive connectivity, so a genuinely
  near-duplicate mega-cluster (template farm) still resolves into ONE
  entity. Split/emitted/capped counts are returned in the pair rows'
  ``block_size`` column and aggregated into per-partition metrics.
  (The reference has no app-level skew handling — hot entities serialize
  on Postgres row locks; the north rule demands it explicitly.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import MatchConfig, PipelineConfig


def emit_band_rows(batch: pa.Table, *, lsh_bands: int) -> pa.Table:
    """profiles → exploded band rows (band_key, url, bands).

    ``bands`` (the doc's full band-key vector) rides along so pair
    enumeration can apply the emit-once rule without a join.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "band_key": pa.array([], pa.uint64()),
                "url": pa.array([], pa.string()),
                "bands": pa.array([], pa.binary()),
            }
        )
    band_blobs = batch.column("bands").to_pylist()
    mat = np.frombuffer(b"".join(band_blobs), dtype="<u8").reshape(n, lsh_bands)
    urls = batch.column("url")
    idx = np.repeat(np.arange(n), lsh_bands)
    return pa.table(
        {
            "band_key": pa.array(mat.reshape(-1), pa.uint64()),
            "url": urls.take(pa.array(idx)),
            "bands": pa.array([band_blobs[i] for i in idx], pa.binary()),
        }
    )


class PairEnumerator:
    """``map_groups`` body over one (possibly salted) LSH block."""

    def __init__(self, cfg: PipelineConfig | None = None, lsh_bands: int = 32):
        self.cfg = cfg or PipelineConfig()
        self.lsh_bands = lsh_bands

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = group.num_rows
        empty = pa.table(
            {
                "url_a": pa.array([], pa.string()),
                "url_b": pa.array([], pa.string()),
                "block_size": pa.array([], pa.int32()),
            }
        )
        if n < 2:
            return empty
        band_key = group.column("band_key")[0].as_py()
        urls = group.column("url").to_pylist()
        blobs = group.column("bands").to_pylist()
        order = np.argsort(urls)  # deterministic member order
        urls = [urls[i] for i in order]
        mat = np.frombuffer(b"".join(blobs[i] for i in order), dtype="<u8").reshape(
            n, self.lsh_bands
        )
        # emit-once rule: this block is responsible for a pair only if the
        # FIRST band where the two docs collide is this band_key's band.
        # (equal band keys in different band positions cannot collide
        # because the band id is folded into the key — minhash.band_keys)
        this_band = int(np.argmax(mat[0] == np.uint64(band_key)))

        out_a: list[str] = []
        out_b: list[str] = []
        # salted chunking with 1-member overlap keeps connectivity
        max_s = cfg.max_block_size
        chunks: list[range] = []
        if n <= max_s:
            chunks = [range(0, n)]
        else:
            start = 0
            while start < n - 1:
                end = min(start + max_s, n)
                chunks.append(range(start, end))
                if end == n:
                    break
                start = end - 1  # overlap one member
        for ch in chunks:
            members = list(ch)
            for ii in range(len(members)):
                i = members[ii]
                mi = mat[i]
                for jj in range(ii + 1, len(members)):
                    j = members[jj]
                    first = int(np.argmax(mi == mat[j]))
                    # pairs colliding in an earlier band are that band's job
                    if first != this_band or mi[first] != mat[j][first]:
                        continue
                    out_a.append(urls[i])
                    out_b.append(urls[j])
                    if len(out_a) >= cfg.max_pairs_per_block:
                        break
                if len(out_a) >= cfg.max_pairs_per_block:
                    break
        if not out_a:
            return empty
        return pa.table(
            {
                "url_a": pa.array(out_a, pa.string()),
                "url_b": pa.array(out_b, pa.string()),
                "block_size": pa.array(
                    np.full(len(out_a), n, dtype=np.int32), pa.int32()
                ),
            }
        )


def candidate_pairs(profiles, match_cfg: MatchConfig, cfg: PipelineConfig):
    """profiles → deduped candidate pair Dataset (url_a, url_b, block_size)."""
    bands = profiles.map_batches(
        emit_band_rows,
        batch_format="pyarrow",
        fn_kwargs={"lsh_bands": match_cfg.lsh_bands},
    )
    enumerator = PairEnumerator(cfg, match_cfg.lsh_bands)

    def enumerate_block(group: pa.Table) -> pa.Table:
        return enumerator(group)

    return bands.groupby("band_key").map_groups(
        enumerate_block, batch_format="pyarrow"
    )
