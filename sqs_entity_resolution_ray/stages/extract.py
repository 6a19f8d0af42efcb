"""Extraction + profiling stages (pure ``map_batches`` over Arrow).

Replaces the reference's per-message ``json.loads`` + Senzing feature
normalization (``middleware/consumer.py:177-197``; normalization behavior
visible in ``test/fixtures/flow-output.jsonl:1-2``) with vectorized batch
transforms. The ``html`` binary column never survives past extraction and
never crosses a shuffle (SURVEY.md §7 "wide rows").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..config import MatchConfig
from ..functions.html_extract import EXTRACTOR_VERSION, extract_text, extract_title
from ..functions.hashing import node_ids_from_strings
from ..functions.minhash import (band_keys, bottom_k_shingles,
                                 minhash_signatures, shingle_doc_hashes)
from ..functions.simhash import simhash_from_shingles


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, lang) → extracted(url, warc_ts, lang,
    extracted_text, title, text_sha256). Drops ``html``.

    The regex extractor itself is per-document Python (HTML structure is
    not expressible as an Arrow kernel); everything around it is Arrow.
    """
    htmls = batch.column("html").to_pylist()
    # decode each page once; extract_text/extract_title accept str and
    # produce output identical to the bytes path (both decode with
    # errors="replace" — pinned by the byte-identical goldens)
    decoded = [
        "" if h is None
        else (h if isinstance(h, str)
              else bytes(h).decode("utf-8", errors="replace"))
        for h in htmls
    ]
    texts = [extract_text(s) for s in decoded]
    titles = [extract_title(s) for s in decoded]
    shas = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {
            "url": batch.column("url"),
            # normalize to µs so sources with ns timestamps (e.g.
            # from_pandas fixtures) union cleanly with parquet blocks
            "warc_ts": batch.column("warc_ts").cast(pa.timestamp("us")),
            "lang": batch.column("lang"),
            "extracted_text": pa.array(texts, pa.string()),
            "title": pa.array(titles, pa.string()),
            "text_sha256": pa.array(shas, pa.string()),
        }
    )


class ProfileBatch:
    """extracted → narrow matching profile; drops the text.

    Emits per row: url, warc_ts, lang, title, n_tokens, simhash,
    ``sig`` (num_perm little-endian uint64s as one binary blob) and
    ``bands`` (lsh_bands uint64 band keys as one binary blob).

    A callable class so the (cheap) config unpack happens once per actor;
    the real reason it is actor-shaped is SURVEY.md §2.3 T1 — the
    reference builds one Senzing engine per worker process
    (``consumer.py:151-163``); our per-worker state is the seeded
    permutation family, implicit in the seed.
    """

    def __init__(self, match_cfg: MatchConfig | None = None, seed: int = 42):
        self.mc = match_cfg or MatchConfig()
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        mc = self.mc
        texts = batch.column("extracted_text").to_pylist()
        flat, offsets = shingle_doc_hashes(texts, mc.shingle_k)
        if mc.max_shingles:
            flat, offsets = bottom_k_shingles(flat, offsets, mc.max_shingles)
        sig = minhash_signatures(flat, offsets, mc.num_perm, seed=self.seed)
        bands = band_keys(sig, mc.lsh_bands, mc.lsh_rows)
        sh = simhash_from_shingles(flat, offsets)
        n_tokens = np.diff(offsets).astype(np.int32)  # ≈ token count (shingles+k-1)
        # store signatures truncated to 32 bits per slot: est_jaccard
        # compares slot equality only, and a truncated collision flips a
        # slot with p=2^-32 — halves the scoring-join payload
        sig_bytes = [row.astype("<u4").tobytes() for row in sig]
        band_bytes = [row.astype("<u8").tobytes() for row in bands]
        urls = batch.column("url").to_pylist()
        return pa.table(
            {
                "url": batch.column("url"),
                # 63-bit numeric doc id: every downstream shuffle (bands,
                # pairs, edges, labels) keys on this instead of the url
                # string — narrower rows, numeric sorts/joins
                "uid": pa.array(node_ids_from_strings(urls), pa.int64()),
                "warc_ts": batch.column("warc_ts"),
                "lang": batch.column("lang"),
                "title": batch.column("title"),
                "n_tokens": pa.array(n_tokens, pa.int32()),
                "simhash": pa.array(sh.astype(np.uint64), pa.uint64()),
                "sig": pa.array(sig_bytes, pa.binary()),
                "bands": pa.array(band_bytes, pa.binary()),
            }
        )


def dedup_profiles_by_url(profiles, cfg=None):
    """Input upsert semantics: per url keep the max-``warc_ts`` row.

    The reference's ``add_record`` with an existing (DATA_SOURCE,
    RECORD_ID) replaces the record (``README.md:222-228``); for us the
    last fetch of a url wins. Runs AFTER profiling so only narrow profile
    rows cross the shuffle — never html or text.
    """
    import pandas as pd

    from ..config import bucket_partitions

    num_parts = bucket_partitions(cfg, 64)

    def local_dedup(df: pd.DataFrame) -> pa.Table:
        # within-batch dedup first (combiner: most dup urls land in the
        # same read fragment), deterministic tie-break on simhash
        df = df.sort_values(["url", "warc_ts", "simhash"]).drop_duplicates(
            "url", keep="last"
        )
        part = pd.util.hash_pandas_object(df["url"], index=False)
        df = df.assign(part=(part % np.uint64(num_parts)).astype(np.int64))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["url", "warc_ts", "simhash"]).drop_duplicates(
            "url", keep="last"
        ).drop(columns=["part"])
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        profiles.map_batches(local_dedup, batch_format="pandas")
        .groupby("part", num_partitions=num_parts)
        .map_groups(final, batch_format="pandas")
    )


def profile_batch(batch: pa.Table, *, match_cfg: MatchConfig | None = None,
                  seed: int = 42) -> pa.Table:
    """Stateless task-pool form of :class:`ProfileBatch` — sketching has
    no expensive per-worker setup, so elastic tasks beat a fixed actor
    pool (the actor-pool pattern is reserved for the pair scorer, T1)."""
    return ProfileBatch(match_cfg, seed)(batch)


EXTRACT_STAGE_VERSION = EXTRACTOR_VERSION
