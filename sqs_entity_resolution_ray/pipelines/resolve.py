"""The flagship ER pipeline: pages → entity clusters.

One streaming Ray Data DAG replacing the reference's
consumer + redoer + Senzing black box (SURVEY.md §3 P-1/P-2):

    read_parquet(pages)                      [S1: queue → partitioned parquet]
      → map_batches(extract)                 [M1/M2/M6: parse + validate + normalize]
      → map_batches(profile)                 [T1: minhash/simhash features]
      → groupby(url).keep_latest             [upsert dedup — at-least-once idempotence]
      → flat band emission → groupby(band)   [J2: blocking, salted for skew]
      → pair join profiles → actor scorers   [black-box scoring → explicit]
      → filter(score ≥ τ) → label propagation to fixpoint   [P-2 redo loop]
      → clusters (+ nested entity report)    [A4/P-3]

The html column is dropped in the first map_batches and nothing wider
than a ~1 KB profile row ever crosses a shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.compute as pc
import ray.data as rd

from ..config import effective_concurrency, effective_partitions, MatchConfig, PipelineConfig
from ..stages.blocking import candidate_pairs
from ..stages.clustering import clusters_with_size, connected_components
from ..stages.extract import dedup_profiles_by_url, extract_batch, profile_batch
from ..stages.scoring import matched_edges, score_pairs


def read_pages(path_or_ds, columns=("url", "warc_ts", "html", "lang")):
    """pages source: parquet path(s) or an existing Dataset (column-pruned
    at the read — S1 replacement for the SQS poll loop)."""
    if isinstance(path_or_ds, rd.Dataset):
        return path_or_ds
    return rd.read_parquet(path_or_ds, columns=list(columns))


def validate_pages(ds):
    """M2 analogue: reject rows without the primary key (url). The
    reference bounces records lacking DATA_SOURCE/RECORD_ID
    (``consumer.py:188,201-204``); we divert them out of the stream."""
    def ok(t):
        mask = pc.and_(
            pc.is_valid(t.column("url")),
            pc.greater(pc.utf8_length(pc.fill_null(t.column("url"), "")), 0),
        )
        return t.filter(mask)
    return ds.map_batches(ok, batch_format="pyarrow")


def quarantined_pages(ds):
    """The DLQ analogue (S4): rows failing validation, as a Dataset."""
    def bad(t):
        mask = pc.or_(
            pc.is_null(t.column("url")),
            pc.equal(pc.utf8_length(pc.fill_null(t.column("url"), "")), 0),
        )
        return t.filter(mask)
    return ds.map_batches(bad, batch_format="pyarrow")


def build_profiles(pages, match_cfg: MatchConfig, cfg: PipelineConfig,
                   extracted_sink: str | None = None):
    """pages → deduped narrow profiles. Optionally write the extracted
    text checkpoint (url, warc_ts, extracted_text, text_sha256) — the
    artifact behind the byte-identical-per-url gate."""
    extracted = validate_pages(pages).map_batches(
        extract_batch, batch_format="pyarrow", batch_size=cfg.extract_batch_size
    )
    if extracted_sink:
        extracted.write_parquet(extracted_sink)
        extracted = rd.read_parquet(extracted_sink)
    profiles = extracted.map_batches(
        profile_batch,
        fn_kwargs={"match_cfg": match_cfg},
        batch_format="pyarrow",
        batch_size=cfg.signature_batch_size,
    )
    return dedup_profiles_by_url(profiles)


@dataclass
class ResolveArtifacts:
    profiles: rd.Dataset   # (url, warc_ts, lang, title, n_tokens, simhash, sig, bands)
    scored: rd.Dataset     # all scored candidate pairs
    edges: rd.Dataset      # matched pairs (url_a, url_b, score)
    labels: rd.Dataset     # (url, label)
    clusters: rd.Dataset   # (url, entity_id, cluster_size)


def resolve(pages, match_cfg: MatchConfig | None = None,
            cfg: PipelineConfig | None = None,
            cc_algorithm: str = "auto",
            extracted_sink: str | None = None) -> ResolveArtifacts:
    """Run the full ER DAG. Lazy until consumed except the clustering
    fixpoint loop (which must iterate) — callers consume ``clusters``."""
    match_cfg = match_cfg or MatchConfig()
    cfg = cfg or PipelineConfig()
    profiles = build_profiles(pages, match_cfg, cfg, extracted_sink).materialize()
    # pairs are narrow (two urls + an int): materializing them is cheap,
    # sizes the scoring join by the true pair count, and keeps the join's
    # aggregator actors from contending with the enumeration shuffle
    pairs = candidate_pairs(profiles, match_cfg, cfg).materialize()
    scored = score_pairs(pairs, profiles, match_cfg, cfg,
                         n_pairs=pairs.count())
    edges = matched_edges(scored).materialize()
    labels = connected_components(profiles, edges, cfg, algorithm=cc_algorithm)
    clusters = clusters_with_size(labels, cfg)
    return ResolveArtifacts(
        profiles=profiles, scored=scored, edges=edges, labels=labels,
        clusters=clusters,
    )
