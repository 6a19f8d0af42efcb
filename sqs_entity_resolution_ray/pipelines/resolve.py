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
    return dedup_profiles_by_url(profiles, cfg)


@dataclass
class ResolveArtifacts:
    profiles: rd.Dataset   # (url, uid, warc_ts, lang, title, n_tokens, simhash, sig, bands)
    scored: rd.Dataset     # all scored candidate pairs (uid-keyed)
    edges: rd.Dataset      # matched pairs (uid_a, uid_b, score)
    labels: rd.Dataset     # (url=uid, label)
    clusters: rd.Dataset   # (uid, entity_id, cluster_size, url)


def attach_url_strings(ds_with_uid, profiles, cfg: PipelineConfig):
    """uid → url mapping: broadcast sorted arrays below 2M docs (searchsorted
    gather per batch), hash join above."""
    import ray

    from ..stages.scoring import BROADCAST_PROFILES_MAX

    n = profiles.count()
    if n <= BROADCAST_PROFILES_MAX:
        import numpy as np
        import pyarrow as pa

        from ..stages.scoring import broadcast_columns

        tbl = broadcast_columns(profiles, ["uid", "url"])
        if tbl is None:
            uids = np.array([], dtype=np.int64)
            urls = np.array([], dtype=object)
        else:
            uids_raw = tbl.column("uid").to_numpy()
            order = uids_raw.argsort()
            uids = uids_raw[order]
            urls = np.asarray(tbl.column("url").to_pylist(),
                              dtype=object)[order]
        ref = ray.put((uids, urls))

        def attach(batch: pa.Table) -> pa.Table:
            u, s = ray.get(ref)
            idx = __import__("numpy").searchsorted(
                u, batch.column("uid").to_numpy(zero_copy_only=False))
            return batch.append_column("url", pa.array(list(s[idx]),
                                                       pa.string()))

        return ds_with_uid.map_batches(attach, batch_format="pyarrow")
    from ..config import partitions_for

    return ds_with_uid.join(
        profiles.select_columns(["uid", "url"]), join_type="inner",
        num_partitions=partitions_for(n, cfg), on=("uid",),
    )


def resolve(pages, match_cfg: MatchConfig | None = None,
            cfg: PipelineConfig | None = None,
            cc_algorithm: str = "auto",
            extracted_sink: str | None = None) -> ResolveArtifacts:
    """Run the full ER DAG. Lazy until consumed except the clustering
    fixpoint loop (which must iterate) — callers consume ``clusters``."""
    match_cfg = match_cfg or MatchConfig()
    cfg = cfg or PipelineConfig()
    profiles = build_profiles(pages, match_cfg, cfg, extracted_sink).materialize()
    pairs = candidate_pairs(profiles, match_cfg, cfg)
    from ..stages.scoring import BROADCAST_PROFILES_MAX

    if profiles.count() > BROADCAST_PROFILES_MAX:
        # join plan: pairs are narrow (two int ids + an int), so
        # materializing is cheap, sizes the scoring join by the true
        # pair count, and keeps the join's aggregator actors off the
        # enumeration shuffle's CPUs
        pairs = pairs.materialize()
        n_pairs = pairs.count()
    else:
        # broadcast plan: no join to size — let pairs STREAM straight
        # into the scorer pool (one less all-to-all barrier; the
        # non-scalable share of barriers is what caps single-node
        # scaling efficiency — BASELINE.md round-3 notes)
        n_pairs = None
    scored = score_pairs(pairs, profiles, match_cfg, cfg, n_pairs=n_pairs)
    edges = matched_edges(scored).materialize()
    nodes = profiles.select_columns(["uid"]).rename_columns({"uid": "url"})
    cc_edges = edges.rename_columns({"uid_a": "url_a", "uid_b": "url_b"})
    labels = connected_components(nodes, cc_edges, cfg, algorithm=cc_algorithm)
    clusters_uid = clusters_with_size(labels, cfg).rename_columns(
        {"url": "uid"}
    )
    clusters = attach_url_strings(clusters_uid, profiles, cfg)
    return ResolveArtifacts(
        profiles=profiles, scored=scored, edges=edges, labels=labels,
        clusters=clusters,
    )
