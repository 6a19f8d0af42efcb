"""Checkpointed flagship pipeline: resume-mid-pipeline after failure.

The P-1→P-3 lifecycle with per-stage atomic Parquet checkpoints and
lineage manifests (input fingerprint + config fingerprint, per-partition
rows/bytes). A rerun skips every stage whose manifest still matches —
the Ray translation of the reference's three-state tracker + rewind
(``db.py:6-9,90-102``) applied to the whole DAG, not just export.

Stage checkpoints under ``<ckpt_root>/``:
  profiles/   deduped matching profiles   (after extract+minhash+dedup)
  edges/      matched pair edges          (after blocking+scoring)
  clusters/   url → entity_id, size       (after label propagation)
plus ``metrics.json`` aggregating the per-stage wall times and
per-partition stats — the OTel counters analogue (SURVEY §2.3 T4).
"""

from __future__ import annotations

import json
import os
import time

import ray.data as rd

from ..config import MatchConfig, PipelineConfig
from ..state.checkpoint import input_fingerprint, load_or_run, read_manifest
from ..stages.blocking import candidate_pairs
from ..stages.clustering import clusters_with_size, connected_components
from ..stages.scoring import matched_edges, score_pairs
from .resolve import build_profiles, read_pages


def resolve_with_checkpoints(
    pages_path: str,
    ckpt_root: str,
    match_cfg: MatchConfig | None = None,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Run (or resume) the flagship pipeline with per-stage checkpoints.

    Returns {"clusters": Dataset, "cached": {stage: bool}, "metrics": {...}}.
    """
    match_cfg = match_cfg or MatchConfig()
    cfg = cfg or PipelineConfig()
    os.makedirs(ckpt_root, exist_ok=True)
    in_fp = input_fingerprint(pages_path)
    cfg_fp = f"{match_cfg.fingerprint()}-{cfg.fingerprint()}"
    cached: dict[str, bool] = {}
    wall: dict[str, float] = {}

    t0 = time.perf_counter()
    profiles_fp = f"{in_fp}-{cfg_fp}-profiles"
    profiles, cached["profiles"] = load_or_run(
        os.path.join(ckpt_root, "profiles"),
        profiles_fp,
        lambda: build_profiles(read_pages(pages_path), match_cfg, cfg),
        extra={"stage": "profiles", "input": pages_path},
    )
    wall["profiles"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    edges_fp = f"{profiles_fp}-edges"

    def run_edges() -> rd.Dataset:
        pairs = candidate_pairs(profiles, match_cfg, cfg)
        scored = score_pairs(pairs, profiles, match_cfg, cfg)
        return matched_edges(scored)

    edges, cached["edges"] = load_or_run(
        os.path.join(ckpt_root, "edges"), edges_fp, run_edges,
        extra={"stage": "edges"},
    )
    wall["edges"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    clusters_fp = f"{edges_fp}-clusters"

    def run_clusters() -> rd.Dataset:
        from .resolve import attach_url_strings

        nodes = profiles.select_columns(["uid"]).rename_columns({"uid": "url"})
        cc_edges = edges.rename_columns({"uid_a": "url_a", "uid_b": "url_b"})
        labels = connected_components(nodes, cc_edges, cfg)
        clusters_uid = clusters_with_size(labels, cfg).rename_columns(
            {"url": "uid"}
        )
        return attach_url_strings(clusters_uid, profiles, cfg)

    clusters, cached["clusters"] = load_or_run(
        os.path.join(ckpt_root, "clusters"), clusters_fp, run_clusters,
        extra={"stage": "clusters"},
    )
    wall["clusters"] = round(time.perf_counter() - t0, 3)

    metrics = {
        "input_fingerprint": in_fp,
        "config_fingerprint": cfg_fp,
        "wall_sec": wall,
        "cached": cached,
        "stages": {
            s: {
                "row_count": (read_manifest(os.path.join(ckpt_root, s)) or {}).get("row_count"),
                "partitions": len((read_manifest(os.path.join(ckpt_root, s)) or {}).get("partitions", [])),
            }
            for s in ("profiles", "edges", "clusters")
        },
    }
    with open(os.path.join(ckpt_root, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    return {"clusters": clusters, "cached": cached, "metrics": metrics}
