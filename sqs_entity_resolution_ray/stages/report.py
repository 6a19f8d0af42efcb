"""Entity report assembly (SURVEY.md §2.5 A4).

Reproduces the shape of the reference's resolved-entity report — one
nested row per entity with member records, per-record match explanation
and aggregated features (``test/fixtures/flow-output.jsonl:1``:
``RESOLVED_ENTITY{ENTITY_ID, FEATURES, RECORDS[{RECORD_ID, MATCH_KEY,
...}]}``) — via ``groupby(entity_id).map_groups``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import effective_concurrency, effective_partitions, PipelineConfig


def best_scores(edges):
    """edges(uid_a, uid_b, score) → (uid, best_score) per member."""
    from .agg import hash_aggregate

    a = edges.select_columns(["uid_a", "score"]).rename_columns({"uid_a": "uid"})
    b = edges.select_columns(["uid_b", "score"]).rename_columns(
        {"uid_b": "uid"}).select_columns(["uid", "score"])
    return hash_aggregate(
        a.select_columns(["uid", "score"]).union(b),
        ["uid"], {"best_score": ("score", "max")},
    )


RECORD_STRUCT = pa.struct(
    [
        ("url", pa.string()),
        ("score", pa.float32()),
        ("match_key", pa.string()),
    ]
)

REPORT_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("cluster_size", pa.int32()),
        ("records", pa.list_(RECORD_STRUCT)),
        ("features", pa.map_(pa.string(), pa.list_(pa.string()))),
    ]
)


def _build_entity(group: pa.Table) -> pa.Table:
    urls = group.column("url").to_pylist()
    order = np.argsort(urls)
    urls = [urls[i] for i in order]
    scores = group.column("best_score").to_pylist() if "best_score" in group.column_names else [None] * len(urls)
    scores = [scores[i] for i in order]
    titles = group.column("title").to_pylist()
    titles = [titles[i] for i in order]
    langs = group.column("lang").to_pylist()
    langs = [langs[i] for i in order]
    records = [
        {
            "url": u,
            "score": float(s) if s is not None else 0.0,
            # MATCH_KEY analogue (reference flow-output.jsonl:1 e.g.
            # "+NAME+DOB+PHONE"): which signals joined this record
            "match_key": "+MINHASH+SIMHASH" if s is not None else "",
        }
        for u, s in zip(urls, scores)
    ]
    features = [
        ("TITLE", sorted({t for t in titles if t})),
        ("LANG", sorted({l for l in langs if l})),
    ]
    return pa.table(
        {
            "entity_id": pa.array([group.column("entity_id")[0].as_py()], pa.string()),
            "cluster_size": pa.array([len(urls)], pa.int32()),
            "records": pa.array([records], pa.list_(RECORD_STRUCT)),
            "features": pa.array([features], pa.map_(pa.string(), pa.list_(pa.string()))),
        }
    )


def entity_report(clusters, profiles, edges, cfg: PipelineConfig | None = None):
    """clusters + profiles + edges → nested entity report Dataset."""
    from ..config import partitions_for

    cfg = cfg or PipelineConfig()
    # profiles is materialized by the pipeline → count is metadata-cheap;
    # clusters is lazy (counting it would execute the plan twice)
    try:
        n_rows = profiles.count()
    except Exception:
        n_rows = 0
    n_part = partitions_for(n_rows, cfg)
    meta = profiles.select_columns(["uid", "title", "lang"])
    enriched = clusters.join(meta, join_type="inner", num_partitions=n_part,
                             on=("uid",))
    scores = best_scores(edges)
    enriched = enriched.join(
        scores, join_type="left_outer", num_partitions=n_part, on=("uid",)
    )
    return enriched.groupby("entity_id").map_groups(
        _build_entity, batch_format="pyarrow"
    )
