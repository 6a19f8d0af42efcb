"""Entity report assembly (SURVEY.md §2.5 A4 + §1.1 output contract).

Reproduces the shape of the reference's resolved-entity report — one
nested row per entity with member records, per-record match explanation
and aggregated features (``test/fixtures/flow-output.jsonl:1``:
``RESOLVED_ENTITY{ENTITY_ID, FEATURES, RECORDS[{RECORD_ID, MATCH_KEY,
...}]}``) — via ``groupby(entity_id).map_groups``.

Two fidelity points beyond the bare cluster map:

- **MATCH_KEY is built from the signals that actually matched** (the
  reference's per-record key varies by matched features, e.g.
  ``"+NAME+DOB+PHONE"``): each member's best edge contributes
  ``+MINHASH`` / ``+SIMHASH`` / ``+TITLE`` according to its evidence
  columns — not a hardcoded constant.
- **RELATED_ENTITIES**: near-miss scored pairs (score within the
  related band but below the match threshold) that cross entity
  boundaries surface per entity as ``related`` entries with
  ``match_level = "POSSIBLY_RELATED"`` — the reference exports these
  alongside the resolved entity (``flow-output.jsonl:1``
  ``RELATED_ENTITIES / MATCH_LEVEL_CODE: POSSIBLY_RELATED``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig

# evidence thresholds for MATCH_KEY assembly: a signal is named in the
# key when it contributed materially to the match decision
MATCH_KEY_MIN_JACCARD = 0.40
MATCH_KEY_MIN_SIMHASH = 0.80   # on 1 - hamming/64
MATCH_KEY_MIN_TITLE_JW = 0.85

# near-miss floor: scored non-match pairs at or above this surface as
# POSSIBLY_RELATED (the match threshold itself is MatchConfig.threshold)
RELATED_MIN_SCORE = 0.30

RECORD_STRUCT = pa.struct(
    [
        ("url", pa.string()),
        ("score", pa.float32()),
        ("match_key", pa.string()),
    ]
)

RELATED_STRUCT = pa.struct(
    [
        ("entity_id", pa.string()),
        ("match_level", pa.string()),
        ("score", pa.float32()),
    ]
)

REPORT_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("cluster_size", pa.int32()),
        ("records", pa.list_(RECORD_STRUCT)),
        ("features", pa.map_(pa.string(), pa.list_(pa.string()))),
        ("related", pa.list_(RELATED_STRUCT)),
    ]
)


def _match_keys(ej: np.ndarray, hd: np.ndarray, jw: np.ndarray) -> np.ndarray:
    """Vectorized MATCH_KEY strings from per-edge evidence."""
    mh = np.where(ej >= MATCH_KEY_MIN_JACCARD, "+MINHASH", "")
    sh = np.where(1.0 - hd / 64.0 >= MATCH_KEY_MIN_SIMHASH, "+SIMHASH", "")
    ti = np.where(jw >= MATCH_KEY_MIN_TITLE_JW, "+TITLE", "")
    out = np.char.add(np.char.add(mh.astype("U16"), sh), ti)
    # a matched pair that crossed the threshold on the combined score
    # without any single dominant signal still gets an explanation
    return np.where(out == "", "+SCORE", out)


def best_edges(edges):
    """edges(uid_a, uid_b, score, est_jaccard, simhash_hd, title_jw) →
    (uid, best_score, match_key): each member's strongest edge and the
    evidence key assembled from that edge's signals."""
    from .agg import hash_topn

    cols = ["score", "est_jaccard", "simhash_hd", "title_jw"]
    a = edges.select_columns(["uid_a", "uid_b"] + cols).rename_columns(
        {"uid_a": "uid", "uid_b": "peer"})
    b = edges.select_columns(["uid_b", "uid_a"] + cols).rename_columns(
        {"uid_b": "uid", "uid_a": "peer"}
    ).select_columns(["uid", "peer"] + cols)
    best = hash_topn(a.union(b), ["uid"], "score", 1, tie_cols=["peer"])

    def fmt(batch: pd.DataFrame) -> pa.Table:
        keys = _match_keys(batch["est_jaccard"].to_numpy(),
                           batch["simhash_hd"].to_numpy(dtype=np.float64),
                           batch["title_jw"].to_numpy())
        return pa.table({
            "uid": pa.array(batch["uid"], pa.int64()),
            "best_score": pa.array(batch["score"], pa.float64()),
            "match_key": pa.array(keys, pa.string()),
        })

    return best.map_batches(fmt, batch_format="pandas")


def _attach_entity_ids(pairs, clusters, cfg: PipelineConfig):
    """scored pairs (uid_a, uid_b, score) → + (ent_a, ent_b) via the
    uid→entity_id map (broadcast sorted arrays when small, joins when
    not — the attach_url_strings pattern)."""
    import ray

    from .clustering import BROADCAST_MAX_ROWS
    from ..config import partitions_for

    ents = clusters.select_columns(["uid", "entity_id"])
    n = ents.count()
    if n <= BROADCAST_MAX_ROWS:
        edf = ents.to_pandas()
        order = np.argsort(edf["uid"].to_numpy())
        ref = ray.put((edf["uid"].to_numpy()[order],
                       edf["entity_id"].to_numpy()[order]))

        def attach(batch: pa.Table) -> pa.Table:
            uids_s, ents_s = ray.get(ref)
            ia = np.searchsorted(
                uids_s, batch.column("uid_a").to_numpy(zero_copy_only=False))
            ib = np.searchsorted(
                uids_s, batch.column("uid_b").to_numpy(zero_copy_only=False))
            return pa.table({
                "ent_a": pa.array(list(ents_s[ia]), pa.string()),
                "ent_b": pa.array(list(ents_s[ib]), pa.string()),
                "score": batch.column("score"),
            })

        return pairs.map_batches(attach, batch_format="pyarrow")
    n_part = partitions_for(n, cfg)
    a = ents.rename_columns({"uid": "uid_a", "entity_id": "ent_a"})
    b = ents.rename_columns({"uid": "uid_b", "entity_id": "ent_b"})
    out = pairs.join(a, join_type="inner", num_partitions=n_part,
                     on=("uid_a",))
    out = out.join(b, join_type="inner", num_partitions=n_part,
                   on=("uid_b",))
    return out.select_columns(["ent_a", "ent_b", "score"])


def related_pairs(scored, clusters, cfg: PipelineConfig,
                  related_min: float = RELATED_MIN_SCORE):
    """Near-miss scored pairs crossing entity boundaries →
    (entity_id, related_id, rel_score) with the max score per pair of
    entities, symmetric (each side lists the other)."""
    import pyarrow.compute as pc

    from .agg import hash_aggregate

    def near(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.invert(t.column("is_match")),
                       pc.greater_equal(t.column("score"), related_min))
        f = t.filter(mask)
        return pa.table({"uid_a": f.column("uid_a"),
                         "uid_b": f.column("uid_b"),
                         "score": f.column("score")})

    cand = scored.map_batches(near, batch_format="pyarrow")
    ented = _attach_entity_ids(cand, clusters, cfg)

    def cross(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        keep = pc2.invert(pc2.equal(t.column("ent_a"), t.column("ent_b")))
        return t.filter(keep)

    cross_pairs = ented.map_batches(cross, batch_format="pyarrow")
    fwd = cross_pairs.rename_columns(
        {"ent_a": "entity_id", "ent_b": "related_id"})
    rev = cross_pairs.rename_columns(
        {"ent_b": "entity_id", "ent_a": "related_id"}
    ).select_columns(["entity_id", "related_id", "score"])
    sym = fwd.select_columns(["entity_id", "related_id", "score"]).union(rev)
    return hash_aggregate(sym, ["entity_id", "related_id"],
                          {"rel_score": ("score", "max")})


def _build_entity(group: pa.Table) -> pa.Table:
    # two row kinds share the flat schema: member rows carry url,
    # related rows carry related_id (see entity_report's union)
    is_member = group.column("url").is_valid().to_numpy(zero_copy_only=False)
    mem = group.filter(pa.array(is_member))
    rel = group.filter(pa.array(~is_member))

    urls = mem.column("url").to_pylist()
    order = np.argsort(urls)
    urls = [urls[i] for i in order]
    scores = mem.column("best_score").to_pylist()
    scores = [scores[i] for i in order]
    keys = mem.column("match_key").to_pylist()
    keys = [keys[i] for i in order]
    titles = mem.column("title").to_pylist()
    langs = mem.column("lang").to_pylist()
    records = [
        {
            "url": u,
            "score": float(s) if s is not None else 0.0,
            "match_key": k if (k and s is not None) else "",
        }
        for u, s, k in zip(urls, scores, keys)
    ]
    features = [
        ("TITLE", sorted({t for t in titles if t})),
        ("LANG", sorted({l for l in langs if l})),
    ]
    rel_ids = rel.column("related_id").to_pylist()
    rel_scores = rel.column("rel_score").to_pylist()
    rel_order = np.argsort(rel_ids) if rel_ids else []
    related = [
        {
            "entity_id": rel_ids[i],
            "match_level": "POSSIBLY_RELATED",
            "score": float(rel_scores[i]),
        }
        for i in rel_order
    ]
    entity_id = (mem if mem.num_rows else group).column("entity_id")[0].as_py()
    return pa.table(
        {
            "entity_id": pa.array([entity_id], pa.string()),
            "cluster_size": pa.array([len(urls)], pa.int32()),
            "records": pa.array([records], pa.list_(RECORD_STRUCT)),
            "features": pa.array([features],
                                 pa.map_(pa.string(), pa.list_(pa.string()))),
            "related": pa.array([related], pa.list_(RELATED_STRUCT)),
        }
    )


_ROW_FIELDS = {
    "entity_id": pa.string(),
    "url": pa.string(),
    "title": pa.string(),
    "lang": pa.string(),
    "best_score": pa.float64(),
    "match_key": pa.string(),
    "related_id": pa.string(),
    "rel_score": pa.float64(),
}


def entity_report(clusters, profiles, edges, scored=None,
                  cfg: PipelineConfig | None = None,
                  related_min: float = RELATED_MIN_SCORE):
    """clusters + profiles + edges (+scored for RELATED_ENTITIES) →
    nested entity report Dataset (REPORT_SCHEMA)."""
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
    best = best_edges(edges)
    enriched = enriched.join(
        best, join_type="left_outer", num_partitions=n_part, on=("uid",)
    )

    def project_member(batch: pd.DataFrame) -> pa.Table:
        cols = {}
        for name, typ in _ROW_FIELDS.items():
            if name == "related_id":
                cols[name] = pa.array([None] * len(batch), typ)
            elif name == "rel_score":
                cols[name] = pa.array([None] * len(batch), typ)
            else:
                cols[name] = pa.array(batch[name], typ)
        return pa.table(cols)

    rows = enriched.map_batches(project_member, batch_format="pandas")
    if scored is not None:
        rel = related_pairs(scored, clusters, cfg, related_min)

        def project_related(batch: pd.DataFrame) -> pa.Table:
            cols = {}
            for name, typ in _ROW_FIELDS.items():
                if name in ("entity_id", "related_id", "rel_score"):
                    cols[name] = pa.array(batch[name], typ)
                else:
                    cols[name] = pa.array([None] * len(batch), typ)
            return pa.table(cols)

        rows = rows.union(rel.map_batches(project_related,
                                          batch_format="pandas"))
    return rows.groupby("entity_id").map_groups(
        _build_entity, batch_format="pyarrow"
    )
