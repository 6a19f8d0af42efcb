"""Entity report assembly (SURVEY.md §2.5 A4 + §1.1 output contract).

Reproduces the shape of the reference's resolved-entity report — one
nested row per entity with a representative name, member records,
per-record match explanation, per-source record tally and aggregated
features (``test/fixtures/flow-output.jsonl:1``:
``RESOLVED_ENTITY{ENTITY_ID, ENTITY_NAME, FEATURES, RECORD_SUMMARY,
RECORDS[{RECORD_ID, MATCH_KEY, ...}]}``) — assembled per hash-bucket
partition with vectorized nested-array offsets, never one Python call
per entity.

Fidelity points beyond the bare cluster map:

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
        ("entity_name", pa.string()),
        ("cluster_size", pa.int32()),
        ("records", pa.list_(RECORD_STRUCT)),
        ("record_summary", pa.map_(pa.string(), pa.int32())),
        ("features", pa.map_(pa.string(), pa.list_(pa.string()))),
        ("related", pa.list_(RELATED_STRUCT)),
    ]
)

# url host = the DATA_SOURCE analogue for web pages (the reference's
# RECORD_SUMMARY tallies member records per DATA_SOURCE,
# test/fixtures/flow-output.jsonl:1)
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)"


def _match_keys(ej: np.ndarray, hd: np.ndarray, jw: np.ndarray) -> np.ndarray:
    """Vectorized MATCH_KEY strings from per-edge evidence."""
    mh = np.where(ej >= MATCH_KEY_MIN_JACCARD, "+MINHASH", "")
    sh = np.where(1.0 - hd / 64.0 >= MATCH_KEY_MIN_SIMHASH, "+SIMHASH", "")
    ti = np.where(jw >= MATCH_KEY_MIN_TITLE_JW, "+TITLE", "")
    out = np.char.add(np.char.add(mh.astype("U16"), sh), ti)
    # a matched pair that crossed the threshold on the combined score
    # without any single dominant signal still gets an explanation
    return np.where(out == "", "+SCORE", out)


def best_edges(edges, cfg: PipelineConfig | None = None):
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
    best = hash_topn(a.union(b), ["uid"], "score", 1, tie_cols=["peer"],
                     cfg=cfg)

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
                          {"rel_score": ("score", "max")}, cfg=cfg)


def _offsets(sorted_codes: np.ndarray, n_groups: int) -> pa.Array:
    """ListArray offsets (len n_groups+1) from ascending group codes."""
    offs = np.empty(n_groups + 1, dtype=np.int64)
    offs[:-1] = np.searchsorted(sorted_codes, np.arange(n_groups), side="left")
    offs[-1] = len(sorted_codes)
    return pa.array(offs.astype(np.int32), pa.int32())


def _build_partition(df: pd.DataFrame) -> pa.Table:
    """One hash-bucket of flat report rows → nested entity rows.

    ONE Python call per partition (not per entity — the repo's own
    blocking docstring names per-key map_groups as the measured scaling
    cliff); every nested column is assembled with vectorized offsets
    (``pa.ListArray/MapArray.from_arrays`` over sort+searchsorted group
    boundaries). Two flat row kinds share the schema: member rows carry
    url, related rows carry related_id (see entity_report's union)."""
    ents = np.unique(df["entity_id"].to_numpy(dtype=object))
    n = len(ents)
    is_mem = df["url"].notna()
    mem = df[is_mem].sort_values(["entity_id", "url"], kind="mergesort")
    rel = df[~is_mem].sort_values(["entity_id", "related_id"],
                                  kind="mergesort")
    mem_ent = mem["entity_id"].to_numpy(dtype=object)
    mem_code = np.searchsorted(ents, mem_ent)

    # records: per-member struct rows grouped by entity offsets
    scores = mem["best_score"].to_numpy(dtype=np.float64)
    has_score = ~np.isnan(scores)
    mkk = mem["match_key"].where(
        mem["match_key"].notna() & has_score, "").to_numpy(dtype=object)
    rec_struct = pa.StructArray.from_arrays(
        [pa.array(mem["url"].to_numpy(dtype=object), pa.string()),
         pa.array(np.where(has_score, scores, 0.0), pa.float32()),
         pa.array(mkk, pa.string())],
        fields=list(RECORD_STRUCT),
    )
    rec_offs = _offsets(mem_code, n)
    records = pa.ListArray.from_arrays(rec_offs, rec_struct)
    cluster_size = np.diff(rec_offs.to_numpy(zero_copy_only=False))

    # entity_name: most frequent non-empty member title, ties by title
    # ascending (a deterministic representative-name pick — the
    # reference's ENTITY_NAME is its engine's best-name selection)
    titled = mem[mem["title"].notna() & (mem["title"] != "")]
    vc = titled.groupby(["entity_id", "title"], sort=False).size()
    vc = vc.reset_index(name="cnt").sort_values(
        ["entity_id", "cnt", "title"], ascending=[True, False, True],
        kind="mergesort").drop_duplicates("entity_id")
    names = np.full(n, "", dtype=object)
    names[np.searchsorted(ents, vc["entity_id"].to_numpy(dtype=object))] = (
        vc["title"].to_numpy(dtype=object))

    # record_summary: member tally per source (url host), sorted by host
    hosts = mem["url"].str.extract(_HOST_RE, expand=False).fillna("")
    tally = pd.DataFrame({"entity_id": mem_ent, "src": hosts.to_numpy()})
    tally = tally.groupby(["entity_id", "src"], sort=False).size()
    tally = tally.reset_index(name="cnt").sort_values(
        ["entity_id", "src"], kind="mergesort")
    rs_offs = _offsets(
        np.searchsorted(ents, tally["entity_id"].to_numpy(dtype=object)), n)
    record_summary = pa.MapArray.from_arrays(
        rs_offs,
        pa.array(tally["src"].to_numpy(dtype=object), pa.string()),
        pa.array(tally["cnt"].to_numpy(dtype=np.int32), pa.int32()),
    )

    # features map: TITLE then LANG per entity (both keys always
    # present, possibly with empty value lists); values sorted unique
    frames = []
    for rank, col in ((0, "title"), (1, "lang")):
        u = mem[["entity_id", col]].rename(columns={col: "val"})
        u = u[u["val"].notna() & (u["val"] != "")].drop_duplicates()
        u["rank"] = rank
        frames.append(u)
    fr = pd.concat(frames).sort_values(["entity_id", "rank", "val"],
                                       kind="mergesort")
    fr_code = (np.searchsorted(ents, fr["entity_id"].to_numpy(dtype=object))
               * 2 + fr["rank"].to_numpy())
    items = pa.ListArray.from_arrays(
        _offsets(fr_code, 2 * n),
        pa.array(fr["val"].to_numpy(dtype=object), pa.string()),
    )
    features = pa.MapArray.from_arrays(
        pa.array((np.arange(n + 1) * 2).astype(np.int32), pa.int32()),
        pa.array(np.tile(np.array(["TITLE", "LANG"], dtype=object), n),
                 pa.string()),
        items,
    )

    # related: near-miss peers grouped by entity offsets
    rel_code = np.searchsorted(ents, rel["entity_id"].to_numpy(dtype=object))
    rel_struct = pa.StructArray.from_arrays(
        [pa.array(rel["related_id"].to_numpy(dtype=object), pa.string()),
         pa.array(np.full(len(rel), "POSSIBLY_RELATED", dtype=object),
                  pa.string()),
         pa.array(rel["rel_score"].to_numpy(dtype=np.float64), pa.float32())],
        fields=list(RELATED_STRUCT),
    )
    related = pa.ListArray.from_arrays(_offsets(rel_code, n), rel_struct)

    return pa.table(
        {
            "entity_id": pa.array(ents, pa.string()),
            "entity_name": pa.array(names, pa.string()),
            "cluster_size": pa.array(cluster_size.astype(np.int32),
                                     pa.int32()),
            "records": records,
            "record_summary": record_summary,
            "features": features,
            "related": related,
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
    best = best_edges(edges, cfg)
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
    # hash-bucket entity ids → ONE vectorized assembly call per
    # partition (same single-int-key shuffle as stages/agg.py); a
    # per-entity map_groups here was the measured scaling cliff
    n_buckets = max(16, n_part)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["entity_id"], index=False)
        batch["part"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pa.Table:
        return _build_partition(group.drop(columns=["part"]))

    return rows.map_batches(add_part, batch_format="pandas").groupby(
        "part", num_partitions=n_buckets
    ).map_groups(build, batch_format="pandas")
