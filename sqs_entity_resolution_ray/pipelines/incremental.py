"""Incremental re-resolution (SURVEY.md §2 S5).

The reference's redoer re-resolves only the records the engine flags as
affected until the redo queue drains (``middleware/redoer.py:90-212``);
a full re-resolve per increment is not viable at 100 TB. Here the unit
of re-work is the LSH block:

1. the delta's pages are profiled (extract → minhash/simhash) — work
   proportional to the delta;
2. upsert against stored profiles is a broadcast comparison (the delta
   url set ships once; stored profiles are filtered per batch with a
   vectorized searchsorted — no corpus shuffle);
3. blocking is scoped to the band keys the touched docs emit: stored
   profiles are scanned once (narrow uid+bands columns, no shuffle) and
   only rows landing in touched bands enter pair enumeration;
4. scoring covers only pairs with ≥1 touched endpoint — pairs among
   untouched docs keep their stored edges (their bands did not change,
   so their candidate set did not either);
5. connected components re-runs over (stored ∪ fresh) edges — the edge
   list is ~the matched-pair count, orders of magnitude smaller than
   the corpus, and label propagation is the cheap stage.

Caveat (documented, connectivity-preserving): for mega-blocks larger
than ``PipelineConfig.max_block_size`` the salted chunking of a block
changes when its membership changes, so the incremental pair set for
such blocks is not byte-identical to a full recompute's — but every
new member is paired into the block, which preserves the transitive
connectivity that determines the clusters.

State layout under ``state_dir`` (atomic checkpoint dirs with lineage
manifests — state/checkpoint.py): ``profiles/``, ``edges/``,
``clusters/``. At 100 TB the profiles store would be hash-partitioned
by uid range so an increment rewrites only touched partitions; here a
single checkpoint dir keeps the semantics testable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import MatchConfig, PipelineConfig
from ..state.checkpoint import read_manifest, write_checkpoint
from ..stages.blocking import BAND_PARTITIONS, PartitionPairEnumerator, emit_band_rows
from ..stages.clustering import clusters_with_size, connected_components
from ..stages.scoring import matched_edges, score_pairs
from .resolve import attach_url_strings, build_profiles, read_pages


@dataclass
class IncrementalResult:
    clusters: rd.Dataset     # (uid, entity_id, cluster_size, url)
    profiles: rd.Dataset     # merged profile store
    edges: rd.Dataset        # merged matched-edge store
    n_pairs_scored: int      # scoring work this run (the proportionality gauge)
    full_run: bool           # True when no prior state existed
    affected: list[str]      # entity ids whose member set changed this run


def _ray_sorted_ref(arr: np.ndarray):
    """ray.put a sorted copy (broadcast once, searchsorted per batch)."""
    import ray

    return ray.put(np.sort(arr))


def _state_paths(state_dir: str) -> dict[str, str]:
    return {k: os.path.join(state_dir, k)
            for k in ("profiles", "edges", "clusters")}


def _have_state(paths: dict[str, str]) -> bool:
    return all(read_manifest(p) is not None for p in paths.values())


def _read_ckpt(path: str) -> rd.Dataset:
    import glob

    return rd.read_parquet(sorted(glob.glob(os.path.join(path, "*.parquet"))))


def _save_state(paths, profiles, edges, clusters, tag: str) -> None:
    write_checkpoint(profiles, paths["profiles"], tag,
                     extra={"stage": "profiles"})
    write_checkpoint(edges, paths["edges"], tag, extra={"stage": "edges"})
    write_checkpoint(clusters, paths["clusters"], tag,
                     extra={"stage": "clusters"})


def _diff_affected(prev_clusters: rd.Dataset | None,
                   new_clusters: rd.Dataset,
                   cfg: PipelineConfig | None = None) -> list[str]:
    """Distributed (url, entity_id) map diff — only the churn-sized
    affected-id list reaches the driver (state/tracker.py
    affected_entities_ds)."""
    from ..state.tracker import affected_entities_ds

    aff, _deleted = affected_entities_ds(prev_clusters, new_clusters, cfg=cfg)
    return aff


def resolve_incremental(new_pages, state_dir: str,
                        match_cfg: MatchConfig | None = None,
                        cfg: PipelineConfig | None = None,
                        run_tag: str = "incr") -> IncrementalResult:
    """Fold ``new_pages`` (path or Dataset) into the resolved state at
    ``state_dir``; first call (no state) is a full resolve."""
    match_cfg = match_cfg or MatchConfig()
    cfg = cfg or PipelineConfig()
    paths = _state_paths(state_dir)
    os.makedirs(state_dir, exist_ok=True)

    if not _have_state(paths):
        from .resolve import resolve

        art = resolve(read_pages(new_pages), match_cfg, cfg)
        clusters = art.clusters.materialize()
        n_pairs = art.scored.count()
        _save_state(paths, art.profiles, art.edges, clusters, run_tag)
        return IncrementalResult(
            clusters=clusters, profiles=art.profiles, edges=art.edges,
            n_pairs_scored=n_pairs, full_run=True,
            affected=_diff_affected(None, clusters, cfg),
        )

    stored_profiles = _read_ckpt(paths["profiles"])
    stored_edges = _read_ckpt(paths["edges"])
    prev_clusters = _read_ckpt(paths["clusters"])

    pages_ds = read_pages(new_pages)
    if pages_ds.count() == 0:  # empty queue drain: nothing to fold in
        clusters = _read_ckpt(paths["clusters"])
        return IncrementalResult(
            clusters=clusters, profiles=stored_profiles, edges=stored_edges,
            n_pairs_scored=0, full_run=False, affected=[],
        )

    # 1. delta profiles (extract + sketch + within-delta upsert)
    delta = build_profiles(pages_ds, match_cfg, cfg).materialize()
    # the delta is the drained queue batch — small by definition; its
    # key columns broadcast to the stored-profile scan
    ddf = delta.to_pandas()

    # 2. upsert merge: winner per url = max (warc_ts, simhash), the same
    # tie-break dedup_profiles_by_url applies in a full run. The stored
    # side scan broadcasts the (small) delta url set; the compare is one
    # inner merge + vectorized lexicographic tuple comparison — no
    # per-row .loc (stored urls are unique, so the merge is 1:≤1). An
    # inner merge keeps the stored warc_ts/simhash dtypes exact (a left
    # merge's NaN padding would promote simhash to float64 and corrupt
    # 64-bit equality above 2^53).
    delta_urls_ref = _ray_sorted_ref(ddf["url"].to_numpy(dtype=object))

    def stored_for_delta(t: pa.Table) -> pa.Table:
        import ray as _ray

        du = _ray.get(delta_urls_ref)
        sel = t.select(["url", "warc_ts", "simhash"])
        if len(du) == 0:  # empty delta (profiling dropped every row):
            return sel.slice(0, 0)  # searchsorted clamp would index du[-1]
        urls = np.asarray(t.column("url").to_pylist(), dtype=object)
        idx = np.minimum(np.searchsorted(du, urls), len(du) - 1)
        return sel.filter(pa.array(du[idx] == urls))

    sp_small = stored_profiles.map_batches(
        stored_for_delta, batch_format="pyarrow").to_pandas()
    if sp_small.empty:  # all-new urls: empty result drops its columns
        sp_small = pd.DataFrame(
            {"url": pd.Series(dtype=object),
             "warc_ts": pd.Series(dtype=ddf["warc_ts"].dtype),
             "simhash": pd.Series(dtype=np.uint64)})
    hit = ddf[["url"]].reset_index(names="_pos").merge(
        sp_small, on="url", how="inner")
    rows = hit["_pos"].to_numpy()
    d_ts = ddf["warc_ts"].to_numpy()[rows]
    d_sh = ddf["simhash"].to_numpy().astype(np.uint64)[rows]
    s_ts = hit["warc_ts"].to_numpy()
    s_sh = hit["simhash"].to_numpy().astype(np.uint64)
    delta_wins = np.ones(len(ddf), dtype=bool)
    identical = np.zeros(len(ddf), dtype=bool)
    in_store = np.zeros(len(ddf), dtype=bool)
    in_store[rows] = True
    ts_eq = d_ts == s_ts
    delta_wins[rows] = (d_ts > s_ts) | (ts_eq & (d_sh >= s_sh))
    identical[rows] = ts_eq & (d_sh == s_sh)
    # touched = delta rows that change the store (new url, or a winning
    # non-identical replacement); identical redelivery is a no-op
    # (at-least-once idempotence)
    touched_mask = delta_wins & ~identical
    touched_df = ddf[touched_mask]
    touched_uids = set(int(u) for u in touched_df["uid"])
    replaced_urls = set(ddf.loc[touched_mask & in_store, "url"])
    replaced_uids = set(int(u) for u in ddf.loc[touched_mask & in_store, "uid"])

    if not touched_uids:
        clusters = _read_ckpt(paths["clusters"])
        return IncrementalResult(
            clusters=clusters, profiles=stored_profiles, edges=stored_edges,
            n_pairs_scored=0, full_run=False, affected=[],
        )

    # merged profiles: drop stored rows for replaced urls (broadcast
    # filter — no shuffle), union the winning delta rows
    import ray

    repl_ref = ray.put(np.sort(np.asarray(sorted(replaced_urls), dtype=object)))

    def drop_replaced(t: pa.Table) -> pa.Table:
        repl = ray.get(repl_ref)
        if len(repl) == 0:
            return t
        urls = np.asarray(t.column("url").to_pylist(), dtype=object)
        idx = np.minimum(np.searchsorted(repl, urls), len(repl) - 1)
        keep = repl[idx] != urls
        return t.filter(pa.array(keep))

    survivors = stored_profiles.map_batches(drop_replaced,
                                            batch_format="pyarrow")
    # winners filtered from the delta DATASET (not a pandas round-trip)
    # so the Arrow schema matches the stored side exactly for the union
    win_ref = ray.put(np.sort(np.fromiter(touched_uids, dtype=np.int64)))

    def keep_winners(t: pa.Table) -> pa.Table:
        wu = ray.get(win_ref)
        u = t.column("uid").to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(wu, u), len(wu) - 1)
        return t.filter(pa.array(wu[idx] == u))

    winners = delta.map_batches(keep_winners,
                                batch_format="pyarrow").materialize()
    merged_profiles = survivors.union(winners).materialize()

    # 3. blocking scoped to touched bands (band shuffle resolves its
    # partition count through the one config knob — config.py:146)
    from ..config import bucket_partitions

    n_bucket = bucket_partitions(cfg, BAND_PARTITIONS)
    touched_rows = winners.map_batches(
        emit_band_rows, batch_format="pyarrow",
        fn_kwargs={"lsh_bands": match_cfg.lsh_bands, "num_parts": n_bucket},
    ).materialize()
    touched_keys = np.unique(np.asarray(
        touched_rows.select_columns(["band_key"]).to_pandas()["band_key"],
        dtype=np.uint64))
    keys_ref = ray.put(touched_keys)

    def bands_in_touched(t: pa.Table) -> pa.Table:
        tk = ray.get(keys_ref)
        keys = t.column("band_key").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        idx = np.minimum(np.searchsorted(tk, keys), len(tk) - 1)
        return t.filter(pa.array(tk[idx] == keys))

    old_rows = survivors.select_columns(["uid", "bands"]).map_batches(
        emit_band_rows, batch_format="pyarrow",
        fn_kwargs={"lsh_bands": match_cfg.lsh_bands, "num_parts": n_bucket},
    ).map_batches(bands_in_touched, batch_format="pyarrow")

    enumerator = PartitionPairEnumerator(cfg, match_cfg.lsh_bands)
    raw_pairs = touched_rows.union(old_rows).groupby(
        "part", num_partitions=n_bucket
    ).map_groups(lambda g: enumerator(g), batch_format="pyarrow")

    # only pairs with a touched endpoint need scoring; old-old pairs in
    # touched bands were scored in a previous run (their edges persist)
    tu_ref = ray.put(np.sort(np.fromiter(touched_uids, dtype=np.int64)))

    def touched_pairs(t: pa.Table) -> pa.Table:
        tu = ray.get(tu_ref)
        ua = t.column("uid_a").to_numpy(zero_copy_only=False)
        ub = t.column("uid_b").to_numpy(zero_copy_only=False)

        def is_in(x):
            idx = np.minimum(np.searchsorted(tu, x), len(tu) - 1)
            return tu[idx] == x

        return t.filter(pa.array(is_in(ua) | is_in(ub)))

    from ..stages.agg import hash_aggregate

    pairs = hash_aggregate(
        raw_pairs.map_batches(touched_pairs, batch_format="pyarrow"),
        ["uid_a", "uid_b"], {"block_size": ("block_size", "max")},
        cfg=cfg,
    ).materialize()
    n_pairs = pairs.count()

    # scoring sees only the profiles that participate in new pairs.
    # Endpoint distinct runs DISTRIBUTED (per-batch np.unique combiner +
    # hash aggregate), and the driver collects only the distinct array
    # via the Arrow-native object-store pull — a large increment (10%
    # refresh at 100x) never builds a Python set on the driver.
    if n_pairs:
        from ..stages.scoring import broadcast_columns

        def pair_endpoints(t: pa.Table) -> pa.Table:
            ua = t.column("uid_a").to_numpy(zero_copy_only=False)
            ub = t.column("uid_b").to_numpy(zero_copy_only=False)
            return pa.table({"uid": pa.array(
                np.unique(np.concatenate([ua, ub])), pa.int64())})

        distinct = hash_aggregate(
            pairs.map_batches(pair_endpoints, batch_format="pyarrow"),
            ["uid"], {"_n": ("uid", "count")}, cfg=cfg,
        ).select_columns(["uid"])
        tbl = broadcast_columns(distinct, ["uid"])
        pair_uid_arr = (np.sort(tbl.column("uid").to_numpy().astype(np.int64))
                        if tbl is not None else np.empty(0, dtype=np.int64))
    else:
        pair_uid_arr = np.empty(0, dtype=np.int64)
    pu_ref = ray.put(pair_uid_arr)

    def profiles_in_pairs(t: pa.Table) -> pa.Table:
        pu = ray.get(pu_ref)
        if len(pu) == 0:
            return t.slice(0, 0)
        u = t.column("uid").to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(pu, u), len(pu) - 1)
        return t.filter(pa.array(pu[idx] == u))

    if n_pairs:
        scoring_profiles = merged_profiles.map_batches(
            profiles_in_pairs, batch_format="pyarrow").materialize()
        scored = score_pairs(pairs, scoring_profiles, match_cfg, cfg,
                             n_pairs=n_pairs)
        new_edges = matched_edges(scored)
    else:
        new_edges = rd.from_arrow(pa.table({
            "uid_a": pa.array([], pa.int64()),
            "uid_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "est_jaccard": pa.array([], pa.float64()),
            "simhash_hd": pa.array([], pa.int32()),
            "title_jw": pa.array([], pa.float64()),
        }))

    # 4. merge edges: stale edges (an endpoint was replaced) drop out;
    # edges of brand-new uids don't exist yet, so no duplicates arise
    ru_ref = ray.put(np.sort(np.fromiter(replaced_uids, dtype=np.int64))
                     if replaced_uids else np.empty(0, dtype=np.int64))

    def drop_stale(t: pa.Table) -> pa.Table:
        ru = ray.get(ru_ref)
        if len(ru) == 0:
            return t
        ua = t.column("uid_a").to_numpy(zero_copy_only=False)
        ub = t.column("uid_b").to_numpy(zero_copy_only=False)

        def is_in(x):
            idx = np.minimum(np.searchsorted(ru, x), len(ru) - 1)
            return ru[idx] == x

        return t.filter(pa.array(~(is_in(ua) | is_in(ub))))

    kept_edges = stored_edges.map_batches(drop_stale, batch_format="pyarrow")
    merged_edges = kept_edges.union(new_edges).materialize()

    # 5. labels re-converge over the merged edge list
    nodes = merged_profiles.select_columns(["uid"]).rename_columns(
        {"uid": "url"})
    cc_edges = merged_edges.rename_columns({"uid_a": "url_a",
                                            "uid_b": "url_b"})
    labels = connected_components(nodes, cc_edges, cfg)
    clusters_uid = clusters_with_size(labels, cfg).rename_columns(
        {"url": "uid"})
    clusters = attach_url_strings(
        clusters_uid, merged_profiles, cfg).materialize()

    affected = _diff_affected(prev_clusters, clusters, cfg)
    _save_state(paths, merged_profiles, merged_edges, clusters, run_tag)
    return IncrementalResult(
        clusters=clusters, profiles=merged_profiles, edges=merged_edges,
        n_pairs_scored=n_pairs, full_run=False, affected=affected,
    )
