"""Transitive clustering: distributed hash-min label propagation.

The Ray analogue of the reference's redo loop (``middleware/redoer.py:
90-212``): Senzing reaches order-insensitive convergence by re-resolving
records until its redo queue drains; we reach the same fixpoint by
repeating min-label propagation rounds until no label changes (SURVEY.md
§2.8 / P-2). Connected components over groupby/aggregate rounds converge
in O(diameter) rounds (cf. the ICDE'13 log-round map-reduce CC bound,
PAPERS.md); near-duplicate components are shallow, and our salted block
chunking bounds chain length.

Two execution paths, same semantics:
- ``distributed``: per-round hash join (edge ⋈ labels) + groupby-min,
  fixpoint detected by counting changed labels — scales to edge sets
  that don't fit the driver.
- ``driver``: union-find on collected edges — O(E α(E)), used
  automatically when the edge count is small (the common case after
  LSH + scoring, where edges ≈ matched near-dup pairs only). Only the
  EDGE ENDPOINTS (≤ 2·edges keys) ever reach the driver; the node set
  itself — at web scale ~every document, mostly singletons — is labeled
  in place by a stateless ``map_batches`` (label = own node id unless
  the node is an edge endpoint), so the driver path is valid at ANY
  corpus size whenever the edge count is small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import effective_concurrency, effective_partitions, PipelineConfig
from ..functions.hashing import hash_str_array  # noqa: F401 (used via node_ids)

DRIVER_CC_MAX_EDGES = 2_000_000


def node_ids(urls) -> np.ndarray:
    """Node ids for a key array: integer keys pass through; string keys
    hash to 63-bit int64 (see hashing.node_ids_from_strings)."""
    arr = np.asarray(urls)
    if arr.dtype.kind in "iu":
        return arr.astype(np.int64)
    from ..functions.hashing import node_ids_from_strings

    return node_ids_from_strings(list(urls))


def _label_table(urls, labels: np.ndarray) -> pa.Table:
    # node keys may be strings (record pipeline) or int64 uids (pages)
    return pa.table(
        {"url": pa.array(urls), "label": pa.array(labels, pa.int64())}
    )


def _driver_union_find(nodes_df: pd.DataFrame, edges_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find on the driver. nodes: (url, node_id); edges: (url_a, url_b)."""
    urls = nodes_df["url"].to_numpy()
    index = {u: i for i, u in enumerate(urls)}
    parent = np.arange(len(urls), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges_df["url_a"], edges_df["url_b"]):
        ia, ib = index.get(a), index.get(b)
        if ia is None or ib is None:
            continue
        ra, rb = find(ia), find(ib)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.fromiter((find(i) for i in range(len(urls))), dtype=np.int64,
                        count=len(urls))
    node_ids = nodes_df["node_id"].to_numpy()
    # label of a component = min node_id over members (deterministic)
    df = pd.DataFrame({"root": roots, "node_id": node_ids})
    comp_label = df.groupby("root")["node_id"].transform("min")
    return pd.DataFrame({"url": urls, "label": comp_label.to_numpy()})


def connected_components(
    nodes, edges, cfg: PipelineConfig | None = None, algorithm: str = "auto"
):
    """nodes(url) + edges(url_a, url_b) → labels Dataset (url, label: uint64).

    ``label`` is the min url-hash over the component — deterministic and
    stable across runs/resumes (no engine-assigned sequence ids, unlike
    Senzing's ENTITY_ID from its Postgres sequence).
    """
    cfg = cfg or PipelineConfig()
    edge_count = edges.count()
    if algorithm == "auto":
        algorithm = "driver" if edge_count <= DRIVER_CC_MAX_EDGES else "distributed"

    if algorithm == "driver":
        import ray

        # Union-find over EDGE ENDPOINTS only (≤ 2·edges keys collected —
        # never the node set: at web scale nodes ≈ every document while
        # edges ≈ the few matched pairs). Assumes edge endpoints are
        # drawn from ``nodes`` (true for every caller: both sides come
        # from the same profile/id table).
        if edge_count:
            edges_df = edges.select_columns(["url_a", "url_b"]).to_pandas()
            endpoints = pd.unique(
                pd.concat([edges_df["url_a"], edges_df["url_b"]],
                          ignore_index=True)
            )
            ep_df = pd.DataFrame({"url": endpoints})
            ep_df["node_id"] = node_ids(list(endpoints))
            labeled = _driver_union_find(ep_df, edges_df)  # ep_df row order
            ep_ids = ep_df["node_id"].to_numpy()
            order = np.argsort(ep_ids)
            ref = ray.put((
                ep_ids[order],
                labeled["label"].to_numpy().astype(np.int64)[order],
            ))
        else:
            ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

        def attach_labels(batch: pa.Table) -> pa.Table:
            """Stateless distributed labeling: endpoint nodes gather their
            component label from the broadcast map; singletons (the vast
            majority) keep label = own node id without leaving the
            cluster."""
            ep_s, lab_s = ray.get(ref)
            col = batch.column("url")
            ids = node_ids(col.to_pylist())
            labels = ids.copy()
            if len(ep_s):
                idx = np.minimum(np.searchsorted(ep_s, ids), len(ep_s) - 1)
                hit = ep_s[idx] == ids
                labels[hit] = lab_s[idx[hit]]
            return pa.table(
                {"url": col, "label": pa.array(labels, pa.int64())}
            )

        return nodes.select_columns(["url"]).map_batches(
            attach_labels, batch_format="pyarrow"
        )

    return _distributed_cc(nodes, edges, cfg, edge_count=edge_count)


def _init_labels(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    return _label_table(urls, node_ids(urls))


def _distributed_cc(nodes, edges, cfg: PipelineConfig,
                    edge_count: int | None = None):
    """Hash-min label propagation to fixpoint via join + groupby-min."""
    from ..config import partitions_for

    labels = nodes.select_columns(["url"]).map_batches(
        _init_labels, batch_format="pyarrow"
    ).materialize()

    # no edges → every node is its own component; the init labels are
    # already the fixpoint (and an empty edge dataset's blocks can be
    # schema-less, which the per-round joins cannot consume)
    if (edge_count if edge_count is not None else edges.count()) == 0:
        return labels

    # both directions once; static for all rounds. The identity
    # map_batches pins the blocks to Arrow: rename_columns/union below
    # require Arrow blocks, but callers may hand in pandas-backed edge
    # datasets (e.g. ray.data.from_pandas).
    fwd = edges.select_columns(["url_a", "url_b"]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    rev = fwd.rename_columns({"url_a": "url_b", "url_b": "url_a"}).select_columns(
        ["url_a", "url_b"]
    )  # normalize column ORDER so union blocks share one schema
    directed = fwd.union(rev).materialize()  # (url_a=src, url_b=dst)
    n_part = partitions_for(max(directed.count(), labels.count()), cfg)

    for _round in range(cfg.max_cc_rounds):
        # candidate labels for dst = current label of src
        msgs = directed.join(
            labels.rename_columns({"url": "url_a"}),
            join_type="inner",
            num_partitions=n_part,
            on=("url_a",),
        ).select_columns(["url_b", "label"]).rename_columns({"url_b": "url"})
        from .agg import hash_aggregate

        new_labels = hash_aggregate(
            labels.select_columns(["url", "label"]).union(
                msgs.select_columns(["url", "label"])),
            ["url"], {"label": ("label", "min")},
            num_partitions=n_part,
        ).select_columns(["url", "label"]).materialize()
        # Ray's hash shuffle synthesizes SCHEMA-LESS empty blocks for
        # hash partitions that received no keys, and the per-round joins
        # below cannot consume them. Empty partitions are only possible
        # when the key count is comparable to n_part (tiny inputs), so
        # coalesce in that regime; at scale the branch never triggers.
        if new_labels.count() <= n_part * 16:
            new_labels = new_labels.repartition(1).materialize()
        # fixpoint check: count rows whose label shrank
        cmp = new_labels.rename_columns({"label": "new_label"}).join(
            labels,
            join_type="inner",
            num_partitions=n_part,
            on=("url",),
        )
        changed = cmp.map_batches(
            lambda t: pa.table(
                {
                    "c": pa.array(
                        [
                            int(
                                pa.compute.sum(
                                    pa.compute.not_equal(
                                        t.column("new_label"), t.column("label")
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        if not changed:
            break
    return labels


BROADCAST_MAX_ROWS = 5_000_000


def clusters_with_size(labels, cfg: PipelineConfig | None = None):
    """labels(url, label) → (url, entity_id: string, cluster_size: int64).

    entity_id = zero-padded hex of the component label (deterministic).
    Cluster sizes come from a two-phase hash aggregate; the (label →
    size) map is broadcast when small (≤5M entries, the common case),
    else hash-joined with data-sized partitions.
    """
    import ray

    from .agg import hash_aggregate
    from ..config import partitions_for

    cfg = cfg or PipelineConfig()
    sizes = hash_aggregate(
        labels, ["label"], {"cluster_size": ("url", "count")}, cfg=cfg
    ).materialize()
    n_clusters = sizes.count()

    def fmt(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        ids = [f"e{int(x):016x}" for x in lab]
        return pa.table(
            {
                "url": batch.column("url"),
                "entity_id": pa.array(ids, pa.string()),
                "cluster_size": batch.column("cluster_size").cast(pa.int64()),
            }
        )

    if n_clusters <= BROADCAST_MAX_ROWS:
        # sorted-array broadcast + searchsorted gather (vectorized; no
        # Python dict shipped per batch)
        sdf = sizes.to_pandas()
        lab_arr = sdf["label"].to_numpy().astype(np.int64)
        order = np.argsort(lab_arr)
        ref = ray.put((lab_arr[order],
                       sdf["cluster_size"].to_numpy()[order].astype(np.int64)))

        def attach(batch: pa.Table) -> pa.Table:
            lab_s, size_s = ray.get(ref)
            lab = batch.column("label").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(lab_s, lab)
            cs = pa.array(size_s[idx], pa.int64())
            return fmt(batch.append_column("cluster_size", cs))

        return labels.map_batches(attach, batch_format="pyarrow")

    joined = labels.join(
        sizes, join_type="inner",
        num_partitions=partitions_for(n_clusters, cfg), on=("label",),
    )
    return joined.map_batches(fmt, batch_format="pyarrow")
