"""Property-based gate for the clustering core: on arbitrary random
graphs, ``connected_components`` (both execution paths) must reproduce
the partition computed by an independent breadth-first search written
here, and must label each component with the min node-id hash over its
members (the determinism contract of clustering.py — the Ray analogue
of Senzing's order-insensitive redo convergence, reference
middleware/redoer.py:90-212)."""

import pandas as pd
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from sqs_entity_resolution_ray.stages.clustering import (
    connected_components,
    node_ids,
)


def _bfs_partition(n: int, edge_idx: list[tuple[int, int]]) -> list[set]:
    adj = [[] for _ in range(n)]
    for a, b in edge_idx:
        adj[a].append(b)
        adj[b].append(a)
    seen, comps = [False] * n, []
    for s in range(n):
        if seen[s]:
            continue
        comp, queue = set(), [s]
        seen[s] = True
        while queue:
            v = queue.pop()
            comp.add(v)
            for w in adj[v]:
                if not seen[w]:
                    seen[w] = True
                    queue.append(w)
        comps.append(comp)
    return comps


def _partition_of(labels_df: pd.DataFrame) -> set[frozenset]:
    return set(
        frozenset(g["url"]) for _, g in labels_df.groupby("label")
    )


def _run_cc(n: int, edge_idx: list[tuple[int, int]], algorithm: str):
    urls = [f"u{i}" for i in range(n)]
    nodes = ray.data.from_pandas(pd.DataFrame({"url": urls}))
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "url_a": [urls[a] for a, _ in edge_idx],
                "url_b": [urls[b] for _, b in edge_idx],
            },
            dtype="object" if edge_idx else "string",
        )
    )
    labels = connected_components(nodes, edges, algorithm=algorithm)
    df = labels.to_pandas()
    # every node labeled exactly once
    assert sorted(df["url"]) == sorted(urls)
    # partition equals the independent BFS ground truth
    truth = set(
        frozenset(urls[i] for i in comp)
        for comp in _bfs_partition(n, edge_idx)
    )
    assert _partition_of(df) == truth
    # label contract: min node-id hash over the component's members
    ids = dict(zip(urls, node_ids(urls)))
    for _, g in df.groupby("label"):
        assert g["label"].iloc[0] == min(ids[u] for u in g["url"])


graph = st.integers(1, 24).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            max_size=40,
        ),
    )
)


@given(graph)
@settings(max_examples=25, deadline=None)
def test_driver_cc_matches_bfs_truth(ray_session, g):
    n, edge_idx = g
    _run_cc(n, edge_idx, algorithm="driver")


@given(graph)
@settings(max_examples=6, deadline=None)
def test_distributed_cc_matches_bfs_truth(ray_session, g):
    n, edge_idx = g
    _run_cc(n, edge_idx, algorithm="distributed")
