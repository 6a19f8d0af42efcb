"""E2E gates: pairwise F1 ≥ 0.99 + cluster equivalence (north rule).

Analogue of the reference's golden-count E2E
(``test/test_flow.py:82-91``: 120 records → 74 entities), strengthened to
content-aware set-of-frozensets comparison (we're deterministic; Senzing
ids aren't, which is why the reference only compares line counts).
"""

import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import cluster_partition


def pairwise_f1(clusters: pd.DataFrame, labeled: pd.DataFrame) -> tuple[float, float, float]:
    m = clusters.set_index("url")["entity_id"]
    pred = labeled["url_a"].map(m) == labeled["url_b"].map(m)
    tp = int((pred & labeled.is_match).sum())
    fp = int((pred & ~labeled.is_match).sum())
    fn = int((~pred & labeled.is_match).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec, 2 * prec * rec / max(prec + rec, 1e-12)


def test_pairwise_f1_gate(resolved, corpus):
    _, clusters = resolved
    labeled = pq.read_table(corpus + "/labeled_pairs.parquet").to_pandas()
    prec, rec, f1 = pairwise_f1(clusters, labeled)
    assert f1 >= 0.99, (prec, rec, f1)


def test_cluster_equivalence(resolved, corpus):
    _, clusters = resolved
    truth = pq.read_table(corpus + "/expected_clusters.parquet").to_pandas()
    assert cluster_partition(clusters, "entity_id") == cluster_partition(
        truth, "entity_id"
    )


def test_template_farm_is_one_entity(resolved, corpus):
    """The engineered hot block (SURVEY.md §4.1 skew) must still resolve
    into a single entity despite salted block splitting."""
    _, clusters = resolved
    farm = clusters[clusters["url"].str.startswith("https://shop.example.net/")]
    assert len(farm) > 0
    assert farm["entity_id"].nunique() == 1


def test_upsert_dedup(resolved, corpus):
    """Duplicate urls (different warc_ts) collapse to one row — the
    reference's add_record replace semantics (README.md:222-228)."""
    _, clusters = resolved
    assert clusters["url"].is_unique
    pages = pq.read_table(corpus + "/pages.parquet", columns=["url"]).to_pandas()
    assert len(clusters) == pages["url"].nunique()


def test_entity_ids_deterministic(resolved, corpus, ray_session):
    """Re-running the pipeline yields byte-identical cluster ids."""
    from sqs_entity_resolution_ray.pipelines.resolve import read_pages, resolve

    _, clusters1 = resolved
    art2 = resolve(read_pages(corpus + "/pages.parquet"))
    clusters2 = art2.clusters.to_pandas()
    a = clusters1.sort_values("url").reset_index(drop=True)
    b = clusters2.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_distributed_cc_matches_driver(resolved, corpus, ray_session):
    """The distributed label-propagation path converges to the same
    fixpoint as driver union-find (the redo-loop analogue, SURVEY §2.8)."""
    from sqs_entity_resolution_ray.stages.clustering import (
        clusters_with_size,
        connected_components,
    )

    art, clusters_driver = resolved
    nodes = art.profiles.select_columns(["uid"]).rename_columns({"uid": "url"})
    cc_edges = art.edges.rename_columns({"uid_a": "url_a", "uid_b": "url_b"})
    labels = connected_components(nodes, cc_edges, algorithm="distributed")
    clusters_dist = clusters_with_size(labels).to_pandas()
    # compare as partitions over uids (the distributed path is uid-keyed)
    driver_part = set(
        frozenset(g) for _, g in clusters_driver.groupby("entity_id")["uid"]
    )
    dist_part = set(
        frozenset(g) for _, g in clusters_dist.groupby("entity_id")["url"]
    )
    assert dist_part == driver_part


def test_doc_derived_corpus_truth(ray_session):
    """The benchmark corpus (pages derived from the documents table):
    (1) recall — all variants of one source doc share an entity;
    (2) precision — clusters spanning several source docs are justified:
    the testdata documents table itself contains seeded near-duplicate
    docs (e.g. identical text + ' dup', Jaccard ≈ 0.96), so every doc
    merged across sources must be a genuine near-dup of another doc in
    its cluster."""
    import duckdb
    import pandas as pd

    from sqs_entity_resolution_ray.pipelines.resolve import read_pages, resolve
    from sqs_entity_resolution_ray.sources.corpus import pages_from_documents

    d = pages_from_documents("/root/testdata/sf0.001")
    clusters = resolve(read_pages(d + "/pages")).clusters.to_pandas()
    clusters["doc"] = clusters["url"].str.extract(r"/(\d+)/v\d+$")[0].astype(int)

    # (1) recall: one entity per source doc
    assert (clusters.groupby("doc")["entity_id"].nunique() == 1).all()

    # (2) precision: multi-doc clusters must be near-dup doc groups
    texts = dict(
        duckdb.sql(
            "SELECT doc_id, text FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    )

    def j3(a, b):
        ta, tb = a.split(), b.split()
        sa = set(zip(ta, ta[1:], ta[2:]))
        sb = set(zip(tb, tb[1:], tb[2:]))
        return len(sa & sb) / max(len(sa | sb), 1)

    for _, grp in clusters.groupby("entity_id"):
        docs = sorted(grp["doc"].unique())
        if len(docs) == 1:
            continue
        for doc in docs:
            assert any(
                j3(texts[doc], texts[o]) >= 0.5 for o in docs if o != doc
            ), f"doc {doc} merged without near-dup evidence: {docs}"

def test_driver_cc_collects_only_edge_endpoints(ray_session, monkeypatch):
    """The auto-selected driver CC path must never pull the node set to
    the driver (round-3 VERDICT #1): at web scale nodes ≈ every doc while
    edges are few. Spy on Dataset.to_pandas during the call and assert
    only edge-sized collections happen; labels still match union-find
    semantics (components labeled by min node id, singletons by own id).
    """
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.clustering import (
        connected_components,
        node_ids,
    )

    n = 5000
    nodes = rd.from_pandas(pd.DataFrame({"url": [f"u{i}" for i in range(n)]}))
    edges_df = pd.DataFrame(
        {"url_a": ["u1", "u2", "u10"], "url_b": ["u2", "u3", "u11"]}
    )
    edges = rd.from_pandas(edges_df)

    collected = []
    orig = rd.Dataset.to_pandas

    def spy(self, *a, **k):
        df = orig(self, *a, **k)
        collected.append(len(df))
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", spy)
    labels_ds = connected_components(nodes, edges, algorithm="auto")
    monkeypatch.undo()

    assert collected, "driver path should collect the (tiny) edge list"
    assert max(collected) <= 2 * len(edges_df), collected

    labels = labels_ds.to_pandas()
    assert len(labels) == n
    lab = labels.set_index("url")["label"]
    # clustered nodes share the min member node id as label
    for group in (["u1", "u2", "u3"], ["u10", "u11"]):
        ids = node_ids(group)
        assert set(lab[g] for g in group) == {ids.min()}
    # singletons keep their own node id
    singles = [f"u{i}" for i in (0, 4, 100, 4999)]
    assert (lab[singles].to_numpy() == node_ids(singles)).all()
    assert labels["label"].nunique() == n - 5 + 2
