"""Entity report shape test (RESOLVED_ENTITY analogue, SURVEY §2.5 A4)."""


def test_entity_report(resolved, ray_session):
    from sqs_entity_resolution_ray.stages.report import entity_report

    art, clusters = resolved
    rep = entity_report(art.clusters, art.profiles, art.edges).to_pandas()
    assert len(rep) == clusters["entity_id"].nunique()
    assert set(rep.columns) == {"entity_id", "cluster_size", "records", "features"}
    # member counts agree with the cluster map
    sizes = clusters.groupby("entity_id").size()
    for _, row in rep.sample(min(20, len(rep)), random_state=0).iterrows():
        assert row["cluster_size"] == sizes[row["entity_id"]]
        assert len(row["records"]) == row["cluster_size"]
        urls = [r["url"] for r in row["records"]]
        assert urls == sorted(urls)  # deterministic member order
    # multi-member entities carry a match explanation (MATCH_KEY analogue)
    multi = rep[rep["cluster_size"] > 1].iloc[0]
    assert any(r["match_key"] for r in multi["records"])
