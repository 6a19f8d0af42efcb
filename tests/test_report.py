"""Entity report tests (RESOLVED_ENTITY + RELATED_ENTITIES analogue,
SURVEY §2.5 A4 / §1.1)."""

import numpy as np
import pandas as pd


def test_entity_report(resolved, ray_session):
    from sqs_entity_resolution_ray.stages.report import entity_report

    art, clusters = resolved
    rep = entity_report(art.clusters, art.profiles, art.edges).to_pandas()
    assert len(rep) == clusters["entity_id"].nunique()
    assert set(rep.columns) == {"entity_id", "entity_name", "cluster_size",
                                "records", "record_summary", "features",
                                "related"}
    # member counts agree with the cluster map
    sizes = clusters.groupby("entity_id").size()
    for _, row in rep.sample(min(20, len(rep)), random_state=0).iterrows():
        assert row["cluster_size"] == sizes[row["entity_id"]]
        assert len(row["records"]) == row["cluster_size"]
        urls = [r["url"] for r in row["records"]]
        assert urls == sorted(urls)  # deterministic member order
        # RECORD_SUMMARY: per-source (url host) tallies sum to the size
        summary = dict(row["record_summary"])
        assert sum(summary.values()) == row["cluster_size"]
        hosts = {u.split("://", 1)[1].split("/", 1)[0] for u in urls}
        assert set(summary) == hosts
        # ENTITY_NAME is the modal member title (ties → lexicographic)
        titles = [t for f in row["features"] if f[0] == "TITLE"
                  for t in f[1]]
        if titles:
            assert row["entity_name"] in titles
    # multi-member entities carry a match explanation (MATCH_KEY analogue)
    multi = rep[rep["cluster_size"] > 1].iloc[0]
    assert any(r["match_key"] for r in multi["records"])
    # match keys name actual signals, not a constant
    keys = {r["match_key"] for _, row in rep.iterrows()
            for r in row["records"] if r["match_key"]}
    assert keys <= {k for k in keys if k and all(
        p in ("MINHASH", "SIMHASH", "TITLE", "SCORE")
        for p in k.strip("+").split("+"))}


def _near_miss_corpus():
    """Deterministic 4-page corpus: two exact-dup pairs (entities A, B)
    whose cross pairs share a 24-token block — banded together by LSH,
    score ≈ 0.60 ≥ threshold, but rejected by the short-doc evidence
    guard (est_jaccard < 0.55 on < 48 tokens) ⇒ scored non-matches that
    must surface as POSSIBLY_RELATED."""
    import datetime

    import ray.data as rd

    from sqs_entity_resolution_ray.sources.corpus import _render_html

    shared = " ".join(f"tok{i}" for i in range(24))
    a_txt = shared + " " + " ".join(f"aaa{i}" for i in range(12))
    b_txt = shared + " " + " ".join(f"bbb{i}" for i in range(12))
    rows = []
    for name, txt in (("a1", a_txt), ("a2", a_txt),
                      ("b1", b_txt), ("b2", b_txt)):
        rows.append({
            "url": f"https://ex.com/{name}",
            "warc_ts": datetime.datetime(2024, 1, 1),
            "html": _render_html(f"Shared Template {name[0].upper()}",
                                 "nav home", [txt], "footer"),
            "lang": "en",
        })
    return rd.from_pandas(pd.DataFrame(rows))


def test_related_entities(ray_session):
    """RELATED_ENTITIES: near-threshold cross-entity pairs surface as
    POSSIBLY_RELATED — differential-checked against a driver-side
    pandas replication of the same rule."""
    from sqs_entity_resolution_ray.pipelines.resolve import read_pages, resolve
    from sqs_entity_resolution_ray.stages.report import (
        RELATED_MIN_SCORE,
        entity_report,
    )

    art = resolve(read_pages(_near_miss_corpus()))
    clusters = art.clusters.to_pandas()
    assert clusters["entity_id"].nunique() == 2
    rep = entity_report(art.clusters, art.profiles, art.edges,
                        scored=art.scored).to_pandas()

    # ground truth in pandas: cross-entity near-miss pairs, max score
    scored = art.scored.to_pandas()
    ent_of = clusters.set_index("uid")["entity_id"]
    near = scored[(~scored["is_match"]) &
                  (scored["score"] >= RELATED_MIN_SCORE)].copy()
    near["ent_a"] = near["uid_a"].map(ent_of)
    near["ent_b"] = near["uid_b"].map(ent_of)
    near = near[near["ent_a"] != near["ent_b"]]
    truth: dict[str, dict[str, float]] = {}
    for _, r in near.iterrows():
        for e, o in ((r["ent_a"], r["ent_b"]), (r["ent_b"], r["ent_a"])):
            truth.setdefault(e, {})
            truth[e][o] = max(truth[e].get(o, 0.0), r["score"])

    got = {
        row["entity_id"]: {x["entity_id"]: x["score"] for x in row["related"]}
        for _, row in rep.iterrows() if len(row["related"])
    }
    assert set(got) == set(truth)
    for e, peers in truth.items():
        assert set(got[e]) == set(peers), e
        for o, s in peers.items():
            assert abs(got[e][o] - s) < 1e-5
    # the fixture corpus must actually exercise the path
    assert truth, "corpus produced no near-miss pairs; weaken detected"
    # every related entry is labeled POSSIBLY_RELATED and sorted
    for _, row in rep.iterrows():
        ids = [x["entity_id"] for x in row["related"]]
        assert ids == sorted(ids)
        assert all(x["match_level"] == "POSSIBLY_RELATED"
                   for x in row["related"])
