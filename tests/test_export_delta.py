"""Delta-export / tracker / checkpoint-resume tests.

Mirrors the reference's delta behavior test (``test/test_flow.py:93-122``:
add 1 record ⇒ delta export has exactly 1 entity; immediate second delta
is empty; full export has all entities) and the kill/resume requirement.
"""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqs_entity_resolution_ray.state.tracker import (
    DONE,
    IN_PROGRESS,
    SKIPPED,
    TODO,
    Tracker,
    affected_entities,
)


def test_tracker_state_machine(tmp_path):
    tr = Tracker(str(tmp_path / "tracker.parquet"))
    assert tr.tallies() == {"todo": 0, "in_progress": 0, "done": 0, "skipped": 0}
    assert tr.add_entity_ids(["e1", "e2", "e2"]) == 2  # dedup within call
    assert tr.add_entity_ids(["e1"]) == 0              # already TODO
    assert tr.tallies()["todo"] == 2
    claimed = tr.begin_export()
    assert claimed == ["e1", "e2"]
    assert tr.tallies()["in_progress"] == 2
    tr.complete_export("run-1", skipped=["e2"])
    t = tr.tallies()
    assert t["done"] == 1 and t["skipped"] == 1
    # DONE entities can be re-queued (entity touched again later)
    assert tr.add_entity_ids(["e1"]) == 1
    tr.begin_export()
    tr.rewind()
    df = tr.to_pandas()
    assert (df[df["entity_id"] == "e1"]["status"] == TODO).any()


def test_affected_entities_diff():
    prev = pd.DataFrame({"url": ["a", "b", "c"], "entity_id": ["E1", "E1", "E2"]})
    # b moves from E1 to E2; E1 survives with just a
    new = pd.DataFrame({"url": ["a", "b", "c"], "entity_id": ["E1", "E2", "E2"]})
    affected, deleted = affected_entities(prev, new)
    assert affected == ["E1", "E2"]
    assert deleted == []
    # merge E1 into E2 entirely: E1 deleted
    new2 = pd.DataFrame({"url": ["a", "b", "c"], "entity_id": ["E2", "E2", "E2"]})
    affected2, deleted2 = affected_entities(prev, new2)
    assert "E2" in affected2 and deleted2 == ["E1"]
    # first run: everything affected
    a3, d3 = affected_entities(None, new)
    assert a3 == ["E1", "E2"] and d3 == []


def test_affected_entities_ds_matches_pandas(ray_session):
    """The distributed diff (Datasets, churn-sized driver collect) must
    agree with the pandas reference on randomized cluster-map churn:
    moves, merges (deletions), splits, added and removed urls."""
    import numpy as np
    import ray.data as rd

    from sqs_entity_resolution_ray.state.tracker import (
        affected_entities,
        affected_entities_ds,
    )

    rng = np.random.default_rng(11)
    urls = [f"u{i}" for i in range(300)]
    prev = pd.DataFrame({
        "url": urls,
        "entity_id": [f"E{rng.integers(0, 60)}" for _ in urls],
    })
    new = prev.copy()
    move = rng.choice(len(new), size=40, replace=False)
    new.loc[move, "entity_id"] = [f"E{rng.integers(0, 70)}" for _ in move]
    new = new[new.index % 17 != 0]                       # removed urls
    added = pd.DataFrame({
        "url": [f"new{i}" for i in range(25)],
        "entity_id": [f"E{rng.integers(0, 70)}" for i in range(25)],
    })
    new = pd.concat([new, added], ignore_index=True)

    want_aff, want_del = affected_entities(prev, new)
    got_aff, got_del = affected_entities_ds(
        rd.from_pandas(prev).repartition(5),
        rd.from_pandas(new).repartition(7),
        num_partitions=8,
    )
    assert got_aff == want_aff
    assert got_del == want_del
    # first-run path
    a, d = affected_entities_ds(None, rd.from_pandas(new))
    assert a == sorted(new["entity_id"].unique()) and d == []


def test_delta_export_flow(resolved, corpus, ray_session, tmp_path):
    """The reference flow: resolve → full export → add one page → delta
    export contains exactly the affected entity → second delta empty."""
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.export import (
        delta_export,
        full_export,
        record_affected,
    )
    from sqs_entity_resolution_ray.pipelines.resolve import read_pages, resolve

    art, clusters1 = resolved
    tracker = Tracker(str(tmp_path / "tracker.parquet"))
    out_root = str(tmp_path / "out")

    # run 1: everything is new → full export
    affected, deleted = record_affected(tracker, None, clusters1)
    assert len(affected) == clusters1["entity_id"].nunique()
    out = full_export(art.clusters, out_root, "run1")
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    tracker.begin_export()
    tracker.complete_export("run1")
    assert tracker.tallies()["todo"] == 0

    # run 2: add ONE new page that is a near-dup of an existing entity
    pages = pq.read_table(corpus + "/pages.parquet")
    pdf = pages.to_pandas()
    donor = pdf[pdf["url"] == "https://www.site-00.example.com/articles/000000/v0"].iloc[0]
    new_row = donor.copy()
    new_row["url"] = "https://late.example.com/copy-of-000000"
    pdf2 = pd.concat([pdf, new_row.to_frame().T], ignore_index=True)
    art2 = resolve(read_pages(rd.from_arrow(pa.Table.from_pandas(pdf2, preserve_index=False))))
    clusters2 = art2.clusters.to_pandas()

    affected2, deleted2 = record_affected(tracker, clusters1, clusters2)
    # exactly the one entity that absorbed the new page is affected
    target_entity = clusters2.set_index("url")["entity_id"][
        "https://late.example.com/copy-of-000000"
    ]
    donor_entity = clusters2.set_index("url")["entity_id"][donor["url"]]
    assert target_entity == donor_entity  # it joined the donor's cluster
    assert affected2 == [target_entity]

    out2, exported, skipped = delta_export(art2.clusters, tracker, out_root, "run2")
    assert exported == [target_entity]
    assert skipped == []
    delta_tbl = pq.read_table(os.path.join(out2, "clusters")).to_pandas()
    assert set(delta_tbl["entity_id"]) == {target_entity}
    assert "https://late.example.com/copy-of-000000" in set(delta_tbl["url"])

    # run 3: nothing changed → empty delta
    affected3, _ = record_affected(tracker, clusters2, clusters2)
    assert affected3 == []
    out3, exported3, skipped3 = delta_export(art2.clusters, tracker, out_root, "run3")
    assert exported3 == [] and skipped3 == []


def test_checkpoint_resume(ray_session, corpus, tmp_path):
    """load_or_run skips a finished stage; a stale fingerprint reruns."""
    import ray.data as rd

    from sqs_entity_resolution_ray.state.checkpoint import (
        input_fingerprint,
        load_or_run,
        read_manifest,
    )

    calls = {"n": 0}

    def run():
        calls["n"] += 1
        return rd.read_parquet(corpus + "/pages.parquet").select_columns(["url"])

    fp = input_fingerprint(corpus + "/pages.parquet")
    ck = str(tmp_path / "stage1")
    ds1, cached1 = load_or_run(ck, fp, run)
    ds2, cached2 = load_or_run(ck, fp, run)
    assert (cached1, cached2) == (False, True)
    assert calls["n"] == 1
    assert ds1.count() == ds2.count()
    m = read_manifest(ck)
    assert m["row_count"] == ds1.count() and m["fingerprint"] == fp
    # changed input → rerun
    ds3, cached3 = load_or_run(ck, "different", run)
    assert not cached3 and calls["n"] == 2


def test_export_failure_rewinds(resolved, tmp_path, monkeypatch):
    """A failing delta export aborts the tmp dir and rewinds the tracker
    (exporter.py:245-262 + db.py:90-102)."""
    from sqs_entity_resolution_ray.pipelines import export as ex

    art, clusters = resolved
    tracker = Tracker(str(tmp_path / "t.parquet"))
    tracker.add_entity_ids(list(clusters["entity_id"].unique()[:3]))

    class Boom(RuntimeError):
        pass

    class FailingDs:
        def map_batches(self, *a, **k):
            raise Boom("disk full")

    with pytest.raises(Boom):
        ex.delta_export(FailingDs(), tracker, str(tmp_path / "out"), "runX")
    assert tracker.tallies()["todo"] == 3
    assert tracker.tallies()["in_progress"] == 0
    assert not os.path.exists(str(tmp_path / "out" / "runX-export-delta"))


def test_full_export_jsonl_report(resolved, tmp_path, ray_session):
    """S6: the reference's JSONL entity report format (exporter.py:152-155)."""
    import glob
    import json
    import os

    from sqs_entity_resolution_ray.pipelines.export import full_export
    from sqs_entity_resolution_ray.stages.report import entity_report

    art, clusters = resolved
    rep = entity_report(art.clusters, art.profiles, art.edges)
    out = full_export(art.clusters, str(tmp_path / "out"), "runJ",
                      report=rep, jsonl=True)
    files = glob.glob(os.path.join(out, "report_jsonl", "*"))
    assert files
    lines = []
    for f in files:
        with open(f) as fh:
            lines += [json.loads(l) for l in fh if l.strip()]
    assert len(lines) == clusters["entity_id"].nunique()
    assert {"entity_id", "cluster_size", "records"} <= set(lines[0])
