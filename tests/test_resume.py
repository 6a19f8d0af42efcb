"""Kill/resume test: a rerun after a mid-pipeline failure skips finished
stages and produces identical output (SURVEY §5.2 item 5)."""

import os
import shutil

import pandas as pd


def test_resolve_with_checkpoints_resume(corpus, ray_session, tmp_path):
    from sqs_entity_resolution_ray.pipelines.resolve_checkpointed import (
        resolve_with_checkpoints,
    )

    ckpt = str(tmp_path / "ckpt")
    pages = corpus + "/pages.parquet"

    r1 = resolve_with_checkpoints(pages, ckpt)
    c1 = r1["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert r1["cached"] == {"profiles": False, "edges": False, "clusters": False}
    assert os.path.exists(os.path.join(ckpt, "metrics.json"))
    m = r1["metrics"]
    assert m["stages"]["profiles"]["row_count"] == len(c1)

    # simulate a crash AFTER edges but BEFORE clustering finished:
    # clusters checkpoint is destroyed (a .tmp dir would have been
    # discarded anyway), profiles+edges survive
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    r2 = resolve_with_checkpoints(pages, ckpt)
    assert r2["cached"] == {"profiles": True, "edges": True, "clusters": False}
    c2 = r2["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c2)

    # untouched rerun: everything cached
    r3 = resolve_with_checkpoints(pages, ckpt)
    assert all(r3["cached"].values())
    c3 = r3["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c3)

    # config change invalidates downstream stages
    from sqs_entity_resolution_ray.config import MatchConfig

    r4 = resolve_with_checkpoints(pages, ckpt,
                                  match_cfg=MatchConfig(threshold=0.5))
    assert not r4["cached"]["profiles"]  # config fingerprint changed


def test_partition_stats_in_manifest(corpus, ray_session, tmp_path):
    import ray.data as rd

    from sqs_entity_resolution_ray.state.checkpoint import (
        read_manifest,
        write_checkpoint,
    )

    ds = rd.read_parquet(corpus + "/pages.parquet").select_columns(["url"])
    ck = str(tmp_path / "ck")
    m = write_checkpoint(ds, ck, "fp1", extra={"stage": "test"})
    assert m["row_count"] == ds.count()
    assert len(m["partition_stats"]) == len(m["partitions"]) >= 1
    assert all(p["rows"] > 0 and p["bytes"] > 0 for p in m["partition_stats"])
    assert read_manifest(ck)["extra"]["stage"] == "test"
