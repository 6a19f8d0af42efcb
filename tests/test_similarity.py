"""ANN top-k tests against the real embeddings test table."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    df = ds.to_pandas()
    return ds, df


def brute_force_truth(df, qids, qmat, k):
    mat = np.asarray(df["embedding"].tolist(), dtype=np.float32)
    ids = df["vec_id"].to_numpy()
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    q = np.asarray(qmat, dtype=np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    sims = q @ unit.T
    out = {}
    for qi, qid in enumerate(qids):
        order = sorted(range(len(ids)),
                       key=lambda c: (-sims[qi, c], ids[c]))
        out[qid] = [ids[c] for c in order if ids[c] != qid][:k]
    return out


def test_bruteforce_topk_exact(embeddings, ray_session):
    from sqs_entity_resolution_ray.stages.similarity import ann_topk_bruteforce

    ds, df = embeddings
    qdf = df[df["vec_id"] % 100 == 0]
    qids = qdf["vec_id"].to_numpy()
    qmat = np.asarray(qdf["embedding"].tolist(), dtype=np.float32)
    out = ann_topk_bruteforce(ds, qids, qmat, k=5).to_pandas()
    truth = brute_force_truth(df, qids, qmat, 5)
    for qid, grp in out.groupby("query_id"):
        got = grp.sort_values("rank")["vec_id"].tolist()
        assert got == truth[qid], qid


def test_ivf_topk_recall(embeddings, ray_session):
    from sqs_entity_resolution_ray.stages.similarity import ann_topk_ivf

    ds, df = embeddings
    qdf = df[df["vec_id"] % 100 == 0]
    qids = qdf["vec_id"].to_numpy()
    qmat = np.asarray(qdf["embedding"].tolist(), dtype=np.float32)
    out = ann_topk_ivf(ds, qids, qmat, k=5, n_lists=8, nprobe=3).to_pandas()
    truth = brute_force_truth(df, qids, qmat, 5)
    hits = total = 0
    for qid, grp in out.groupby("query_id"):
        got = set(grp["vec_id"].tolist())
        hits += len(got & set(truth[qid]))
        total += 5
    assert hits / total >= 0.6, hits / total  # probe-limited recall
