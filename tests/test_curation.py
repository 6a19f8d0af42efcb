"""Curation operators: splits, sampling, redaction, token top-k,
quantile gating, JSON extraction, decontamination (stages/curation)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from sqs_entity_resolution_ray.stages.curation import (
    decontaminate,
    global_quantile_filter,
    hash_sample,
    parse_json_field,
    regex_redact,
    split_assign,
    stratified_sample,
    token_topk,
)


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta", "x1"], size=n))
        for n in rng.integers(3, 30, size=200)
    ]
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "source": [f"src{i % 4}" for i in range(200)],
        "text": texts,
        "n_chars": [len(t) for t in texts],
    })
    return rd.from_pandas(df), df


def test_split_assign_deterministic(docs_ds):
    ds, df = docs_ds
    out = split_assign(ds, "doc_id").to_pandas().sort_values("doc_id")
    expect = np.where(
        df["doc_id"] % 10 < 8, "train",
        np.where(df["doc_id"] % 10 == 8, "val", "test"),
    )
    assert (out["split"].to_numpy() == expect).all()
    # split is a pure function of the key: block layout can't change it
    out2 = (
        split_assign(ds.repartition(7), "doc_id")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out2["split"].to_numpy() == expect).all()


def test_stratified_sample_rates(docs_ds):
    ds, df = docs_ds
    rates = {"src0": 100, "src1": 50, "src2": 0}
    out = stratified_sample(
        ds, "source", "doc_id", rates, default_rate=10
    ).to_pandas()
    kept = set(out["doc_id"])
    for _, row in df.iterrows():
        rate = rates.get(row["source"], 10)
        assert (row["doc_id"] in kept) == (row["doc_id"] % 100 < rate)


def test_hash_sample_rate_and_determinism(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": [f"url-{i}" for i in range(4000)]})
    ds = rd.from_pandas(df)
    a = set(hash_sample(ds, "k", 25.0).to_pandas()["k"])
    b = set(hash_sample(ds.repartition(9), "k", 25.0).to_pandas()["k"])
    assert a == b  # deterministic under re-partitioning
    assert 0.20 < len(a) / 4000 < 0.30  # concentrates near 25%


def test_regex_redact(docs_ds):
    ds, df = docs_ds
    out = (
        regex_redact(ds, r"\b(alpha|beta)\b", "[X]")
        .to_pandas()
        .sort_values("doc_id")
    )
    import re

    expect = df.sort_values("doc_id")["text"].str.replace(
        re.compile(r"\b(alpha|beta)\b"), "[X]", regex=True
    )
    assert (out["text_red"].to_numpy() == expect.to_numpy()).all()


def test_token_topk_matches_pandas(docs_ds):
    ds, df = docs_ds
    out = token_topk(ds, n=3).to_pandas()
    vc = df["text"].str.split().explode().value_counts()
    expect = (
        vc.rename_axis("token")
        .reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True])
        .head(3)
        .reset_index(drop=True)
    )
    assert out["token"].tolist() == expect["token"].tolist()
    assert out["n"].tolist() == expect["n"].tolist()


def test_global_quantile_filter_exact(docs_ds):
    ds, df = docs_ds
    out = global_quantile_filter(ds, "n_chars", q=0.5).to_pandas()
    thr = np.quantile(df["n_chars"].to_numpy(), 0.5, method="linear")
    assert set(out["doc_id"]) == set(df.loc[df["n_chars"] >= thr, "doc_id"])


def test_parse_json_field_fast_and_fallback(ray_session):
    import ray.data as rd

    rows = [
        {"eid": 0, "props": '{"k": 42, "other": "x"}'},
        {"eid": 1, "props": '{"other": 1, "k": -7}'},
        # regex fast path misses the quoted number; json.loads fallback
        {"eid": 2, "props": '{"k": "13"}'},
        {"eid": 3, "props": '{"nope": 1}'},
        {"eid": 4, "props": json.dumps({"k": 10**12})},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = parse_json_field(ds, "props", "k").to_pandas().sort_values("eid")
    vals = out["k"].tolist()
    assert vals[0] == 42 and vals[1] == -7 and vals[2] == 13
    assert pd.isna(vals[3]) or vals[3] == 0  # missing key left as-is
    assert vals[4] == 10**12


def test_decontaminate_exact_shingles(ray_session):
    import ray.data as rd

    shared = "one two three four five six seven eight nine ten"
    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": [1000],
        "text": [shared],
    }))
    corpus = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "prefix " + shared + " suffix",      # contains the 8-shingle
            "one two three four five six seven",  # only 7 tokens overlap
            "totally different words here with no overlap at all ok",
            shared,                               # exact copy
        ],
    }))
    out = decontaminate(corpus, bench, n_tokens=8).to_pandas()
    assert out["doc_id"].tolist() == [0, 3]

    # shuffle semi-join fallback (cap forced to 0): identical result
    # without a driver/broadcast materialization of the benchmark set
    out2 = decontaminate(corpus, bench, n_tokens=8,
                         broadcast_cap=0, num_partitions=8).to_pandas()
    assert out2["doc_id"].tolist() == [0, 3]

    # the one-knob invariant (round-4 verdict #5): with no explicit
    # num_partitions, the shuffle fallback resolves its partition count
    # through cfg.shuffle_partitions via bucket_partitions
    from sqs_entity_resolution_ray.config import PipelineConfig

    out3 = decontaminate(
        corpus, bench, n_tokens=8, broadcast_cap=0,
        cfg=PipelineConfig(shuffle_partitions=3)).to_pandas()
    assert out3["doc_id"].tolist() == [0, 3]


def test_parse_json_field_float_falls_back(ray_session):
    """Integer-prefix of a float must not be extracted by the regex fast
    path (ADVICE r2): '"k": 3.5' goes through json.loads → truncates to
    3 via int(), and scientific notation resolves fully."""
    import ray.data as rd

    rows = [
        {"eid": 0, "props": '{"k": 3.5}'},
        {"eid": 1, "props": '{"k": 2e3}'},
        {"eid": 2, "props": '{"k": 7}'},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = parse_json_field(ds, "props", "k").to_pandas().sort_values("eid")
    assert out["k"].tolist() == [3, 2000, 7]


def test_hash_sample_full_rate(ray_session):
    """rate_pct >= 100 keeps every row (uint64 overflow guard)."""
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.curation import hash_sample

    ds = rd.from_pandas(pd.DataFrame({"k": list(range(50))}))
    assert hash_sample(ds, "k", 100.0).count() == 50
    assert hash_sample(ds, "k", 150.0).count() == 50
