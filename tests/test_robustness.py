"""Robustness: quarantine (DLQ analogue), idempotent redelivery, nulls,
property-based kernel checks (hypothesis)."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sqs_entity_resolution_ray.functions.html_extract import extract_text
from sqs_entity_resolution_ray.functions.minhash import (
    bottom_k_shingles,
    est_jaccard,
    minhash_signatures,
    shingle_doc_hashes,
)
from sqs_entity_resolution_ray.functions.strsim import (
    jaro_winkler,
    levenshtein,
)


def _pages_table(rows):
    return pa.table(
        {
            "url": pa.array([r.get("url") for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r.get("ts", dt.datetime(2024, 1, 1)) for r in rows],
                pa.timestamp("us"),
            ),
            "html": pa.array([r.get("html") for r in rows], pa.binary()),
            "text": pa.array([""] * len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


def test_quarantine_path(ray_session):
    """Rows without a primary key divert to the DLQ-analogue sink
    (consumer.py:201-204 nack; tofu DLQ) and never block the stream."""
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.resolve import (
        quarantined_pages,
        validate_pages,
    )

    rows = [
        {"url": "https://ok.example/a", "html": b"<p>fine</p>"},
        {"url": None, "html": b"<p>no key</p>"},
        {"url": "", "html": b"<p>empty key</p>"},
        {"url": "https://ok.example/b", "html": None},  # null body is OK
    ]
    ds = rd.from_arrow(_pages_table(rows))
    good = validate_pages(ds).to_pandas()
    bad = quarantined_pages(ds).to_pandas()
    assert sorted(good["url"]) == ["https://ok.example/a", "https://ok.example/b"]
    assert len(bad) == 2


def test_null_html_extracts_empty(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.extract import extract_batch

    ds = rd.from_arrow(_pages_table(
        [{"url": "https://x.example/1", "html": None}]
    ))
    out = ds.map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    assert out["extracted_text"].iloc[0] == ""


def test_redelivery_idempotent(resolved, corpus, ray_session):
    """At-least-once semantics: re-appending the whole input (duplicate
    delivery of every page) yields the identical cluster map — the
    reference's idempotent-upsert guarantee (README.md:222-228)."""
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.resolve import read_pages, resolve

    _, clusters_once = resolved
    pages = read_pages(corpus + "/pages.parquet")
    doubled = pages.union(read_pages(corpus + "/pages.parquet"))
    clusters_twice = resolve(doubled).clusters.to_pandas()
    a = clusters_once.sort_values("url").reset_index(drop=True)
    b = clusters_twice.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["url", "entity_id", "cluster_size"]],
                                  b[["url", "entity_id", "cluster_size"]])


# ---------------------------------------------------------- hypothesis --

@given(st.text(max_size=400))
@settings(max_examples=50, deadline=None)
def test_extract_total_and_idempotent(s):
    """extract_text never raises and extracting extracted text with no
    markup left is a fixpoint (whitespace-normal forms are stable)."""
    out = extract_text(s)
    assert isinstance(out, str)
    again = extract_text(out)
    assert extract_text(again) == again


@given(st.lists(st.text(alphabet="abcdef ", max_size=60), max_size=8))
@settings(max_examples=30, deadline=None)
def test_shingle_offsets_invariants(texts):
    flat, off = shingle_doc_hashes(texts, 3)
    assert len(off) == len(texts) + 1
    assert off[0] == 0 and off[-1] == len(flat)
    assert (np.diff(off) >= 1).all()  # every doc owns ≥1 shingle


@given(st.integers(1, 64))
@settings(max_examples=20, deadline=None)
def test_minhash_identical_docs_estimate_one(k):
    flat, off = shingle_doc_hashes(["the same text here ok"] * 2, 3)
    sig = minhash_signatures(flat, off, 32, seed=k)
    assert est_jaccard(sig[0:1], sig[1:2])[0] == 1.0


@given(st.text(max_size=30), st.text(max_size=30))
@settings(max_examples=100, deadline=None)
def test_strsim_metric_properties(a, b):
    jw = jaro_winkler(a, b)
    assert 0.0 <= jw <= 1.0
    assert jaro_winkler(a, a) == 1.0
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200),
       st.integers(1, 50))
@settings(max_examples=50, deadline=None)
def test_bottom_k_is_smallest(values, k):
    flat = np.array(values, dtype=np.uint64)
    off = np.array([0, len(values)], dtype=np.int64)
    f2, o2 = bottom_k_shingles(flat, off, k)
    assert o2[-1] == min(len(values), k)
    assert sorted(f2.tolist()) == sorted(flat.tolist())[: min(len(values), k)]
