"""Property-based gates for the approximate dedup family: EXACT
duplicates are a GUARANTEE, not a probability — identical texts produce
identical MinHash signatures and identical SimHash codes, so they must
always share a bucket, pass verification, and land in ONE cluster with
the min doc_id as representative, for any corpus shape and any planted
group size. (Near-dup recall is probabilistic and covered by the
recall tests in test_dedup.py; this gate pins the hard floor.)"""

import pandas as pd
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from sqs_entity_resolution_ray.stages.dedup import (
    exact_dedup,
    minhash_dedup,
    simhash_dedup,
)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def _text(rng_idx: list[int]) -> str:
    # ≥ 24 words so every doc clears shingle/token minimums comfortably
    return " ".join(WORDS[i % len(WORDS)] for i in rng_idx) + " " + " ".join(
        WORDS[(i * 7 + 3) % len(WORDS)] for i in rng_idx
    )


corpus = st.lists(
    st.tuples(
        st.lists(st.integers(0, 13), min_size=12, max_size=20),  # base text
        st.integers(1, 4),                                       # copies
    ),
    min_size=1,
    max_size=10,
)


def _build(spec):
    rows, groups, next_id = [], [], 0
    for base, copies in spec:
        text = _text(base)
        ids = list(range(next_id, next_id + copies))
        next_id += copies
        for i in ids:
            rows.append({"doc_id": i, "text": text})
        groups.append((text, ids))
    df = pd.DataFrame(rows)
    # distinct-text groups may collide (same base drawn twice) — merge
    merged: dict[str, list[int]] = {}
    for text, ids in groups:
        merged.setdefault(text, []).extend(ids)
    return df, merged


def _check(out: pd.DataFrame, merged: dict[str, list[int]]):
    # dedup operators return ids as strings (CC node keys); normalize
    rep = dict(zip(out["doc_id"].astype(int), out["rep_id"].astype(int)))
    for _, ids in merged.items():
        reps = {rep[i] for i in ids}
        # one cluster per planted exact-dup group...
        assert len(reps) == 1, f"group {ids} split across reps {reps}"
        # ...whose representative is the min STRING doc_id of ITS
        # cluster (CC node keys are strings — "10" < "2"), so it can
        # never exceed the group's own lexicographic min id
        assert str(list(reps)[0]) <= min(str(i) for i in ids)


@given(corpus)
@settings(max_examples=8, deadline=None)
def test_minhash_dedup_exact_duplicates_always_cluster(ray_session, spec):
    df, merged = _build(spec)
    out = minhash_dedup(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == len(df)
    _check(out, merged)


@given(corpus)
@settings(max_examples=8, deadline=None)
def test_simhash_dedup_exact_duplicates_always_cluster(ray_session, spec):
    df, merged = _build(spec)
    out = simhash_dedup(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == len(df)
    _check(out, merged)


@given(corpus)
@settings(max_examples=6, deadline=None)
def test_ngram_dedup_exact_duplicates_always_cluster(ray_session, spec):
    from sqs_entity_resolution_ray.stages.dedup import ngram_jaccard_dedup

    df, merged = _build(spec)
    out = ngram_jaccard_dedup(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == len(df)
    _check(out, merged)


@given(st.lists(st.tuples(st.lists(st.integers(-8, 8), min_size=4,
                                   max_size=4).filter(lambda v: any(v)),
                          st.integers(1, 3)),
                min_size=1, max_size=8))
@settings(max_examples=6, deadline=None)
def test_embedding_dedup_exact_duplicates_always_cluster(ray_session, spec):
    """Identical vectors fall on the same side of EVERY hyperplane, so
    they share all buckets and verify at cosine exactly 1."""
    from sqs_entity_resolution_ray.stages.dedup import embedding_dedup

    rows, merged, next_id = [], {}, 0
    for vec, copies in spec:
        key = tuple(vec)
        ids = list(range(next_id, next_id + copies))
        next_id += copies
        merged.setdefault(key, []).extend(ids)
        for i in ids:
            rows.append({"vec_id": i, "embedding": [float(x) for x in vec]})
    df = pd.DataFrame(rows)
    out = embedding_dedup(ray.data.from_pandas(df), id_col="vec_id").to_pandas()
    assert len(out) == len(df)
    # embedding_dedup normalizes the id column name to doc_id
    rep = dict(zip(out["doc_id"].astype(int), out["rep_id"].astype(int)))
    for ids in merged.values():
        reps = {rep[i] for i in ids}
        assert len(reps) == 1, f"group {ids} split across reps {reps}"
        assert str(list(reps)[0]) <= min(str(i) for i in ids)


@given(corpus)
@settings(max_examples=8, deadline=None)
def test_exact_dedup_keeps_min_id_per_text(ray_session, spec):
    df, merged = _build(spec)
    out = exact_dedup(ray.data.from_pandas(df)).to_pandas()
    kept = set(out["doc_id"].astype(int))
    expect = {min(ids) for ids in merged.values()}
    # exact_dedup keeps ONE row per distinct text: the min doc_id
    assert len(out) == len(merged)
    assert expect <= kept
