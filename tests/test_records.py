"""Record-model ER tests (the reference's own domain).

Includes a reference-semantics test on the reference's fixture data
(guarded — skipped when /root/reference is absent) asserting the
transitive-closure invariants visible in the golden output
(``flow-output.jsonl``), per SURVEY.md §5.2 item 4.
"""

import os

import pandas as pd
import pytest

from sqs_entity_resolution_ray.pipelines.records import (
    extract_record_features,
    score_record_pair,
)
from sqs_entity_resolution_ray.sources.people import generate_people

REF_FIXTURE = "/root/reference/test/fixtures/customers.jsonl"


def test_feature_extraction_unifies_variants():
    df = pd.DataFrame(
        [
            {"DATA_SOURCE": "A", "RECORD_ID": "1",
             "PRIMARY_NAME_LAST": "Kusha", "PRIMARY_NAME_FIRST": "Ed",
             "DATE_OF_BIRTH": "Mar 1 1970", "ADDR_LINE1": "1515 Adela Ln"},
            {"DATA_SOURCE": "A", "RECORD_ID": "2",
             "PRIMARY_NAME_LAST": "Kusha", "PRIMARY_NAME_FIRST": "Ed",
             "DATE_OF_BIRTH": "3/1/1970", "ADDR_LINE1": "1515 Adela Lane"},
            {"RECORD_ID": "no-source"},  # missing DATA_SOURCE → dropped
        ]
    )
    f = extract_record_features(df)
    assert len(f) == 2  # invalid row rejected (consumer.py:201-204)
    assert f.loc[0, "dob"] == f.loc[1, "dob"] == "1970-03-01"
    assert f.loc[0, "addr"] == f.loc[1, "addr"]  # Ln ≡ Lane


def test_pair_scoring_evidence_and_match_key():
    f = extract_record_features(pd.DataFrame(
        [
            {"DATA_SOURCE": "C", "RECORD_ID": "1001",
             "PRIMARY_NAME_LAST": "Smith", "PRIMARY_NAME_FIRST": "Robert",
             "DATE_OF_BIRTH": "12/11/1978", "PHONE_NUMBER": "702-919-1300"},
            {"DATA_SOURCE": "C", "RECORD_ID": "1002",
             "PRIMARY_NAME_LAST": "Smith", "PRIMARY_NAME_FIRST": "Robert",
             "DATE_OF_BIRTH": "11/12/1978",  # day/month transposed
             "PHONE_NUMBER": "702 919 1300"},
            {"DATA_SOURCE": "C", "RECORD_ID": "2001",
             "PRIMARY_NAME_LAST": "Jones", "PRIMARY_NAME_FIRST": "Mary",
             "DATE_OF_BIRTH": "1/5/1990", "PHONE_NUMBER": "702-919-1300"},
        ]
    ))
    s01, mk01 = score_record_pair(f.iloc[0], f.iloc[1])
    assert s01 >= 0.7
    assert "+NAME" in mk01 and "+DOB" in mk01 and "+PHONE" in mk01
    # shared phone alone (different person) must NOT match
    s02, mk02 = score_record_pair(f.iloc[0], f.iloc[2])
    assert s02 < 0.7
    assert "+PHONE" in mk02 and "-DOB" in mk02


def test_records_e2e_f1(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.records import resolve_records

    df, truth = generate_people(n_persons=30, seed=7)
    art = resolve_records(rd.from_pandas(df))
    clusters = art["clusters"].to_pandas()
    assert len(clusters) == len(df)
    m = clusters.set_index("rec_key")["entity_id"]
    # pairwise P/R/F1 over all labeled record pairs
    keys = list(truth.index)
    tp = fp = fn = 0
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            same_truth = truth[keys[i]] == truth[keys[j]]
            same_pred = m[keys[i]] == m[keys[j]]
            if same_pred and same_truth:
                tp += 1
            elif same_pred:
                fp += 1
            elif same_truth:
                fn += 1
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.99, (prec, rec, f1)


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE),
                    reason="reference fixture not present")
def test_reference_fixture_invariants(ray_session):
    """Golden-output invariants (cluster memberships Senzing resolves,
    flow-output.jsonl lines 1-2) hold on our engine too — compared as
    set relations, not byte equality (Senzing ids are unstable; even the
    reference only count-compares, test_flow.py:90-91)."""
    from sqs_entity_resolution_ray.pipelines.records import (
        load_jsonl_records,
        resolve_records,
    )

    records = load_jsonl_records(REF_FIXTURE)
    art = resolve_records(records)
    clusters = art["clusters"].to_pandas()
    m = clusters.set_index("rec_key")["entity_id"]

    def same(a, b):
        return m[f"CUSTOMERS:{a}"] == m[f"CUSTOMERS:{b}"]

    # flow-output.jsonl:1 — records 1001..1005 are one entity
    assert same("1001", "1002")  # +NAME+DOB(transposed)+PHONE
    assert same("1001", "1003")  # +NAME+DOB+EMAIL
    # flow-output.jsonl:2 — 1009 + 1010 one entity (+NAME+DOB+ADDRESS,
    # DOB spelled "Mar 1 1970" vs "3/1/1970", "Adela Ln" vs "Adela Lane")
    assert same("1009", "1010")
    # distinct people stay distinct
    assert not same("1001", "1009")


def test_crowd_identifier_stays_one_entity(ray_session):
    """A crowd identifier (150 records sharing one phone, pairwise-
    matching names) must resolve into ONE entity via the overlap-chunk
    walk — the old deterministic-cut cap left records past the cap
    pairless (silent split). Enumeration stays bounded: O(chunk²) per
    chunk, not O(150²) per block... well within max_block=100 chunks."""
    import pandas as pd
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.records import resolve_records

    rows = []
    for i in range(150):
        rows.append({
            "DATA_SOURCE": "CROWD", "RECORD_ID": f"r{i:04d}",
            "PRIMARY_NAME_FULL": "Pat Q Example",
            "DATE_OF_BIRTH": "1/2/1980",
            "PHONE_NUMBER": "702-555-0000",
        })
    art = resolve_records(rd.from_pandas(pd.DataFrame(rows)))
    clusters = art["clusters"].to_pandas()
    assert len(clusters) == 150
    assert clusters["entity_id"].nunique() == 1, "crowd split by the cap"
