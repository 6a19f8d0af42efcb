"""Canonical serialization for the ER-trio golden-content gate.

The three reference-shaped pipelines (resolve_pages, entity_report,
records_er) have no SQL oracle — matching logic is not SQL-expressible —
so their regression gate is a pinned golden at sf0.001, asserted by
CONTENT (exact cluster partition + full report payload), not row count.
Mirrors the reference's golden-file gate (``test/test_flow.py:82-91``
against ``test/fixtures/flow-output.jsonl``) but content-strong.

Floats are rounded to 5 dp before hashing so the gate pins semantics,
not ULP noise.
"""

from __future__ import annotations

import hashlib
import json

GOLDEN_PATH = "tests/golden/er_golden_sf0001.json"


def _sha(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()


def partition_digest(df, member_col: str, entity_col: str = "entity_id"):
    """Cluster partition as canonical set-of-frozensets → (sha256, n)."""
    groups = sorted(
        sorted(g) for _, g in df.groupby(entity_col)[member_col]
    )
    return _sha(groups), len(groups)


def report_digest(rep) -> str:
    """Entity report content (every field, floats rounded) → sha256."""
    rows = []
    for _, r in rep.sort_values("entity_id").iterrows():
        rows.append([
            r["entity_id"],
            r["entity_name"],
            int(r["cluster_size"]),
            [[x["url"], round(float(x["score"]), 5), x["match_key"]]
             for x in r["records"]],
            sorted([[k, int(v)] for k, v in r["record_summary"]]),
            [[k, list(v)] for k, v in r["features"]],
            [[x["entity_id"], x["match_level"],
              round(float(x["score"]), 5)] for x in r["related"]],
        ])
    return _sha(rows)


def compute_golden(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    """Run the ER trio and return the canonical content digests."""
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.records import resolve_records
    from sqs_entity_resolution_ray.pipelines.resolve import (
        read_pages,
        resolve,
    )
    from sqs_entity_resolution_ray.sources.corpus import pages_from_documents
    from sqs_entity_resolution_ray.sources.people import generate_people
    from sqs_entity_resolution_ray.stages.report import entity_report

    d = pages_from_documents(sf_dir)
    art = resolve(read_pages(d + "/pages"))
    clusters = art.clusters.to_pandas()
    pages_sha, n_clusters = partition_digest(clusters, "url")

    rep = entity_report(art.clusters, art.profiles, art.edges,
                        scored=art.scored).to_pandas()

    people, _ = generate_people(n_persons=40, seed=7)
    rec = resolve_records(rd.from_pandas(people))
    rec_df = rec["clusters"].to_pandas()
    rec_sha, rec_n = partition_digest(rec_df, "rec_key")

    return {
        "sf_dir": sf_dir,
        "resolve_pages": {"partition_sha256": pages_sha,
                          "n_clusters": n_clusters,
                          "n_pages": len(clusters)},
        "entity_report": {"content_sha256": report_digest(rep),
                          "n_entities": len(rep)},
        "records_er": {"partition_sha256": rec_sha,
                       "n_clusters": rec_n,
                       "n_records": len(rec_df)},
    }


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    golden = compute_golden()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(json.dumps(golden, indent=1, sort_keys=True))
    ray.shutdown()
