"""Full / delta entity export (SURVEY.md §3 P-3, reference exporter.py).

Reference behavior reproduced:
- ``EXPORT_MODE=full``: stream the whole entity report
  (``exporter.py:149-150,192-198``) → we write the full clusters/report
  dataset as partitioned Parquet (+ JSONL option).
- ``EXPORT_MODE=delta``: export only tracker-TODO entities
  (``exporter.py:140-147,173-189``); ids that vanished (merged away)
  are skipped like ``SzNotFoundError`` → SKIPPED.
- Atomic output: write to ``<out>.tmp`` then rename + ``_SUCCESS``
  manifest — the multipart-upload complete/abort analogue
  (``exporter.py:200-234,245-262``); on failure the tracker rewinds
  IN_PROGRESS → TODO (``db.py:90-102``).
- Timestamped run ids name outputs like ``build_output_filename``
  (``exporter.py:69-78``).
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..state.tracker import Tracker, affected_entities


def _run_dir(out_root: str, run_id: str, mode: str) -> str:
    return os.path.join(out_root, f"{run_id}-export-{mode}")


def full_export(clusters: rd.Dataset, out_root: str, run_id: str,
                report: rd.Dataset | None = None,
                jsonl: bool = False) -> str:
    """Write the complete cluster map (and optional nested report).

    ``jsonl=True`` additionally writes the report as JSONL — the
    reference's export format (one entity per line,
    ``exporter.py:152-155``; Ray writes one file per block, making the
    10 MiB multipart assembly unnecessary).
    """
    out = _run_dir(out_root, run_id, "full")
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    clusters.write_parquet(os.path.join(tmp, "clusters"))
    n = clusters.count()
    n_report = None
    if report is not None:
        report.write_parquet(os.path.join(tmp, "report"))
        if jsonl:
            report.write_json(os.path.join(tmp, "report_jsonl"))
        n_report = report.count()
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        json.dump({"run_id": run_id, "mode": "full", "rows": n,
                   "entities": n_report}, f)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def delta_export(clusters: rd.Dataset, tracker: Tracker, out_root: str,
                 run_id: str) -> tuple[str, list[str], list[str]]:
    """Export only entities the tracker marks TODO.

    Returns (out_dir, exported_ids, skipped_ids). Semi-join on entity_id
    implemented as a broadcast filter (claimed ids are small relative to
    the cluster map; were they not, this becomes a hash join).
    """
    claimed = tracker.begin_export()
    out = _run_dir(out_root, run_id, "delta")
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    try:
        claimed_set = set(claimed)
        if claimed_set:
            import pyarrow.compute as pc

            delta = clusters.map_batches(
                lambda t: t.filter(
                    pc.is_in(t.column("entity_id"),
                             value_set=pa.array(sorted(claimed_set)))
                ),
                batch_format="pyarrow",
            )
            delta.write_parquet(os.path.join(tmp, "clusters"))
            exported = set(
                delta.select_columns(["entity_id"]).unique("entity_id")
            )
        else:
            os.makedirs(os.path.join(tmp, "clusters"), exist_ok=True)
            exported = set()
        skipped = sorted(claimed_set - exported)  # merged-away entities
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            json.dump({"run_id": run_id, "mode": "delta",
                       "exported": len(exported), "skipped": len(skipped)}, f)
        shutil.rmtree(out, ignore_errors=True)
        os.replace(tmp, out)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        tracker.rewind()
        raise
    tracker.complete_export(os.path.basename(out), skipped=skipped)
    return out, sorted(exported), skipped


def record_affected(tracker: Tracker, prev_clusters: pd.DataFrame | None,
                    new_clusters: pd.DataFrame) -> tuple[list[str], list[str]]:
    """Diff cluster maps and enqueue affected entity ids as TODO
    (consumer.py:195-197 AFFECTED_ENTITIES → db.add_entity_id)."""
    affected, deleted = affected_entities(prev_clusters, new_clusters)
    tracker.add_entity_ids(affected)
    return affected, deleted
