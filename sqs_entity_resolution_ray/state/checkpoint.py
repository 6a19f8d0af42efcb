"""Per-stage Parquet checkpoints with lineage manifests (atomic, resumable).

Replaces the reference's Postgres tracker + S3 multipart machinery
(``middleware/db.py`` three-state CDC; ``middleware/exporter.py:245-262``
abort-on-failure) with filesystem atomicity:

- a stage writes to ``<dir>.tmp/`` then atomically renames to ``<dir>/``
  and drops a ``_MANIFEST.json`` recording the input fingerprint, config
  fingerprint, row count and stage stats (the north rule's per-partition
  lineage metadata);
- a failed run leaves only a ``.tmp`` dir, which the next run discards —
  the rewind analogue of ``db.py:90-102`` (IN_PROGRESS → TODO);
- ``load_or_run`` skips a stage whose manifest matches the current
  fingerprints — resume-mid-pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Any, Callable

import ray.data as rd

MANIFEST_NAME = "_MANIFEST.json"


def input_fingerprint(paths: list[str] | str) -> str:
    """Fingerprint input files by (path, size, mtime) — cheap lineage id."""
    if isinstance(paths, str):
        paths = [paths]
    items = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    items.append((fp, st.st_size, int(st.st_mtime)))
        elif os.path.exists(p):
            st = os.stat(p)
            items.append((p, st.st_size, int(st.st_mtime)))
        else:
            items.append((p, -1, -1))
    payload = json.dumps(items, sort_keys=True).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, MANIFEST_NAME)


def read_manifest(ckpt_dir: str) -> dict | None:
    try:
        with open(manifest_path(ckpt_dir)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def is_valid(ckpt_dir: str, fingerprint: str) -> bool:
    m = read_manifest(ckpt_dir)
    return bool(m) and m.get("fingerprint") == fingerprint


def write_checkpoint(
    ds: rd.Dataset,
    ckpt_dir: str,
    fingerprint: str,
    extra: dict[str, Any] | None = None,
) -> dict:
    """Write ``ds`` to ``ckpt_dir`` atomically with a lineage manifest."""
    tmp = ckpt_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    parts = sorted(
        f for f in os.listdir(tmp) if f.endswith(".parquet")
    )
    # per-partition metrics from the parquet footers (north rule:
    # per-partition lineage + metrics)
    import pyarrow.parquet as pq

    partition_stats = []
    count = 0
    for i, part in enumerate(parts):
        fp = os.path.join(tmp, part)
        md = pq.read_metadata(fp)
        partition_stats.append(
            {
                "partition_id": i,
                "file": part,
                "rows": md.num_rows,
                "bytes": os.path.getsize(fp),
            }
        )
        count += md.num_rows
    manifest = {
        "fingerprint": fingerprint,
        "row_count": count,
        "partitions": parts,
        "partition_stats": partition_stats,
        "extra": extra or {},
    }
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    os.replace(tmp, ckpt_dir)
    return manifest


def load_or_run(
    ckpt_dir: str,
    fingerprint: str,
    run: Callable[[], rd.Dataset],
    extra: dict[str, Any] | None = None,
) -> tuple[rd.Dataset, bool]:
    """Return (dataset, was_cached). Runs + checkpoints on cache miss."""
    if is_valid(ckpt_dir, fingerprint):
        return rd.read_parquet(ckpt_dir), True
    ds = run()
    write_checkpoint(ds, ckpt_dir, fingerprint, extra)
    return rd.read_parquet(ckpt_dir), False
