"""Affected-entity tracker: the reference's CDC state machine on Parquet.

Mirrors ``middleware/db.py`` exactly in semantics:
- statuses TODO=1, IN_PROGRESS=2, DONE=3, SKIPPED=4 (``db.py:6-9``)
- ``add_entity_id`` appends TODO rows as entities are affected
  (``db.py:26-39``, fed by WITH_INFO AFFECTED_ENTITIES —
  ``consumer.py:195-197``)
- export marks TODO → IN_PROGRESS, then IN_PROGRESS → DONE with an
  export id (``db.py:41-88``), or rewinds IN_PROGRESS → TODO on failure
  (``db.py:90-102``)
- status tallies in one scan (``db.py:104-119``)

State lives in a single Parquet file per tracker (latest-state table,
rewritten atomically). Affected-entity detection is a Dataset diff, not
engine callbacks: an entity is "affected" when its member-set changed
between two cluster checkpoints (SURVEY.md §2.2 M3).
"""

from __future__ import annotations

import datetime as _dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TODO = 1
IN_PROGRESS = 2
DONE = 3
SKIPPED = 4

_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("status", pa.int8()),
        ("export_id", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


class Tracker:
    """A tiny latest-state table with the db.py transition semantics."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> pd.DataFrame:
        if os.path.exists(self.path):
            return pq.read_table(self.path).to_pandas()
        return pd.DataFrame(
            {"entity_id": pd.Series(dtype="object"),
             "status": pd.Series(dtype="int8"),
             "export_id": pd.Series(dtype="object"),
             "ts": pd.Series(dtype="datetime64[us]")}
        )

    def _save(self, df: pd.DataFrame) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tbl = pa.table(
            {
                "entity_id": pa.array(df["entity_id"].astype(str), pa.string()),
                "status": pa.array(df["status"].astype("int8"), pa.int8()),
                "export_id": pa.array(
                    df["export_id"].fillna("").astype(str), pa.string()
                ),
                "ts": pa.array(df["ts"], pa.timestamp("us")),
            }
        )
        tmp = self.path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, self.path)

    @staticmethod
    def _now() -> _dt.datetime:
        return _dt.datetime.utcnow().replace(tzinfo=None)

    def add_entity_ids(self, entity_ids: list[str]) -> int:
        """Append TODO rows (db.py:26-39). Re-adding an id that is DONE
        or IN_PROGRESS re-queues it (a fresh TODO row even while an
        export is claiming the id — matching db.py, where add_entity_id
        always inserts; otherwise an entity re-affected mid-export is
        marked DONE by complete_export and the newer change is lost).
        Only an existing TODO row dedupes."""
        df = self._load()
        active = set(df.loc[df["status"] == TODO, "entity_id"])
        new = [e for e in dict.fromkeys(entity_ids) if e not in active]
        if not new:
            return 0
        add = pd.DataFrame(
            {
                "entity_id": new,
                "status": pd.Series([TODO] * len(new), dtype="int8"),
                "export_id": [""] * len(new),
                "ts": [self._now()] * len(new),
            }
        )
        self._save(pd.concat([df, add], ignore_index=True))
        return len(new)

    def begin_export(self) -> list[str]:
        """TODO → IN_PROGRESS; returns the distinct claimed entity ids
        (db.py:41-65)."""
        df = self._load()
        mask = df["status"] == TODO
        ids = sorted(df.loc[mask, "entity_id"].unique())
        df.loc[mask, "status"] = IN_PROGRESS
        df.loc[mask, "ts"] = self._now()
        self._save(df)
        return ids

    def complete_export(self, export_id: str, skipped: list[str] | None = None) -> None:
        """IN_PROGRESS → DONE (+export id); deleted/merged-away entities →
        SKIPPED (db.py:67-88; exporter.py:188-189 SzNotFoundError skip)."""
        df = self._load()
        skipped = set(skipped or [])
        prog = df["status"] == IN_PROGRESS
        sk = prog & df["entity_id"].isin(skipped)
        df.loc[prog & ~sk, "status"] = DONE
        df.loc[prog & ~sk, "export_id"] = export_id
        df.loc[sk, "status"] = SKIPPED
        df.loc[sk, "export_id"] = export_id
        df.loc[prog, "ts"] = self._now()
        self._save(df)

    def rewind(self) -> int:
        """IN_PROGRESS → TODO after a failed export (db.py:90-102)."""
        df = self._load()
        mask = df["status"] == IN_PROGRESS
        df.loc[mask, "status"] = TODO
        df.loc[mask, "ts"] = self._now()
        self._save(df)
        return int(mask.sum())

    def tallies(self) -> dict[str, int]:
        """Status counts in one scan (db.py:104-119)."""
        df = self._load()
        names = {TODO: "todo", IN_PROGRESS: "in_progress", DONE: "done",
                 SKIPPED: "skipped"}
        out = {v: 0 for v in names.values()}
        for status, n in df["status"].value_counts().items():
            out[names.get(int(status), "unknown")] = int(n)
        return out

    def to_pandas(self) -> pd.DataFrame:
        return self._load()


def affected_entities_ds(prev_clusters, new_clusters,
                         num_partitions: int | None = None,
                         cfg=None
                         ) -> tuple[list[str], list[str]]:
    """Distributed cluster-map diff: same contract as
    :func:`affected_entities` but over ``(url, entity_id)`` Datasets —
    nothing corpus-sized ever reaches the driver.

    Plan: tag both maps (side 0 = prev, 1 = new), hash-bucket on url so
    each url's two rows co-locate, and per partition emit deduped
    (entity_id, cn, co) flag partials — cn = new id on a changed url,
    co = old id on a changed url. An entity-keyed aggregate merges the
    flags; the driver collects only that churn-sized table. Old ids
    needing an existence check (co without cn) are then resolved with
    ONE streaming broadcast-filter scan of the new map — no shuffle,
    nothing corpus-sized collected. affected = cn ∪ (co ∩ exists-new);
    deleted = co − exists-new."""
    import numpy as np

    from ..stages.agg import hash_aggregate
    from ..stages.joins import broadcast_semi_join

    if num_partitions is None:  # one-knob invariant (config.py:146)
        from ..config import bucket_partitions

        num_partitions = bucket_partitions(cfg, 32)
    from_new = new_clusters.select_columns(["url", "entity_id"])
    if prev_clusters is None:
        ids = hash_aggregate(
            from_new.select_columns(["entity_id"]),
            ["entity_id"], {"_n": ("entity_id", "count")}, cfg=cfg,
        ).select_columns(["entity_id"]).to_pandas()
        return sorted(ids["entity_id"]), []

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pandas()
            h = pd.util.hash_pandas_object(urls, index=False)
            return pa.table({
                "url": t.column("url"),
                "entity_id": t.column("entity_id"),
                "side": pa.array(
                    np.full(len(t), side, dtype=np.int8), pa.int8()),
                "part": pa.array(
                    (h % np.uint64(num_partitions)).to_numpy().astype(
                        np.int64), pa.int64()),
            })
        return f

    tagged = prev_clusters.select_columns(["url", "entity_id"]).map_batches(
        tag(0), batch_format="pyarrow"
    ).union(from_new.map_batches(tag(1), batch_format="pyarrow"))

    def diff_part(g: pd.DataFrame) -> pd.DataFrame:
        old = g.loc[g["side"] == 0, ["url", "entity_id"]]
        new = g.loc[g["side"] == 1, ["url", "entity_id"]]
        m = old.merge(new, on="url", how="outer", suffixes=("_o", "_n"))
        changed = m[m["entity_id_o"].ne(m["entity_id_n"])]
        cn = changed["entity_id_n"].dropna().unique()
        co = changed["entity_id_o"].dropna().unique()
        f = pd.concat([
            pd.DataFrame({"entity_id": cn, "cn": 1, "co": 0}),
            pd.DataFrame({"entity_id": co, "cn": 0, "co": 1}),
        ])
        return f.groupby("entity_id", as_index=False).max()

    partials = tagged.groupby("part", num_partitions=num_partitions).map_groups(
        diff_part, batch_format="pandas")
    flags = hash_aggregate(partials, ["entity_id"],
                           {"cn": ("cn", "max"), "co": ("co", "max")},
                           cfg=cfg).to_pandas()
    cn_set = set(flags.loc[flags["cn"] > 0, "entity_id"])
    co_only = sorted(set(flags.loc[flags["co"] > 0, "entity_id"]) - cn_set)
    exists = set()
    if co_only:
        # a changed-url new id (cn) exists in new by construction; only
        # the co-only ids need the existence scan
        exists = set(
            hash_aggregate(
                broadcast_semi_join(
                    from_new.select_columns(["entity_id"]),
                    "entity_id", co_only),
                ["entity_id"], {"_n": ("entity_id", "count")}, cfg=cfg,
            ).select_columns(["entity_id"]).to_pandas()["entity_id"]
        )
    affected_ids = sorted(cn_set | (set(co_only) & exists))
    deleted_ids = sorted(set(co_only) - exists)
    return affected_ids, deleted_ids


def affected_entities(prev_clusters: pd.DataFrame | None,
                      new_clusters: pd.DataFrame) -> tuple[list[str], list[str]]:
    """Diff two (url, entity_id) cluster maps.

    Returns (affected_new_ids, deleted_old_ids):
    - affected: new entity ids whose member set is new or changed
      (the WITH_INFO AFFECTED_ENTITIES analogue, consumer.py:195-197)
    - deleted: old entity ids that no longer exist — merged away
      (exporter.py:188-189 SzNotFoundError ⇒ skip)
    """
    if prev_clusters is None or prev_clusters.empty:
        return sorted(new_clusters["entity_id"].unique()), []
    prev_map = prev_clusters.set_index("url")["entity_id"]
    new_map = new_clusters.set_index("url")["entity_id"]
    merged = prev_map.to_frame("old").join(new_map.to_frame("new"), how="outer")
    changed = merged[(merged["old"] != merged["new"])]
    affected = set(changed["new"].dropna())
    old_ids = set(prev_map.unique())
    new_ids = set(new_map.unique())
    deleted = old_ids - new_ids
    # an old entity whose membership changed but that still exists is
    # also affected (its member set shrank/grew)
    affected |= {e for e in changed["old"].dropna() if e in new_ids}
    return sorted(affected), sorted(deleted)
