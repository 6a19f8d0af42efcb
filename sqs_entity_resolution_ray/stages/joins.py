"""Join/lookup helpers (SURVEY §2.4).

- Broadcast semi/anti join: the small key side is shipped ONCE via
  ``ray.put`` and each batch filters against it — no shuffle. This is
  the J1 tracker-semi-join analogue (``db.py:41-65`` +
  ``exporter.py:173-189``: point-lookups of claimed ids; the anti
  direction is the deleted-entity drop, ``exporter.py:188-189``).
- For large-large joins use ``Dataset.join`` (hash shuffle) as the
  scoring/clustering stages do.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def broadcast_semi_join(ds: rd.Dataset, key_col: str, keys,
                        anti: bool = False) -> rd.Dataset:
    """Filter ``ds`` to rows whose ``key_col`` is in (semi) or not in
    (anti) ``keys`` (an iterable, materialized small side)."""
    key_list = sorted(set(keys))
    ref = ray.put(key_list)

    def f(batch: pa.Table) -> pa.Table:
        vals = pa.array(ray.get(ref))
        mask = pc.is_in(batch.column(key_col), value_set=vals)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_lookup(ds: rd.Dataset, key_col: str, mapping: dict,
                     out_col: str, default=None) -> rd.Dataset:
    """Attach a looked-up column from a broadcast dict (dimension join)."""
    ref = ray.put(mapping)

    def f(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        vals = [m.get(k, default) for k in batch.column(key_col).to_pylist()]
        return batch.append_column(out_col, pa.array(vals))

    return ds.map_batches(f, batch_format="pyarrow")
