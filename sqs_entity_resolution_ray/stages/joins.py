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
    """Attach a looked-up column from a broadcast small side (dimension
    join). The mapping ships ONCE as sorted numpy key/value arrays; each
    batch gathers with a vectorized searchsorted (+mask for missing keys)
    — no Python dict or per-row loop."""
    import numpy as np

    keys_arr = np.asarray(list(mapping.keys()))
    vals_arr = np.asarray(list(mapping.values()))
    order = np.argsort(keys_arr)
    ref = ray.put((keys_arr[order], vals_arr[order]))

    def f(batch: pa.Table) -> pa.Table:
        ks, vs = ray.get(ref)
        bk = np.asarray(batch.column(key_col).to_numpy(zero_copy_only=False))
        idx = np.searchsorted(ks, bk)
        idx_c = np.minimum(idx, len(ks) - 1)
        hit = ks[idx_c] == bk
        out = vs[idx_c].astype(object)
        out[~hit] = default
        return batch.append_column(out_col, pa.array(out.tolist()))

    return ds.map_batches(f, batch_format="pyarrow")
