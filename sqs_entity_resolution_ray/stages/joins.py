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


def hash_join(left: rd.Dataset, right: rd.Dataset, on,
              right_on=None, join_type: str = "inner",
              num_partitions: int | None = None,
              num_rows_hint: int | None = None,
              left_suffix: str | None = None,
              right_suffix: str | None = None) -> rd.Dataset:
    """Large-large equi-join: hash-shuffle both sides on the key
    (``Dataset.join``). Partition count is data-sized via
    ``partitions_for`` (join aggregator actors cost ~0.5-1 s startup
    each; see config.py:132) — pass ``num_rows_hint`` with the larger
    side's row count when known to avoid triggering a count.

    Scale note: both sides shuffle fully. When one side is small,
    prefer :func:`broadcast_lookup` / :func:`broadcast_semi_join`
    (no shuffle at all)."""
    from ..config import PipelineConfig, partitions_for

    if num_partitions is None:
        n = num_rows_hint if num_rows_hint is not None else left.count()
        num_partitions = partitions_for(n, PipelineConfig())
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions,
        on=tuple(on) if not isinstance(on, str) else (on,),
        right_on=(tuple(right_on) if not isinstance(right_on, str) else (right_on,))
        if right_on is not None else None,
        left_suffix=left_suffix, right_suffix=right_suffix,
    )


def interval_lookup(ds: rd.Dataset, value_col: str,
                    intervals: list[tuple], out_col: str,
                    drop_unmatched: bool = True) -> rd.Dataset:
    """Range/interval join against a SMALL interval table: each row is
    assigned the label of the half-open interval [lo, hi) containing
    ``value_col``. Intervals must be non-overlapping; they ship ONCE as
    sorted numpy bound arrays and each batch assigns labels with one
    vectorized searchsorted — the broadcast analogue of SQL
    ``JOIN b ON v >= b.lo AND v < b.hi`` (no shuffle; the big side
    streams). For interval tables too large to broadcast, range-
    partition both sides on the interval key instead.

    ``intervals``: [(lo, hi, label), ...]."""
    import numpy as np

    ivs = sorted(intervals)
    los = np.array([iv[0] for iv in ivs], dtype=np.float64)
    his = np.array([iv[1] for iv in ivs], dtype=np.float64)
    labels = np.array([iv[2] for iv in ivs], dtype=object)
    ref = ray.put((los, his, labels))

    def f(batch: pa.Table) -> pa.Table:
        los_s, his_s, labels_s = ray.get(ref)
        import numpy as np

        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(los_s, v, side="right") - 1
        idx_c = np.maximum(idx, 0)
        hit = (idx >= 0) & (v < his_s[idx_c])
        lab = labels_s[idx_c].astype(object)
        lab[~hit] = None
        out = batch.append_column(out_col, pa.array(lab.tolist(), pa.string()))
        if drop_unmatched:
            out = out.filter(pa.array(hit))
        return out

    return ds.map_batches(f, batch_format="pyarrow")
