"""Two-phase hash aggregation (combiner pattern) for high-cardinality keys.

Ray Data's built-in ``groupby(...).aggregate(...)`` merges groups
row-by-row in its AggregateReduce suboperator — fine for few groups,
pathological when most keys are unique (measured: ~5k rows/s on a
mostly-unique two-column key). This implements the classic two-phase
plan with vectorized pandas at both ends:

  1. partial: ``map_batches`` does a pandas groupby per batch (combiner —
     shuffle volume becomes one row per key per batch);
  2. shuffle: each partial row gets ``part = hash(keys) % P`` and a
     single-int-key ``groupby("part")`` moves whole key-buckets together;
  3. final: one vectorized pandas groupby per bucket.

Semantics = SQL ``GROUP BY keys`` with sum/count/min/max measures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_PARTIAL_FN = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def hash_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    num_partitions: int = 16,
) -> rd.Dataset:
    """``agg_spec``: out_col → (in_col, fn) with fn ∈ {sum,count,min,max}.

    For ``count``, ``in_col`` may be any non-null column (SQL count(*)
    over the group)."""
    keys = list(keys)
    for out_col, (in_col, fn) in agg_spec.items():
        if fn not in _PARTIAL_FN:
            raise ValueError(f"unsupported agg fn {fn!r} for {out_col!r}")

    def partial(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pandas(
                pd.DataFrame(columns=keys + list(agg_spec) + ["part"]),
                preserve_index=False,
            )
        g = batch.groupby(keys, sort=False, dropna=False)
        pieces = {}
        for out_col, (in_col, fn) in agg_spec.items():
            pieces[out_col] = g[in_col].agg(_PARTIAL_FN[fn])
        out = pd.DataFrame(pieces).reset_index()
        key_hash = pd.util.hash_pandas_object(out[keys], index=False)
        out["part"] = (key_hash % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(group: pd.DataFrame) -> pa.Table:
        g = group.groupby(keys, sort=False, dropna=False)
        pieces = {}
        for out_col, (in_col, fn) in agg_spec.items():
            pieces[out_col] = g[out_col].agg(_MERGE_FN[fn])
        out = pd.DataFrame(pieces).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("part", num_partitions=num_partitions).map_groups(
        final, batch_format="pandas"
    )
