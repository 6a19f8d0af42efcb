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

Known Ray quirk: when a hash partition receives NO keys (possible only
when distinct keys ≈ num_partitions, i.e. tiny inputs), Ray's shuffle
synthesizes a SCHEMA-LESS empty block in the output — harmless to
map_batches/to_pandas/write consumers, but ``Dataset.join`` cannot
consume it. Callers that feed an aggregate into a join at tiny scale
should coalesce first (see ``clustering._distributed_cc``).
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
    num_partitions: int | None = None,
    cfg=None,
) -> rd.Dataset:
    """``agg_spec``: out_col → (in_col, fn) with fn ∈ {sum,count,min,max}.

    ``count`` is SQL ``count(*)`` — group row count, null-inclusive
    (implemented via groupby.size, not pandas' null-excluding count);
    ``in_col`` is ignored for count.

    ``num_partitions=None`` sizes the reduce shuffle via
    ``effective_partitions(cfg)`` (cluster CPU count unless the caller's
    ``cfg.shuffle_partitions`` overrides — the one-knob invariant; pass
    ``cfg`` at every cfg-aware call site). Callers that know their row
    count should pass ``partitions_for(n_rows, cfg)`` instead so the
    shuffle scales with data."""
    if num_partitions is None:
        from ..config import DEFAULT_PIPELINE, effective_partitions

        num_partitions = effective_partitions(cfg or DEFAULT_PIPELINE)
    keys = list(keys)
    for out_col, (in_col, fn) in agg_spec.items():
        if fn not in _PARTIAL_FN:
            raise ValueError(f"unsupported agg fn {fn!r} for {out_col!r}")

    def _empty_partial(batch: pd.DataFrame) -> pa.Table:
        # typed empty table (an untyped one breaks block unions /
        # triggers RefBundle schema warnings downstream)
        typed = pa.Table.from_pandas(batch[keys].head(0), preserve_index=False)
        cols: dict[str, pa.Array] = {
            k: pa.array([], typed.schema.field(k).type) for k in keys
        }
        in_typed = pa.Table.from_pandas(
            batch[[c for c, _ in agg_spec.values()]].head(0),
            preserve_index=False,
        )
        for out_col, (in_col, fn) in agg_spec.items():
            t = pa.int64() if fn == "count" else in_typed.schema.field(in_col).type
            cols[out_col] = pa.array([], t)
        cols["part"] = pa.array([], pa.int64())
        return pa.table(cols)

    def partial(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return _empty_partial(batch)
        g = batch.groupby(keys, sort=False, dropna=False)
        pieces = {}
        for out_col, (in_col, fn) in agg_spec.items():
            if fn == "count":
                pieces[out_col] = g.size()
            else:
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


def hash_topn(
    ds: rd.Dataset,
    keys: list[str],
    order_col: str,
    n: int,
    tie_cols: list[str] | None = None,
    descending: bool = True,
    num_partitions: int | None = None,
    cfg=None,
) -> rd.Dataset:
    """Grouped top-N (the windowed-rank operator): per key, the N rows
    with the largest (or smallest) ``order_col``, ties broken by
    ``tie_cols`` ascending — SQL ``QUALIFY row_number() OVER (PARTITION
    BY keys ORDER BY order_col DESC, tie_cols) <= n``.

    Same two-phase shape as :func:`hash_aggregate`: the per-batch
    partial keeps at most N rows per key (combiner — shuffle volume is
    bounded by N·distinct-keys-per-batch, never the raw row count), the
    single-int-key shuffle co-locates each key's partials, and one
    vectorized sort+head per partition finishes. No per-key Python call.
    ``num_partitions=None`` → ``effective_partitions(cfg)`` (see
    hash_aggregate — pass ``cfg`` so ``shuffle_partitions`` governs).
    """
    if num_partitions is None:
        from ..config import DEFAULT_PIPELINE, effective_partitions

        num_partitions = effective_partitions(cfg or DEFAULT_PIPELINE)
    keys = list(keys)
    tie_cols = list(tie_cols or [])
    sort_cols = keys + [order_col] + tie_cols
    ascending = [True] * len(keys) + [not descending] + [True] * len(tie_cols)

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return s.groupby(keys, sort=False).head(n)

    def partial(batch: pd.DataFrame) -> pa.Table:
        out = topn(batch) if len(batch) else batch
        out = out.copy()
        key_hash = pd.util.hash_pandas_object(out[keys], index=False)
        out["part"] = (key_hash % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(group: pd.DataFrame) -> pa.Table:
        out = topn(group.drop(columns=["part"]))
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("part", num_partitions=num_partitions).map_groups(
        final, batch_format="pandas"
    )


def group_quantiles(
    ds: rd.Dataset,
    keys: list[str],
    value_col: str,
    quantiles: dict[str, float],
    round_to: int | None = 6,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """EXACT per-group quantiles (linear interpolation — SQL
    ``quantile_cont``). ``quantiles``: out_col → q in [0, 1].

    Only (keys, value) cross the shuffle (narrow rows), then one
    vectorized numpy quantile per group. Exact quantiles need each
    group's full value set in one place, so this operator is for
    LOW-CARDINALITY keys (each group must fit a partition — the same
    contract DuckDB's quantile_cont has per group). For high-cardinality
    keys or groups beyond memory, the scale path is a mergeable sketch
    (t-digest) traded for exactness; not needed for the reference
    surface."""
    keys = list(keys)

    def qs(group: pd.DataFrame) -> pd.DataFrame:
        vals = group[value_col].to_numpy(dtype=np.float64)
        row = {k: group[k].iloc[0] for k in keys}
        for out_col, q in quantiles.items():
            v = float(np.quantile(vals, q)) if len(vals) else float("nan")
            row[out_col] = round(v, round_to) if round_to is not None else v
        return pd.DataFrame([row])

    narrow = ds.map_batches(
        lambda b: b[keys + [value_col]], batch_format="pandas"
    )
    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    return narrow.groupby(keys, **kwargs).map_groups(qs, batch_format="pandas")
