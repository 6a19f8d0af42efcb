"""As-of join (event-time point lookup) — partition-level, no per-key calls.

Ray Data has no as-of join; the reference has no join engine at all (its
joins are Senzing-internal / Postgres-side — SURVEY §2.4). This is the
batch formulation used by training-data pipelines ("attribute each
purchase to the user's most recent prior click"):

1. both sides are reduced to the needed columns and tagged
   (``__side``: 0 = left/probe, 1 = right/reference), the other side's
   value columns padded with TYPED nulls so every block shares one
   explicit Arrow schema (an untyped pad breaks block unions);
2. one hash shuffle on ``hash(by) % num_partitions`` co-locates every
   row of a key (both sides) in one partition — the SAME single-int-key
   bucket shuffle used by stages/agg.py and session_windows;
3. per partition, ONE vectorized ``pandas.merge_asof`` (sort by ts,
   backward search, ``by=key``) matches every probe row to the latest
   reference row with ``ref_ts <= probe_ts``.

Partitioning assumption: all rows of one key fit in one partition
(narrow rows — only key, ts, and the requested value columns cross the
shuffle). Skewed keys: salt the probe side and replicate the reference
side per salt, as stages/blocking.py does for hot blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _arrow_type(ds: rd.Dataset, col: str) -> pa.DataType:
    sch = ds.schema()
    return sch.base_schema.field(col).type if hasattr(sch, "base_schema") \
        else sch.field(col).type


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    num_partitions: int = 32,
    allow_exact_matches: bool = True,
) -> rd.Dataset:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``by`` key (SQL ASOF JOIN).

    Output columns: ``by`` + ``left_cols`` + ``left_ts`` + ``right_ts``
    + ``right_cols`` (right value columns keep their names — pre-rename
    on the caller side if they clash). ``how='inner'`` drops unmatched
    probe rows, ``'left'`` keeps them with nulls. Right
    ``(by, right_ts)`` pairs should be unique for a deterministic
    result (the same requirement DuckDB's ASOF JOIN has for ties)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lcols = [c for c in left_cols if c not in (by, left_ts)]
    rcols = [c for c in right_cols if c not in (by, right_ts)]

    # one explicit superset schema for both tagged sides
    lsch = left.schema()
    rsch = right.schema()
    ltype = {n: t for n, t in zip(lsch.names, lsch.types)}
    rtype = {n: t for n, t in zip(rsch.names, rsch.types)}
    unified = pa.schema(
        [(by, ltype[by]), ("__ts", ltype[left_ts])]
        + [(c, ltype[c]) for c in lcols]
        + [("__r_ts", rtype[right_ts])]
        + [("__r_" + c, rtype[c]) for c in rcols]
        + [("__side", pa.int8()), ("part", pa.int64())]
    )

    def _part_of(keys: pa.ChunkedArray, n: int) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(keys.to_numpy(zero_copy_only=False)), index=False
        )
        return pa.array((h % np.uint64(num_partitions)).astype(np.int64),
                        pa.int64())

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            by: batch.column(by).cast(unified.field(by).type),
            "__ts": batch.column(left_ts).cast(unified.field("__ts").type),
        }
        for c in lcols:
            cols[c] = batch.column(c).cast(unified.field(c).type)
        cols["__r_ts"] = pa.nulls(n, unified.field("__r_ts").type)
        for c in rcols:
            cols["__r_" + c] = pa.nulls(n, unified.field("__r_" + c).type)
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
        cols["part"] = _part_of(batch.column(by), n)
        return pa.table(cols, schema=unified)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            by: batch.column(by).cast(unified.field(by).type),
            "__ts": pa.nulls(n, unified.field("__ts").type),
        }
        for c in lcols:
            cols[c] = pa.nulls(n, unified.field(c).type)
        cols["__r_ts"] = batch.column(right_ts).cast(unified.field("__r_ts").type)
        for c in rcols:
            cols["__r_" + c] = batch.column(c).cast(
                unified.field("__r_" + c).type)
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        cols["part"] = _part_of(batch.column(by), n)
        return pa.table(cols, schema=unified)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    # pandas renders the cross-side null padding as NaN, silently
    # promoting e.g. int64 → float64; each side's own rows are null-free,
    # so restore the source dtypes before merging. The ts columns are
    # padded on the opposite side too — integer timestamps would
    # otherwise merge as float64 (precision loss past 2^53).
    lp_dtype = {c: ltype[c].to_pandas_dtype() for c in lcols}
    lp_dtype["__ts"] = ltype[left_ts].to_pandas_dtype()
    rp_dtype = {"__r_" + c: rtype[c].to_pandas_dtype() for c in rcols}
    rp_dtype["__r_ts"] = rtype[right_ts].to_pandas_dtype()

    def merge_partition(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0]
        r = group[group["__side"] == 1]
        probe = (
            l[[by, "__ts"] + lcols]
            .astype(lp_dtype)
            .sort_values("__ts", kind="mergesort")
        )
        ref = (
            r[[by, "__r_ts"] + ["__r_" + c for c in rcols]]
            .astype(rp_dtype)
            .sort_values("__r_ts", kind="mergesort")
        )
        out = pd.merge_asof(
            probe, ref, left_on="__ts", right_on="__r_ts",
            left_by=by, right_by=by, direction="backward",
            allow_exact_matches=allow_exact_matches,
        )
        if how == "inner":
            out = out[out["__r_ts"].notna()]
        out = out.rename(columns={"__ts": left_ts, "__r_ts": right_ts})
        out = out.rename(columns={"__r_" + c: c for c in rcols})
        return out[[by] + lcols + [left_ts, right_ts] + rcols]

    return tagged.groupby("part", num_partitions=num_partitions).map_groups(
        merge_partition, batch_format="pandas"
    )
