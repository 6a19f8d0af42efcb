"""Windowed aggregation over a stream-shaped table (events).

Ray Data has no event-time windows (SURVEY §2.8 — neither does the
reference: pure unordered at-least-once queue). For stream-shaped
inputs we implement windows the batch way: assign each row its window
start in a vectorized map_batches (floor of ts), then a two-phase hash
aggregate (stages/agg.py) — partial per batch, salted single-key
shuffle, vectorized final merge. (Ray's built-in multi-key
groupby.aggregate row-merges and is ~5× slower on mostly-unique keys.)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import bucket_partitions, DEFAULT_PIPELINE, partitions_for, PipelineConfig
from .agg import hash_aggregate


def tumbling_window_agg(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1h",
    num_partitions: int | None = None,
    cfg: PipelineConfig | None = None,
) -> rd.Dataset:
    """count + sum(value) per (key, tumbling window).

    Returns (key, window_start: timestamp[us], n_events, sum_value).
    ``num_partitions=None`` sizes the reduce shuffle by DATA
    (``partitions_for(events.count())`` — cheap parquet-metadata count
    for the usual raw-read input), never a fixed constant: (key, window)
    keys are mostly unique, so the combiner cannot compress and nearly
    the full row count crosses the reduce shuffle.
    """
    if num_partitions is None:
        num_partitions = partitions_for(events.count(), cfg or DEFAULT_PIPELINE)
    freq = window

    def assign(batch: pd.DataFrame) -> pa.Table:
        df = batch[[key_col, value_col]].copy()
        df["window_start"] = batch[ts_col].dt.floor(freq).astype("datetime64[us]")
        return pa.Table.from_pandas(df, preserve_index=False)

    assigned = events.map_batches(assign, batch_format="pandas")
    return hash_aggregate(
        assigned,
        [key_col, "window_start"],
        {"n_events": (value_col, "count"), "sum_value": (value_col, "sum")},
        num_partitions=num_partitions,
    )


def session_windows(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30min",
    num_partitions: int | None = None,
    cfg: PipelineConfig | None = None,
) -> rd.Dataset:
    """Session windows per key (gap-based), partition-level: keys are
    hash-bucketed so ONE ``map_groups`` call sessionizes a whole
    partition vectorized (sort by (key, ts) → diff → cumsum → groupby) —
    never one Python call per key, which collapses at millions of keys
    (the measured scaling cliff, stages/blocking.py). The partitioning
    assumption: all events of one key land in one partition (guaranteed
    by the key hash); partitions stream, keys don't need to fit memory
    together beyond a partition.

    Returns (key, session_start, session_end, n_events).
    ``num_partitions=None`` → ``bucket_partitions(cfg)`` (the one config
    knob for every bucketed shuffle).
    """
    import numpy as np
    import pyarrow as pa

    if num_partitions is None:
        num_partitions = bucket_partitions(cfg or DEFAULT_PIPELINE)
    gap_td = pd.Timedelta(gap)

    def assign_part(batch: pd.DataFrame) -> pa.Table:
        df = batch[[key_col, ts_col]].copy()
        key_hash = pd.util.hash_pandas_object(df[key_col], index=False)
        df["part"] = (key_hash % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def sessions_in_partition(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col], kind="mergesort")
        key_change = g[key_col] != g[key_col].shift()
        new_session = key_change | (g[ts_col].diff() > gap_td)
        sid = new_session.cumsum()  # globally increasing across keys
        out = g.groupby(sid, sort=True).agg(
            **{
                key_col: (key_col, "first"),
                "session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
                "n_events": (ts_col, "size"),
            }
        )
        return out[[key_col, "session_start", "session_end", "n_events"]]

    assigned = events.map_batches(assign_part, batch_format="pandas")
    return assigned.groupby("part", num_partitions=num_partitions).map_groups(
        sessions_in_partition, batch_format="pandas"
    )


def rolling_window(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_rows: int = 4,
    out_col: str = "roll_avg",
    id_cols: list[str] | None = None,
    round_to: int | None = 6,
    num_partitions: int | None = None,
    cfg: PipelineConfig | None = None,
) -> rd.Dataset:
    """Per-key rolling mean over the last ``window_rows`` rows ordered by
    ``ts_col`` — SQL ``AVG(value) OVER (PARTITION BY key ORDER BY ts
    ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW)`` with a
    shrinking head window (min_periods=1).

    Partition-level like :func:`session_windows`: keys hash-bucket into
    ``num_partitions``; one ``map_groups`` per bucket runs a single
    vectorized ``groupby(key).rolling`` over the whole partition — no
    per-key Python call. ``round_to`` rounds the mean (sliding-sum
    arithmetic differs from a per-window fresh sum in the last float
    bits; rounding makes results comparable across engines).
    """
    import numpy as np

    if num_partitions is None:
        num_partitions = bucket_partitions(cfg or DEFAULT_PIPELINE)
    id_cols = list(id_cols or [])
    keep = [key_col, ts_col, value_col] + id_cols

    def assign_part(batch: pd.DataFrame) -> pa.Table:
        df = batch[keep].copy()
        key_hash = pd.util.hash_pandas_object(df[key_col], index=False)
        df["part"] = (key_hash % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def roll_in_partition(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col] + id_cols, kind="mergesort")
        r = (
            g.groupby(key_col, sort=False)[value_col]
            .rolling(window_rows, min_periods=1)
            .mean()
            .reset_index(drop=True)
        )
        out = g.reset_index(drop=True)[keep]
        out[out_col] = r.round(round_to) if round_to is not None else r
        return out

    assigned = events.map_batches(assign_part, batch_format="pandas")
    return assigned.groupby("part", num_partitions=num_partitions).map_groups(
        roll_in_partition, batch_format="pandas"
    )
