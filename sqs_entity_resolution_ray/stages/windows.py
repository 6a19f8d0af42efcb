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

from .agg import hash_aggregate


def tumbling_window_agg(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1h",
    num_partitions: int = 16,
) -> rd.Dataset:
    """count + sum(value) per (key, tumbling window).

    Returns (key, window_start: timestamp[us], n_events, sum_value).
    """
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
) -> rd.Dataset:
    """Session windows per key (gap-based), via groupby(key).map_groups
    over ts-sorted groups — the documented partitioning assumption is
    that one key's events fit one group (holds for per-user streams).

    Returns (key, session_start, session_end, n_events).
    """
    gap_td = pd.Timedelta(gap)

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col)
        new_session = g[ts_col].diff() > gap_td
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        out[key_col] = g[key_col].iloc[0]
        return out[[key_col, "session_start", "session_end", "n_events"]]

    return events.groupby(key_col).map_groups(sessions, batch_format="pandas")
