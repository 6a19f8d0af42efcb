"""Windowed aggregation over a stream-shaped table (events).

Ray Data has no event-time windows (SURVEY §2.8 — neither does the
reference: pure unordered at-least-once queue). For stream-shaped
inputs we implement windows the batch way: assign each row its window
start in a vectorized map_batches (floor of ts), pre-aggregate
per (key, window) inside each batch, then a small groupby merges
partials — the combiner pattern, so the shuffle moves one row per
(key, window, batch) instead of one per event.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def tumbling_window_agg(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1h",
) -> rd.Dataset:
    """count + sum(value) per (key, tumbling window).

    Returns (key, window_start: timestamp[us], n_events, sum_value).
    """
    freq = window

    def partial(batch: pd.DataFrame) -> pa.Table:
        df = batch[[key_col, ts_col, value_col]].copy()
        df["window_start"] = df[ts_col].dt.floor(freq)
        g = (
            df.groupby([key_col, "window_start"], sort=False)[value_col]
            .agg(["count", "sum"])
            .reset_index()
        )
        return pa.table(
            {
                key_col: pa.array(g[key_col]),
                "window_start": pa.array(g["window_start"].astype("datetime64[us]")),
                "n_events": pa.array(g["count"].astype(np.int64)),
                "sum_value": pa.array(g["sum"].astype(np.float64)),
            }
        )

    partials = events.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    return partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
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
