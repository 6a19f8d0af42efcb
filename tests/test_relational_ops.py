"""hash_join / interval_lookup / asof_join / rolling_window /
group_quantiles operator tests (small frames, exact expectations)."""

import numpy as np
import pandas as pd
import pytest


def test_hash_join_inner(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.joins import hash_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]}))
    right = rd.from_pandas(pd.DataFrame(
        {"rk": [2, 3, 5], "rv": [20.0, 30.0, 50.0]}))
    out = hash_join(left, right, on="k", right_on="rk",
                    num_rows_hint=4).to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3]
    assert out["rv"].tolist() == [20.0, 30.0]

    lo = hash_join(left, right, on="k", right_on="rk", join_type="left_outer",
                   num_rows_hint=4).to_pandas().sort_values("k")
    assert len(lo) == 4
    assert lo[lo.k == 1]["rv"].isna().all()


def test_interval_lookup(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.joins import interval_lookup

    ds = rd.from_pandas(pd.DataFrame({"v": [0.5, 1.0, 10.9, 11.0, 50.0, 99.0]}))
    bands = [(1.0, 11.0, "low"), (11.0, 51.0, "high")]
    out = interval_lookup(ds, "v", bands, "band").to_pandas()
    assert out["v"].tolist() == [1.0, 10.9, 11.0, 50.0]  # 0.5/99 dropped
    assert out["band"].tolist() == ["low", "low", "high", "high"]

    kept = interval_lookup(ds, "v", bands, "band",
                           drop_unmatched=False).to_pandas()
    assert len(kept) == 6
    assert kept[kept.v == 0.5]["band"].isna().all()


def _asof_frames():
    probe = pd.DataFrame({
        "uid": [1, 1, 2, 3],
        "pts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 12:00",
                               "2024-01-01 11:00", "2024-01-01 09:00"]
                              ).astype("datetime64[us]"),
        "pid": [100, 101, 102, 103],
    })
    ref = pd.DataFrame({
        "uid": [1, 1, 2],
        "rts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 11:30",
                               "2024-01-01 11:00"]).astype("datetime64[us]"),
        "rv": [9.5, 11.5, 11.0],
    })
    return probe, ref


def test_asof_join_inner_and_left(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.asof import asof_join

    probe, ref = _asof_frames()
    out = asof_join(
        rd.from_pandas(probe), rd.from_pandas(ref), by="uid",
        left_ts="pts", right_ts="rts", left_cols=["pid"], right_cols=["rv"],
        how="inner", num_partitions=4,
    ).to_pandas().sort_values("pid").reset_index(drop=True)
    # pid 100 ← 9:30 ref; 101 ← 11:30; 102 ← 11:00 exact; 103 unmatched
    assert out["pid"].tolist() == [100, 101, 102]
    assert out["rv"].tolist() == [9.5, 11.5, 11.0]
    assert str(out["pid"].dtype) == "int64"  # typed-null pad must not leak

    left = asof_join(
        rd.from_pandas(probe), rd.from_pandas(ref), by="uid",
        left_ts="pts", right_ts="rts", left_cols=["pid"], right_cols=["rv"],
        how="left", num_partitions=4,
    ).to_pandas().sort_values("pid").reset_index(drop=True)
    assert len(left) == 4
    assert left[left.pid == 103]["rv"].isna().all()

    strict = asof_join(
        rd.from_pandas(probe), rd.from_pandas(ref), by="uid",
        left_ts="pts", right_ts="rts", left_cols=["pid"], right_cols=["rv"],
        how="inner", num_partitions=4, allow_exact_matches=False,
    ).to_pandas()
    # pid 102's 11:00 exact match no longer allowed and uid 2 has no
    # earlier ref row
    assert sorted(strict["pid"]) == [100, 101]


def test_rolling_window_matches_pandas(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.windows import rolling_window

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.permutation(n), unit="m"),
        "value": rng.normal(size=n).round(3),
        "event_id": np.arange(n),
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = rolling_window(rd.from_pandas(df), id_cols=["event_id"],
                         window_rows=4).to_pandas()
    exp = df.sort_values(["user_id", "ts"]).copy()
    exp["roll_avg"] = (
        exp.groupby("user_id")["value"].rolling(4, min_periods=1).mean()
        .reset_index(drop=True).to_numpy().round(6)
    )
    merged = out.set_index("event_id")["roll_avg"].sort_index()
    expected = exp.set_index("event_id")["roll_avg"].sort_index()
    pd.testing.assert_series_equal(merged, expected)


def test_group_quantiles_exact(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.agg import group_quantiles

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 4,
        "v": [1.0, 2.0, 3.0, 4.0, 100.0, 10.0, 20.0, 30.0, 40.0],
    })
    out = group_quantiles(rd.from_pandas(df), ["g"], "v",
                          {"p50": 0.5, "p25": 0.25}).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    assert out.loc[0, "p50"] == 3.0          # median of 5
    assert out.loc[1, "p50"] == 25.0         # interpolated median of 4
    assert out.loc[1, "p25"] == pytest.approx(17.5)
