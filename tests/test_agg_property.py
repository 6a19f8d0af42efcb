"""Property-based gates for the two-phase aggregation layer
(``stages/agg.py``): on arbitrary random frames, ``hash_aggregate`` and
``hash_topn`` must reproduce the answer computed by an independent
single-process pandas groupby written here — across every partition
count, including ones that leave hash partitions empty (the regime
where Ray's hash shuffle synthesizes schema-less empty blocks)."""

import numpy as np
import pandas as pd
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from sqs_entity_resolution_ray.stages.agg import hash_aggregate, hash_topn

frame = st.lists(
    st.tuples(
        st.integers(0, 6),                    # key k1
        st.sampled_from(["x", "y", "z"]),     # key k2
        st.integers(-1000, 1000),             # value v
    ),
    min_size=1,
    max_size=120,
).map(lambda rows: pd.DataFrame(rows, columns=["k1", "k2", "v"]))


@given(frame, st.integers(1, 9))
@settings(max_examples=12, deadline=None)
def test_hash_aggregate_matches_pandas(ray_session, df, n_part):
    ds = ray.data.from_pandas(df)
    out = hash_aggregate(
        ds,
        ["k1", "k2"],
        {
            "v_sum": ("v", "sum"),
            "n": ("v", "count"),
            "v_min": ("v", "min"),
            "v_max": ("v", "max"),
        },
        num_partitions=n_part,
    ).to_pandas()

    g = df.groupby(["k1", "k2"], dropna=False)
    truth = pd.DataFrame(
        {
            "v_sum": g["v"].sum(),
            "n": g.size(),
            "v_min": g["v"].min(),
            "v_max": g["v"].max(),
        }
    ).reset_index()

    key = ["k1", "k2"]
    out = out.sort_values(key).reset_index(drop=True)[truth.columns]
    truth = truth.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, truth, check_dtype=False)


@given(frame, st.integers(1, 9), st.integers(1, 4))
@settings(max_examples=12, deadline=None)
def test_hash_topn_matches_pandas(ray_session, df, n_part, n):
    # make rows unique so top-n under a deterministic tie-break is a
    # well-defined SET (tie column = a unique row id)
    df = df.copy()
    df["rid"] = np.arange(len(df))
    ds = ray.data.from_pandas(df)
    out = hash_topn(
        ds,
        ["k1"],
        order_col="v",
        n=n,
        tie_cols=["rid"],
        descending=True,
        num_partitions=n_part,
    ).to_pandas()

    truth = (
        df.sort_values(["k1", "v", "rid"], ascending=[True, False, True],
                       kind="mergesort")
        .groupby("k1", sort=False)
        .head(n)
    )
    assert set(map(tuple, out[["k1", "v", "rid"]].itertuples(index=False))) \
        == set(map(tuple, truth[["k1", "v", "rid"]].itertuples(index=False)))
