"""Mergeable-sketch tests: HLL distinct + digest quantiles (tolerances)."""

import numpy as np
import pandas as pd


def test_approx_distinct_tolerance(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.sketch import approx_distinct

    rng = np.random.default_rng(3)
    true_n = 20_000
    vals = rng.integers(0, true_n, size=120_000)  # ~all values hit
    n_true = len(np.unique(vals))
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    est = approx_distinct(ds, "v")
    assert abs(est - n_true) / n_true < 0.05  # p=10 → σ≈3.2%


def test_approx_distinct_merge_invariance(ray_session):
    """Estimate must not depend on how rows split into blocks."""
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.sketch import approx_distinct

    vals = np.arange(5000)
    a = approx_distinct(
        rd.from_pandas(pd.DataFrame({"v": vals})).repartition(2), "v")
    b = approx_distinct(
        rd.from_pandas(pd.DataFrame({"v": vals})).repartition(16), "v")
    assert a == b


def test_digest_quantiles_accuracy(ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.sketch import digest_quantiles

    rng = np.random.default_rng(5)
    frames = []
    for g, (mu, sigma) in {"a": (0.0, 1.0), "b": (50.0, 10.0)}.items():
        frames.append(pd.DataFrame(
            {"g": g, "v": rng.normal(mu, sigma, size=40_000)}))
    df = pd.concat(frames, ignore_index=True)
    out = (
        digest_quantiles(rd.from_pandas(df), ["g"], "v",
                         {"p50": 0.5, "p90": 0.9, "p99": 0.99})
        .to_pandas().set_index("g").sort_index()
    )
    for g in ["a", "b"]:
        exact = np.quantile(df[df.g == g]["v"], [0.5, 0.9, 0.99])
        got = out.loc[g, ["p50", "p90", "p99"]].to_numpy(dtype=float)
        spread = df[df.g == g]["v"].max() - df[df.g == g]["v"].min()
        assert np.all(np.abs(got - exact) / spread < 0.01), (g, got, exact)


def test_digest_serialization_roundtrip():
    from sqs_entity_resolution_ray.stages.sketch import QuantileDigest

    rng = np.random.default_rng(9)
    d = QuantileDigest(64).add(rng.exponential(2.0, size=10_000))
    d2 = QuantileDigest.from_bytes(d.to_bytes(), 64)
    for q in (0.1, 0.5, 0.95):
        assert d.quantile(q) == d2.quantile(q)
