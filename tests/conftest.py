"""Session-scoped Ray + shared fixtures (one ray.init per pytest session)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus(ray_session):
    """Small deterministic corpus dir (cached under /tmp)."""
    from sqs_entity_resolution_ray.sources.corpus import corpus_dir

    return corpus_dir(n_entities=60, n_noise=80, farm_size=40, seed=42)


@pytest.fixture(scope="session")
def resolved(corpus, ray_session):
    """Full ER pipeline artifacts + collected clusters on the corpus."""
    from sqs_entity_resolution_ray.pipelines.resolve import read_pages, resolve

    art = resolve(read_pages(corpus + "/pages.parquet"))
    clusters = art.clusters.to_pandas()
    return art, clusters


def cluster_partition(df: pd.DataFrame, col: str) -> set[frozenset]:
    return set(frozenset(g) for _, g in df.groupby(col)["url"])
