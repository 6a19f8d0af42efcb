"""Incremental re-resolution (SURVEY §2 S5; reference redoer.py:90-212):
adding a page re-blocks/re-scores only touched LSH blocks, yet the
clusters equal a full re-resolve."""

import datetime

import pandas as pd
import pytest


def _delta_page(url: str, base_html: bytes) -> pd.DataFrame:
    """A near-dup of an existing page (same html, one token appended in
    a paragraph) at a later timestamp — must join that page's entity."""
    html = base_html.replace(b"</footer>", b" extra</footer>")
    return pd.DataFrame([{
        "url": url,
        "warc_ts": datetime.datetime(2030, 1, 1),
        "html": html,
        "lang": "en",
    }])


def _partition(df: pd.DataFrame) -> set[frozenset]:
    return set(frozenset(g) for _, g in df.groupby("entity_id")["url"])


@pytest.fixture()
def pages_df(corpus, ray_session):
    import pyarrow.parquet as pq

    return pq.read_table(corpus + "/pages.parquet").to_pandas()


def test_incremental_matches_full(corpus, pages_df, tmp_path, ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.incremental import (
        resolve_incremental,
    )
    from sqs_entity_resolution_ray.pipelines.resolve import read_pages, resolve

    state = str(tmp_path / "state")
    base = resolve_incremental(corpus + "/pages.parquet", state)
    assert base.full_run
    full_pairs = base.n_pairs_scored
    base_clusters = base.clusters.to_pandas()

    # delta: one brand-new near-dup of an existing url
    src = pages_df.iloc[0]
    delta = _delta_page("https://delta.example/new-page", src["html"])
    inc = resolve_incremental(rd.from_pandas(delta), state)
    assert not inc.full_run
    inc_clusters = inc.clusters.to_pandas()

    # ground truth: full re-resolve over pages + delta
    all_pages = pd.concat([pages_df, delta], ignore_index=True)
    art = resolve(read_pages(rd.from_pandas(all_pages)))
    full_clusters = art.clusters.to_pandas()

    assert _partition(inc_clusters) == _partition(full_clusters)
    # entity ids are min-uid-derived — identical, not just isomorphic
    assert (inc_clusters.sort_values("url")["entity_id"].tolist()
            == full_clusters.sort_values("url")["entity_id"].tolist())

    # the whole point: scoring work proportional to touched blocks
    assert inc.n_pairs_scored < max(full_pairs // 10, 50), (
        inc.n_pairs_scored, full_pairs)
    # the new page joined the source page's entity
    ent = inc_clusters.set_index("url")["entity_id"]
    assert ent["https://delta.example/new-page"] == ent[src["url"]]
    # affected-entity diff names exactly the changed entity
    assert ent[src["url"]] in inc.affected


def test_incremental_redelivery_idempotent(corpus, pages_df, tmp_path,
                                           ray_session):
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.incremental import (
        resolve_incremental,
    )

    state = str(tmp_path / "state")
    base = resolve_incremental(corpus + "/pages.parquet", state)
    before = base.clusters.to_pandas()

    # redeliver an existing page verbatim (at-least-once): no work
    redelivery = pages_df.iloc[[3]][["url", "warc_ts", "html", "lang"]]
    inc = resolve_incremental(rd.from_pandas(redelivery), state)
    assert inc.n_pairs_scored == 0
    assert inc.affected == []
    after = inc.clusters.to_pandas()
    assert _partition(before) == _partition(after)


def test_incremental_replacement_rescopes(corpus, pages_df, tmp_path,
                                          ray_session):
    """Replacing a url's content with something unrelated must detach it
    from its old entity — stale edges drop."""
    import ray.data as rd

    from sqs_entity_resolution_ray.pipelines.incremental import (
        resolve_incremental,
    )
    from sqs_entity_resolution_ray.sources.corpus import _render_html

    state = str(tmp_path / "state")
    base = resolve_incremental(corpus + "/pages.parquet", state)
    before = base.clusters.to_pandas()
    sizes = before.groupby("entity_id").size()
    # pick a member of a multi-member entity
    multi_ent = sizes[sizes > 1].index[0]
    victim = before[before["entity_id"] == multi_ent]["url"].iloc[0]

    body = " ".join(f"replacement{i} totally different content" for i in range(40))
    repl = pd.DataFrame([{
        "url": victim,
        "warc_ts": datetime.datetime(2031, 1, 1),
        "html": _render_html("Entirely New Topic", "nav", [body], "foot"),
        "lang": "en",
    }])
    inc = resolve_incremental(rd.from_pandas(repl), state)
    after = inc.clusters.to_pandas()
    ent_after = after.set_index("url")["entity_id"]
    old_members = set(before[before["entity_id"] == multi_ent]["url"]) - {victim}
    # victim left its old entity; old peers stay together
    assert all(ent_after[m] != ent_after[victim] for m in old_members)
    assert len({ent_after[m] for m in old_members}) == 1
    assert multi_ent in set(inc.affected) | {ent_after[victim]} or inc.affected


def test_incremental_honors_shuffle_partitions(corpus, pages_df, tmp_path,
                                               ray_session, monkeypatch):
    """cfg.shuffle_partitions is the ONE knob for every shuffle in the
    incremental path (round-4 verdict #2): spy on Dataset.groupby during
    the incremental leg and assert every shuffle uses the knob's value."""
    import ray.data as rd

    from sqs_entity_resolution_ray.config import PipelineConfig
    from sqs_entity_resolution_ray.pipelines.incremental import (
        resolve_incremental,
    )

    cfg = PipelineConfig(shuffle_partitions=5)
    state = str(tmp_path / "state")
    resolve_incremental(rd.from_pandas(pages_df), state, cfg=cfg,
                        run_tag="t0")

    base = pages_df.iloc[0]
    delta = _delta_page("http://delta.example/p", base["html"])

    seen = []
    orig = rd.Dataset.groupby

    def spy(self, key, *a, **kw):
        seen.append(kw.get("num_partitions"))
        return orig(self, key, *a, **kw)

    monkeypatch.setattr(rd.Dataset, "groupby", spy)
    res = resolve_incremental(rd.from_pandas(delta), state, cfg=cfg,
                              run_tag="t1")
    assert not res.full_run and res.n_pairs_scored > 0
    assert seen, "no shuffles observed"
    assert all(p == 5 for p in seen), f"shuffles ignoring the knob: {seen}"
