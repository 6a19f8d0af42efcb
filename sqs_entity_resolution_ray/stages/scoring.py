"""Pairwise scoring: profile attach + stateful actor-pool scorer.

Analogue of the reference's per-record Senzing scoring call
(``middleware/consumer.py:188`` — ``add_record`` → match decision inside
the engine). The engine-per-process pattern (``consumer.py:151-163``:
one ``SzAbstractFactoryCore`` per worker, created at startup) maps to a
Ray actor pool: scorer state is built once per actor in ``__init__``,
batches of pairs are scored vectorized in ``__call__``.

All keys are the 63-bit integer ``uid`` (profiles carry the url↔uid
mapping). Two attach plans:
- broadcast (≤2M docs): the narrow profile columns ship once via
  ``ray.put`` as numpy arrays; per-batch lookups are vectorized
  ``np.searchsorted`` gathers — no shuffle at all;
- hash join (the 10^8+-doc plan): two ``Dataset.join``s on uid with
  data-sized partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import (
    MatchConfig,
    PipelineConfig,
    effective_concurrency,
    effective_partitions,
)
from ..functions.simhash import hamming64
from ..functions.strsim import batch_jaro_winkler, batch_levenshtein_ratio

BROADCAST_PROFILES_MAX = 2_000_000

_PROFILE_COLS = ["uid", "sig", "simhash", "n_tokens", "title"]


def attach_profiles_broadcast(pairs, profiles):
    """Broadcast attach: profile columns as sorted numpy arrays, looked
    up per batch with searchsorted — vectorized, shuffle-free."""
    import ray

    prof = profiles.select_columns(_PROFILE_COLS).to_pandas()
    order = np.argsort(prof["uid"].to_numpy())
    uids = prof["uid"].to_numpy()[order]
    sig_arr = np.asarray(
        [np.frombuffer(s, dtype="<u4") for s in prof["sig"]], dtype=np.uint32
    )[order]
    simhash = prof["simhash"].to_numpy()[order].astype(np.uint64)
    n_tokens = prof["n_tokens"].to_numpy()[order].astype(np.int32)
    titles = np.asarray(prof["title"].to_numpy(), dtype=object)[order]
    ref = ray.put((uids, sig_arr, simhash, n_tokens, titles))

    def attach(batch: pa.Table) -> pa.Table:
        uids_, sig_, sh_, nt_, ti_ = ray.get(ref)
        ua = batch.column("uid_a").to_numpy(zero_copy_only=False)
        ub = batch.column("uid_b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(uids_, ua)
        ib = np.searchsorted(uids_, ub)
        return pa.table(
            {
                "uid_a": batch.column("uid_a"),
                "uid_b": batch.column("uid_b"),
                "block_size": batch.column("block_size"),
                "sig_a": pa.array([row.tobytes() for row in sig_[ia]],
                                  pa.binary()),
                "simhash_a": pa.array(sh_[ia], pa.uint64()),
                "n_tokens_a": pa.array(nt_[ia], pa.int32()),
                "title_a": pa.array(list(ti_[ia]), pa.string()),
                "sig_b": pa.array([row.tobytes() for row in sig_[ib]],
                                  pa.binary()),
                "simhash_b": pa.array(sh_[ib], pa.uint64()),
                "n_tokens_b": pa.array(nt_[ib], pa.int32()),
                "title_b": pa.array(list(ti_[ib]), pa.string()),
            }
        )

    return pairs.map_batches(attach, batch_format="pyarrow")


def attach_profiles(pairs, profiles, cfg: PipelineConfig,
                    n_pairs: int | None = None):
    """Hash-join attach (large-scale plan): two Dataset.joins on uid."""
    side = profiles.select_columns(_PROFILE_COLS)
    a = side.rename_columns(
        {"uid": "uid_a", "sig": "sig_a", "simhash": "simhash_a",
         "n_tokens": "n_tokens_a", "title": "title_a"}
    )
    b = side.rename_columns(
        {"uid": "uid_b", "sig": "sig_b", "simhash": "simhash_b",
         "n_tokens": "n_tokens_b", "title": "title_b"}
    )
    try:  # profiles is materialized by the pipeline → count is cheap.
        # Partition count must be driven by the BIGGER side: the join
        # output carries two signature blobs per pair (~1 KB/row), so
        # undersizing on the pair count serializes gigabytes through a
        # couple of aggregator actors.
        from ..config import partitions_for

        rows = max(profiles.count(), n_pairs or 0)
        n_part = partitions_for(rows, cfg, rows_per_partition=100_000)
    except Exception:
        n_part = effective_partitions(cfg)
    joined = pairs.join(a, join_type="inner", num_partitions=n_part, on=("uid_a",))
    joined = joined.join(b, join_type="inner", num_partitions=n_part, on=("uid_b",))
    return joined


class PairScorer:
    """Actor-pool batch scorer over joined candidate pairs.

    score = w_jaccard · est_jaccard(sig_a, sig_b)
          + w_simhash · (1 − hamming(simhash_a, simhash_b)/64)
          + w_length  · min(n_tokens)/max(n_tokens)
    (+ optional w_title_jw · JaroWinkler(title_a, title_b))

    est_jaccard is an unbiased MinHash estimate; with num_perm=128 its
    σ ≈ 0.044 at J=0.5, and the corpus separation (negatives ≤0.08,
    positives ≥0.45) leaves >8σ margin to the threshold.
    """

    def __init__(self, match_cfg: MatchConfig | None = None):
        self.mc = match_cfg or MatchConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        mc = self.mc
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "uid_a": pa.array([], pa.int64()),
                    "uid_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                    "simhash_hd": pa.array([], pa.int32()),
                    "len_ratio": pa.array([], pa.float64()),
                    "title_jw": pa.array([], pa.float64()),
                    "title_lev": pa.array([], pa.float64()),
                    "score": pa.array([], pa.float64()),
                    "is_match": pa.array([], pa.bool_()),
                    "block_size": pa.array([], pa.int32()),
                }
            )
        p = mc.num_perm
        sig_a = np.frombuffer(
            b"".join(batch.column("sig_a").to_pylist()), dtype="<u4"
        ).reshape(n, p)
        sig_b = np.frombuffer(
            b"".join(batch.column("sig_b").to_pylist()), dtype="<u4"
        ).reshape(n, p)
        ej = (sig_a == sig_b).mean(axis=1)
        hd = hamming64(
            batch.column("simhash_a").to_numpy(zero_copy_only=False),
            batch.column("simhash_b").to_numpy(zero_copy_only=False),
        ).astype(np.int32)
        na = batch.column("n_tokens_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch.column("n_tokens_b").to_numpy(zero_copy_only=False).astype(np.float64)
        len_ratio = np.minimum(na, nb) / np.maximum(np.maximum(na, nb), 1.0)
        score = (
            mc.w_jaccard * ej
            + mc.w_simhash * (1.0 - hd / 64.0)
            + mc.w_length * len_ratio
        )
        title_jw = np.zeros(n)
        if mc.w_title_jw > 0:
            title_jw = batch_jaro_winkler(
                batch.column("title_a").to_pylist(),
                batch.column("title_b").to_pylist(),
            )
            score = score + mc.w_title_jw * title_jw
        # bounded Levenshtein on titles for BORDERLINE pairs only (the
        # expensive O(len²) signal is computed where it can matter)
        title_lev = np.full(n, -1.0)
        gray = np.flatnonzero(np.abs(score - mc.threshold) < 0.15)
        if len(gray):
            ta = batch.column("title_a").to_pylist()
            tb = batch.column("title_b").to_pylist()
            title_lev[gray] = batch_levenshtein_ratio(
                [ta[i] for i in gray], [tb[i] for i in gray]
            )
        is_match = score >= mc.threshold
        # short-doc guard (MatchConfig.short_doc_shingles): chrome-heavy
        # short pages must agree strongly on content shingles
        short = np.minimum(na, nb) < mc.short_doc_shingles
        is_match &= ~short | (ej >= mc.short_doc_min_jaccard)
        return pa.table(
            {
                "uid_a": batch.column("uid_a"),
                "uid_b": batch.column("uid_b"),
                "est_jaccard": pa.array(ej, pa.float64()),
                "simhash_hd": pa.array(hd, pa.int32()),
                "len_ratio": pa.array(len_ratio, pa.float64()),
                "title_jw": pa.array(title_jw, pa.float64()),
                "title_lev": pa.array(title_lev, pa.float64()),
                "score": pa.array(score, pa.float64()),
                "is_match": pa.array(is_match, pa.bool_()),
                "block_size": batch.column("block_size"),
            }
        )


def score_pairs(pairs, profiles, match_cfg: MatchConfig, cfg: PipelineConfig,
                n_pairs: int | None = None):
    """pairs ⋈ profiles → scored pair Dataset (actor pool)."""
    try:
        n_profiles = profiles.count()
    except Exception:
        n_profiles = None
    if n_profiles is not None and n_profiles <= BROADCAST_PROFILES_MAX:
        joined = attach_profiles_broadcast(pairs, profiles)
    else:
        joined = attach_profiles(pairs, profiles, cfg, n_pairs=n_pairs)
    return joined.map_batches(
        PairScorer,
        fn_constructor_kwargs={"match_cfg": match_cfg},
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        concurrency=effective_concurrency(cfg),
    )


def matched_edges(scored):
    """Filter to matches and project the edge list. Evidence columns
    (est_jaccard, simhash_hd, title_jw) ride along so the report can
    assemble per-record MATCH_KEYs from the signals that actually
    matched (reference flow-output.jsonl:1 varies MATCH_KEY per
    record); CC selects just (uid_a, uid_b) downstream."""
    return scored.map_batches(
        lambda t: t.filter(t.column("is_match")).select(
            ["uid_a", "uid_b", "score", "est_jaccard", "simhash_hd",
             "title_jw"]
        ),
        batch_format="pyarrow",
    )
