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


def broadcast_columns(ds, cols) -> pa.Table | None:
    """Collect ``cols`` of a (small) Dataset to the driver as ONE Arrow
    table, pulling blocks straight from the object store — the fast
    path behind every broadcast-side prep.

    Handles ray 2.49 quirks: ``to_arrow_refs`` returns pandas-format
    blocks unconverted (e.g. downstream of a pandas groupby partial),
    and EMPTY blocks carry an empty schema; unioned inputs (incremental:
    stored ∪ delta profiles) can disagree on field order / null-typing
    across blocks. Returns None when every block is empty (callers
    supply their own typed empty)."""
    import ray

    raw = ray.get(ds.select_columns(list(cols)).to_arrow_refs())
    nonempty = [
        (t if isinstance(t, pa.Table)
         else pa.Table.from_pandas(t, preserve_index=False)).select(
            list(cols))
        for t in raw if len(t)
    ]
    if not nonempty:
        return None
    # unify across blocks: a pandas-converted block with an all-null
    # object column carries a null-typed field — unify_schemas promotes
    # it to the typed field from sibling blocks (casting every block to
    # the FIRST block's schema would raise on that shape)
    schema = pa.unify_schemas([t.schema for t in nonempty])
    return pa.concat_tables([t.cast(schema) for t in nonempty])


def _sig_matrix(col, n: int) -> np.ndarray:
    """Fixed-width binary column → ``(n, num_perm)`` little-endian u4
    matrix, zero-copy: reads the Arrow offsets + data buffers directly
    instead of materializing ``n`` Python bytes objects and re-joining
    them (driver-side serial cost in the broadcast prep; per-batch cost
    in the join-plan scorer). Falls back to the bytes path on any
    non-standard layout (ragged widths, misaligned slice, null blobs)."""
    if n == 0:
        return np.empty((0, 0), dtype="<u4")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset : arr.offset + n + 1]
        width = int(offs[1] - offs[0])
        if width <= 0 or width % 4 or not (np.diff(offs) == width).all():
            raise ValueError("ragged sig blobs")
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        start = int(offs[0])
        flat = np.ascontiguousarray(data[start : start + n * width]).view("<u4")
    except (ValueError, AttributeError, TypeError):
        flat = np.frombuffer(b"".join(arr.to_pylist()), dtype="<u4")
    return flat.reshape(n, flat.size // n)


def _broadcast_profile_arrays(profiles):
    """profiles → ``ray.put`` ref of uid-sorted lookup arrays.

    VECTORIZED driver prep: pulls Arrow blocks straight from the object
    store (``to_arrow_refs`` — no pandas conversion) and reshapes the
    fixed-width signature column into an (n, num_perm) u4 matrix with
    ONE ``frombuffer``. The previous ``to_pandas`` + per-row
    ``np.frombuffer`` Python loop was a ~25 s DRIVER-SIDE SERIAL stall
    at 130k docs — the single largest non-scalable share in the
    headline (BASELINE.md round-4 profile), invisible to per-stage
    stats because it ran at graph-build time."""
    import ray

    tbl = broadcast_columns(profiles, _PROFILE_COLS)
    if tbl is None:
        tbl = pa.table(
            {"uid": pa.array([], pa.int64()),
             "sig": pa.array([], pa.binary()),
             "simhash": pa.array([], pa.uint64()),
             "n_tokens": pa.array([], pa.int32()),
             "title": pa.array([], pa.string())})
    uids_raw = tbl.column("uid").to_numpy()
    order = np.argsort(uids_raw)
    uids = uids_raw[order]
    n = tbl.num_rows
    sig_arr = _sig_matrix(tbl.column("sig"), n)[order]
    simhash = tbl.column("simhash").to_numpy().astype(np.uint64)[order]
    n_tokens = tbl.column("n_tokens").to_numpy().astype(np.int32)[order]
    titles = np.asarray(tbl.column("title").to_pylist(), dtype=object)[order]
    return ray.put((uids, np.ascontiguousarray(sig_arr), simhash,
                    n_tokens, titles))


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


_EMPTY_SCORED = pa.table(
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


def _score_arrays(mc: MatchConfig, uid_a, uid_b, block_size,
                  sig_a: np.ndarray, sig_b: np.ndarray,
                  sh_a: np.ndarray, sh_b: np.ndarray,
                  na_raw: np.ndarray, nb_raw: np.ndarray,
                  titles_a, titles_b) -> pa.Table:
    """Shared vectorized scoring math (both attach plans end here).

    ``titles_a``/``titles_b`` are thunks returning python lists — title
    signals are only materialized when their weight is nonzero or a
    borderline pair needs the Levenshtein tiebreak."""
    ej = (sig_a == sig_b).mean(axis=1)
    hd = hamming64(sh_a, sh_b).astype(np.int32)
    na = na_raw.astype(np.float64)
    nb = nb_raw.astype(np.float64)
    len_ratio = np.minimum(na, nb) / np.maximum(np.maximum(na, nb), 1.0)
    score = (
        mc.w_jaccard * ej
        + mc.w_simhash * (1.0 - hd / 64.0)
        + mc.w_length * len_ratio
    )
    n = len(ej)
    title_jw = np.zeros(n)
    ta = tb = None
    if mc.w_title_jw > 0:
        ta, tb = titles_a(), titles_b()
        title_jw = batch_jaro_winkler(ta, tb)
        score = score + mc.w_title_jw * title_jw
    # bounded Levenshtein on titles for BORDERLINE pairs only (the
    # expensive O(len²) signal is computed where it can matter)
    title_lev = np.full(n, -1.0)
    gray = np.flatnonzero(np.abs(score - mc.threshold) < 0.15)
    if len(gray):
        if ta is None:
            ta, tb = titles_a(), titles_b()
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
            "uid_a": uid_a,
            "uid_b": uid_b,
            "est_jaccard": pa.array(ej, pa.float64()),
            "simhash_hd": pa.array(hd, pa.int32()),
            "len_ratio": pa.array(len_ratio, pa.float64()),
            "title_jw": pa.array(title_jw, pa.float64()),
            "title_lev": pa.array(title_lev, pa.float64()),
            "score": pa.array(score, pa.float64()),
            "is_match": pa.array(is_match, pa.bool_()),
            "block_size": block_size,
        }
    )


class BroadcastPairScorer:
    """Fused broadcast-attach + scorer (small/medium-corpus plan).

    The uid-sorted profile arrays ship ONCE via ``ray.put`` and are
    pinned per actor in ``__init__`` (one object-store get per actor,
    not per batch); each batch of narrow (uid_a, uid_b, block_size)
    pairs is scored by two vectorized ``searchsorted`` gathers straight
    into the signature matrix — no attach stage, no per-batch
    bytes→numpy round-trip, no shuffle."""

    def __init__(self, ref, match_cfg: MatchConfig | None = None):
        import ray

        self.mc = match_cfg or MatchConfig()
        (self.uids, self.sig, self.simhash, self.n_tokens,
         self.titles) = ray.get(ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_SCORED
        ua = batch.column("uid_a").to_numpy(zero_copy_only=False)
        ub = batch.column("uid_b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(self.uids, ua)
        ib = np.searchsorted(self.uids, ub)
        return _score_arrays(
            self.mc,
            batch.column("uid_a"), batch.column("uid_b"),
            batch.column("block_size"),
            self.sig[ia], self.sig[ib],
            self.simhash[ia], self.simhash[ib],
            self.n_tokens[ia], self.n_tokens[ib],
            lambda: list(self.titles[ia]),
            lambda: list(self.titles[ib]),
        )


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
            return _EMPTY_SCORED
        sig_a = _sig_matrix(batch.column("sig_a"), n)
        sig_b = _sig_matrix(batch.column("sig_b"), n)
        return _score_arrays(
            mc,
            batch.column("uid_a"), batch.column("uid_b"),
            batch.column("block_size"),
            sig_a, sig_b,
            batch.column("simhash_a").to_numpy(zero_copy_only=False),
            batch.column("simhash_b").to_numpy(zero_copy_only=False),
            batch.column("n_tokens_a").to_numpy(zero_copy_only=False),
            batch.column("n_tokens_b").to_numpy(zero_copy_only=False),
            lambda: batch.column("title_a").to_pylist(),
            lambda: batch.column("title_b").to_pylist(),
        )


def score_pairs(pairs, profiles, match_cfg: MatchConfig, cfg: PipelineConfig,
                n_pairs: int | None = None):
    """pairs ⋈ profiles → scored pair Dataset (actor pool)."""
    try:
        n_profiles = profiles.count()
    except Exception:
        n_profiles = None
    if n_profiles is not None and n_profiles <= BROADCAST_PROFILES_MAX:
        ref = _broadcast_profile_arrays(profiles)
        return pairs.map_batches(
            BroadcastPairScorer,
            fn_constructor_kwargs={"ref": ref, "match_cfg": match_cfg},
            batch_format="pyarrow",
            batch_size=cfg.scorer_batch_size,
            concurrency=effective_concurrency(cfg),
        )
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
