"""Pipeline configuration.

The reference exposes its tuning surface as env vars
(``Q_URL``, ``SZ_CALL_TIMEOUT_SECONDS``, ``WAIT_SECONDS``,
``MAX_REDO_ATTEMPTS`` — reference ``middleware/consumer.py:26-29``,
``middleware/redoer.py:27-40``, ``middleware/exporter.py:24-46``) and its
matching rules live inside the Senzing config (not editable in-repo).
Here both collapse into two plain dataclasses: :class:`MatchConfig` is the
pluggable "rule" surface (shingling, LSH geometry, score weights,
threshold) and :class:`PipelineConfig` is the operational surface
(paths, batch sizes, actor-pool sizing, skew caps).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
import hashlib
import json


@dataclass(frozen=True)
class MatchConfig:
    """Matching-rule surface (analogue of the Senzing ERRULE config)."""

    # shingling
    shingle_k: int = 3              # tokens per shingle
    # per-doc bottom-k shingle cap (0 = unlimited): bounds sketch cost on
    # arbitrarily long pages; bottom-k is permutation-invariant so
    # near-dups keep near-identical subsets
    max_shingles: int = 1024
    # MinHash-LSH geometry: num_perm = bands * rows_per_band
    num_perm: int = 128
    lsh_bands: int = 32
    lsh_rows: int = 4
    # scoring weights (combined score in [0, 1])
    w_jaccard: float = 0.70         # estimated Jaccard from MinHash signatures
    w_simhash: float = 0.20         # 1 - hamming(simhash)/64
    w_length: float = 0.10          # min/max token-count ratio
    # decision threshold on the combined score (calibrated on the
    # labeled-pairs fixture: negative scores top out ≈0.26, positive
    # scores bottom out ≈0.60 — see tests/test_scoring.py)
    threshold: float = 0.45
    # short-document guard: below this many shingles, boilerplate (nav/
    # footer) dominates a page's shingle set and unrelated short pages
    # can cross the combined-score threshold on chrome alone — require
    # strong MinHash agreement instead
    short_doc_shingles: int = 48
    short_doc_min_jaccard: float = 0.55
    # short-field similarity booster: Jaro-Winkler on titles (north
    # rule's JW/Levenshtein signals; titles are short so the per-pair
    # cost is bounded). Soft booster, not a hard gate.
    w_title_jw: float = 0.05

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perm ({self.num_perm})"
            )

    def fingerprint(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


@dataclass(frozen=True)
class PipelineConfig:
    """Operational knobs (batching, skew handling, checkpointing)."""

    # batch sizes per stage (rows per map_batches call). Extraction is
    # ~5-7 ms/page of per-doc regex work: smaller batches → more tasks →
    # the task pool actually fills the cluster (measured 13.4s → 4.7s on
    # a 10k-page corpus at 32 CPUs with 256-row batches).
    extract_batch_size: int = 256
    signature_batch_size: int = 256
    scorer_batch_size: int = 4096
    # actor pool for the pair scorer (reference T1: one engine per worker
    # process — consumer.py:151-163); here: one scorer state per actor.
    # None = auto (cpus // 4, clamped to [1, 8]) so the pool never starves
    # the join/shuffle stages running concurrently.
    scorer_concurrency: int | None = None
    # skew handling: any LSH block larger than this is split into salted
    # sub-blocks of at most this size (bounded O(s^2) pair enumeration);
    # split counts are logged in per-partition metrics. The reference has
    # no app-level skew handling (hot entities serialize on Postgres row
    # locks); the north rule demands it explicitly.
    max_block_size: int = 64
    # hard cap on pairs emitted per (possibly salted) block
    max_pairs_per_block: int = 4096
    # connected-components iteration cap (hash-min label propagation
    # converges in O(diameter) rounds; near-dup components are shallow)
    max_cc_rounds: int = 12
    # number of partitions for shuffle-heavy stages (joins); None = auto
    # (sized to the cluster CPU count at use time — join aggregator
    # actors reserve resources, so overshooting deadlocks small clusters)
    shuffle_partitions: int | None = None
    # checkpoint root (None = no checkpointing)
    checkpoint_dir: str | None = None

    def fingerprint(self) -> str:
        payload = json.dumps(
            {k: v for k, v in asdict(self).items() if k != "checkpoint_dir"},
            sort_keys=True,
        ).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


DEFAULT_MATCH = MatchConfig()
DEFAULT_PIPELINE = PipelineConfig()


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    import os

    return max(1, os.cpu_count() or 8)


def effective_partitions(cfg: PipelineConfig) -> int:
    """Join/shuffle partition count: explicit, else ≈ cluster CPUs."""
    if cfg.shuffle_partitions is not None:
        return cfg.shuffle_partitions
    return max(2, _cluster_cpus())


def partitions_for(n_rows: int, cfg: PipelineConfig,
                   rows_per_partition: int = 200_000) -> int:
    """Join/shuffle partition count sized by DATA, capped by CPUs.

    Join aggregator actors cost ~0.5-1 s startup each; 32 partitions on
    a 16k-row join is pure overhead (measured: 29 s → 3 s). An explicit
    ``cfg.shuffle_partitions`` always wins (the multi-node escape hatch).
    """
    if cfg.shuffle_partitions is not None:
        return cfg.shuffle_partitions
    need = max(2, -(-int(n_rows) // rows_per_partition))
    return min(effective_partitions(cfg), need)


def bucket_partitions(cfg: PipelineConfig | None, default: int = 64) -> int:
    """Partition count for bucketed shuffles (LSH bands, simhash chunks,
    hyperplane buckets, url upsert): ``cfg.shuffle_partitions`` always
    wins — ONE knob controls every bucketed shuffle — else the module
    default (sized for the single-node benchmark; raise toward 256+ at
    ~10^9+ bucket rows so each partition stays ≤ a few hundred MB)."""
    if cfg is not None and cfg.shuffle_partitions is not None:
        return cfg.shuffle_partitions
    return default


def effective_concurrency(cfg: PipelineConfig) -> int:
    """Actor-pool size for stateful stages: explicit, else cpus//4∈[1,8]."""
    if cfg.scorer_concurrency is not None:
        return cfg.scorer_concurrency
    return min(8, max(1, _cluster_cpus() // 4))
