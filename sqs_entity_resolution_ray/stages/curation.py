"""Training-data curation operators: sampling/splits, redaction, global
token stats, quantile gating, JSON field extraction, decontamination.

Beyond the reference surface (build brief: operations a large-scale
training-data pipeline needs). All operators are streaming
``map_batches`` stages over Arrow/pandas batches; the only driver-side
materializations are provably small (a scalar threshold, a benchmark
shingle-hash set, a vocabulary-sized count table).

Scale notes per operator are inline; the shared principles:
- sampling/split/redact/json-extract are embarrassingly parallel (no
  shuffle at all);
- token_topk shuffles only (token, count) partial rows — pre-aggregated
  per batch, so shuffle volume is bounded by vocabulary x partitions,
  not corpus size;
- decontaminate broadcasts the benchmark's shingle hashes once
  (``ray.put`` a sorted uint64 array, searchsorted membership per
  batch) — benchmark sets are small by definition; a shuffle semi-join
  on shingle hash is the fallback beyond the broadcast cap.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..config import PipelineConfig, bucket_partitions
from ..functions.hashing import hash_str_array, hash_u64_pairs

# ASCII whitespace class, NOT \S+: Python re is Unicode-aware while the
# DuckDB oracles split on RE2 \s+ (ASCII by default), so \S+ here would
# tokenize Unicode whitespace (NBSP etc.) differently and break oracle
# parity on non-ASCII text. RE2's \s is exactly [\t\n\f\r ] — it does
# NOT include \v (verified: DuckDB keeps 'a\vb' one token), so \v must
# be a token byte here too for byte-identical engine parity (ADVICE r3).
_WS_RE = re.compile(r"[^ \t\n\r\f]+")

# ---------------------------------------------------------------------------
# deterministic splits + sampling


def split_assign(
    ds: rd.Dataset,
    key_col: str,
    mod: int = 10,
    bounds: dict[str, int] | None = None,
) -> rd.Dataset:
    """Deterministic train/val/test assignment from an integer key.

    ``bounds``: split name → exclusive upper bound on ``key % mod``,
    checked in insertion order (default 0-7 train, 8 val, 9 test).
    Pure per-row arithmetic — no shuffle, reproducible across runs and
    cluster sizes, and expressible as a SQL CASE for oracle checking.
    """
    bounds = bounds or {"train": 8, "val": 9, "test": 10}
    names = list(bounds)
    cuts = np.array([bounds[s] for s in names], dtype=np.int64)

    def f(t: pa.Table) -> pa.Table:
        r = t.column(key_col).to_numpy(zero_copy_only=False) % mod
        idx = np.searchsorted(cuts, r, side="right")
        split = np.array(names, dtype=object)[np.minimum(idx, len(names) - 1)]
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    strat_col: str,
    key_col: str,
    rates: dict[str, int],
    mod: int = 100,
    default_rate: int = 0,
) -> rd.Dataset:
    """Per-stratum systematic sampling: keep rows where
    ``key % mod < rates[stratum]`` (rate = percentage when mod=100).

    Deterministic (same rows survive on any cluster size / block split),
    no shuffle, no RNG. For non-integer keys use :func:`hash_sample`.
    """
    items = sorted(rates.items())
    strat_vals = pa.array([k for k, _ in items], pa.string())
    strat_rates = np.array([v for _, v in items], dtype=np.int64)

    def f(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(strat_col), strat_vals).to_numpy(
            zero_copy_only=False
        )
        rate = np.where(
            np.isnan(idx.astype(np.float64)),
            default_rate,
            strat_rates[np.nan_to_num(idx, nan=0).astype(np.int64)],
        )
        r = t.column(key_col).to_numpy(zero_copy_only=False) % mod
        return t.filter(pa.array(r < rate))

    return ds.map_batches(f, batch_format="pyarrow")


def hash_sample(
    ds: rd.Dataset, key_col: str, rate_pct: float, salt: str = "sample"
) -> rd.Dataset:
    """Deterministic ~rate_pct% sample keyed on the SipHash of any
    column (string or numeric) — the scale path when no dense integer
    key exists. Same guarantees as :func:`stratified_sample`; the hash
    is uniform so the realized rate concentrates tightly around
    ``rate_pct`` for large inputs."""
    if rate_pct >= 100.0:  # keep-everything: 2**64 overflows uint64
        return ds
    threshold = np.uint64(int(rate_pct / 100.0 * 2**64))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        h = hash_str_array(batch[key_col].astype(str).tolist(), salt=salt)
        return batch[h < threshold]

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# redaction


def regex_redact(
    ds: rd.Dataset,
    pattern: str,
    replacement: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Redact every match of an RE2 pattern (PII scrubbing shape:
    emails, phone numbers, ids). Zero-copy Arrow in, vectorized
    ``replace_substring_regex`` kernel (RE2 — the same engine DuckDB
    uses, so oracle SQL ``regexp_replace(..., 'g')`` is byte-identical).
    No shuffle; the compiled RE2 program is cached inside the kernel."""

    def f(t: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(
            t.column(text_col), pattern=pattern, replacement=replacement
        )
        return pa.table({id_col: t.column(id_col), "text_red": red})

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# global token frequencies


def token_topk(
    ds: rd.Dataset, n: int = 20, text_col: str = "text"
) -> rd.Dataset:
    """Global top-n whitespace tokens by count (corpus vocabulary
    statistics). Each batch emits its local (token, count) partials —
    the shuffle carries at most vocabulary x partitions narrow rows,
    never the corpus — then one groupby-sum and a vocabulary-sized
    sort. Ties at the boundary break by token ascending (matches SQL
    ``ORDER BY n DESC, token``)."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pa.Table:
        s = batch[text_col].fillna("").str.findall(_WS_RE).explode().dropna()
        vc = s.value_counts()
        return pa.table({
            "token": pa.array(vc.index.astype(str), pa.string()),
            "n": pa.array(vc.to_numpy(dtype=np.int64), pa.int64()),
        })

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.sort(["n", "token"], descending=[True, False]).limit(n)


# ---------------------------------------------------------------------------
# global-quantile gating


def global_quantile_filter(
    ds: rd.Dataset,
    col: str,
    q: float = 0.5,
    min_quantile: bool = True,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Keep rows where ``col`` >= (or <=) the EXACT global q-quantile
    (linear interpolation — SQL ``quantile_cont``).

    Two passes: (1) only the numeric column crosses the wire to compute
    the scalar threshold, (2) a stateless vectorized filter. The exact
    quantile gathers the full column into one group — fine while the
    column fits a partition (int64 x rows); beyond that the mergeable
    digest sketch (stages/sketch.quantile_digest) is the approximate
    scale path, traded for exactness.
    """
    from .agg import group_quantiles

    narrow = ds.map_batches(
        lambda t: t.select([col]).append_column(
            "_g", pa.array(np.zeros(len(t), dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    thr_df = group_quantiles(
        narrow, ["_g"], col, {"thr": q}, round_to=None,
        num_partitions=num_partitions,
    ).to_pandas()
    thr = float(thr_df["thr"].iloc[0]) if len(thr_df) else float("inf")

    op = pc.greater_equal if min_quantile else pc.less_equal

    def f(t: pa.Table) -> pa.Table:
        return t.filter(op(t.column(col), thr))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# JSON field extraction


def parse_json_field(
    ds: rd.Dataset, json_col: str, field: str, out_col: str | None = None
) -> rd.Dataset:
    """Extract an integer field from a JSON string column.

    Fast path: one vectorized RE2 ``extract_regex`` over the whole
    batch (scalar integer fields — the overwhelmingly common case for
    event properties). Rows the regex misses — or where the captured
    run is the integer prefix of a float (``"k": 3.5``) — fall back to
    ``json.loads`` individually, so numeric semantics stay full JSON
    while the hot path stays vectorized. Known limit (documented, not
    worth a JSON parse per row): the regex matches the FIRST occurrence
    of the field name anywhere in the string, so a flat object layout
    is assumed — a same-named key inside a NESTED object shadows the
    top-level one (``{"a":{"k":1},"k":2}`` extracts 1)."""
    out_col = out_col or field
    # RE2 (no lookahead): capture one optional float-continuation char
    # after the digits; a non-empty tail marks the row for the fallback
    pattern = rf'"{re.escape(field)}"\s*:\s*(?P<v>-?\d+)(?P<tail>[.eE]?)'

    def f(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t.column(json_col), pattern)
        vals = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        tail = pc.struct_field(ext, "tail")
        is_float = pc.fill_null(pc.not_equal(tail, ""), False)
        if pc.any(is_float).as_py():
            vals = pc.if_else(is_float, pa.nulls(len(vals), pa.int64()), vals)
        if vals.null_count:
            np_vals = vals.to_numpy(zero_copy_only=False)
            mask = np.flatnonzero(pc.is_null(vals).to_numpy(
                zero_copy_only=False))
            raw = t.column(json_col).to_pylist()
            for i in mask:
                try:
                    np_vals[i] = int(json.loads(raw[i])[field])
                except (TypeError, ValueError, KeyError):
                    pass
            vals = pa.array(np_vals, pa.int64(), from_pandas=True)
        return t.append_column(out_col, vals)

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination


def _raw_shingle_hashes(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every k-token shingle of raw whitespace-split texts.

    Tokens are raw ``\\S+`` runs (NO casefolding/normalization — exact
    parity with SQL ``regexp_split_to_array(trim(text), '\\s+')``), and
    docs with fewer than k tokens emit nothing. Equal token sequences
    map to equal hashes (order-sensitive splitmix rolling combine of
    per-token SipHashes), so hash-set membership == string-shingle
    membership up to 2^-64 collisions.

    Returns (flat_hashes uint64[N], doc_index int64[N]).
    """
    toks_per_doc = [_WS_RE.findall(t or "") for t in texts]
    counts = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
    flat_tokens = [tok for toks in toks_per_doc for tok in toks]
    if not flat_tokens:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    th = hash_str_array(flat_tokens)

    total = len(th)
    if total < k:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    m = total - k + 1
    acc = th[:m].copy()
    for j in range(1, k):
        acc = hash_u64_pairs(acc, th[j : m + j])
    pos_doc = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    valid = pos_doc[:m] == pos_doc[k - 1 :]
    return acc[valid], pos_doc[:m][valid]


# broadcast cap for the benchmark shingle-hash set: above this, a
# shuffle semi-join on shingle hash replaces the broadcast.
BENCH_BROADCAST_CAP = 32_000_000  # uint64 hashes ≈ 256 MB


def decontaminate(
    corpus: rd.Dataset,
    benchmark: rd.Dataset,
    n_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_cap: int = BENCH_BROADCAST_CAP,
    num_partitions: int | None = None,
    cfg: PipelineConfig | None = None,
) -> rd.Dataset:
    """Find corpus docs sharing any exact n-token shingle with a
    benchmark set (training-data decontamination against eval sets).
    Returns the distinct contaminated ``id_col``, sorted.

    Broadcast path (the common case — eval suites are MBs, not TBs):
    the benchmark side is shingle-hashed in parallel, deduped, and
    broadcast ONCE as a sorted uint64 array; each corpus batch shingles
    itself and does a vectorized searchsorted membership test. Corpus
    text never crosses a shuffle.

    Shuffle path (benchmark shingle set above ``broadcast_cap``): both
    sides emit narrow (shingle-hash, doc-id) rows — per-batch deduped,
    so shuffle volume is bounded by distinct shingles, never text —
    hash-bucketed on the shingle hash, and a per-partition vectorized
    searchsorted semi-join finds corpus hits. Same result, no driver
    materialization of the benchmark set.
    """
    from .agg import hash_aggregate

    if num_partitions is None:  # the one-knob invariant (config.py:146)
        num_partitions = bucket_partitions(cfg, 64)

    def bench_hashes(batch: pd.DataFrame) -> pa.Table:
        h, _ = _raw_shingle_hashes(batch[text_col].tolist(), n_tokens)
        return pa.table({"sh": pa.array(np.unique(h), pa.uint64())})

    parts = benchmark.map_batches(
        bench_hashes, batch_format="pandas").materialize()
    # per-batch-distinct row count upper-bounds the true set size — a
    # cheap metadata read, no driver pull
    if parts.count() > broadcast_cap:
        return _decontaminate_shuffle(corpus, parts, n_tokens, text_col,
                                      id_col, num_partitions, cfg)
    bench = np.unique(parts.to_pandas()["sh"].to_numpy(dtype=np.uint64))
    bench_ref = ray.put(np.sort(bench))

    def contaminated(batch: pd.DataFrame) -> pa.Table:
        b = ray.get(bench_ref)
        h, doc_idx = _raw_shingle_hashes(batch[text_col].tolist(), n_tokens)
        ids = batch[id_col].to_numpy()
        if len(h) == 0 or len(b) == 0:
            return pa.table({id_col: pa.array([], pa.from_numpy_dtype(
                ids.dtype))})
        pos = np.searchsorted(b, h)
        pos[pos == len(b)] = len(b) - 1
        member = b[pos] == h
        hit = np.bincount(doc_idx[member], minlength=len(batch)) > 0
        return pa.table({id_col: pa.array(ids[hit])})

    hits = corpus.map_batches(contaminated, batch_format="pandas")
    return _distinct_sorted(hits, id_col, hash_aggregate, cfg)


def _distinct_sorted(hits: rd.Dataset, id_col: str, hash_aggregate,
                     cfg: PipelineConfig | None = None):
    """Distinct ids, sorted — two-phase combiner, no per-id Python call."""
    return hash_aggregate(
        hits, [id_col], {"_n": (id_col, "count")}, cfg=cfg
    ).select_columns([id_col]).sort(id_col)


def _decontaminate_shuffle(
    corpus: rd.Dataset,
    bench_parts: rd.Dataset,
    n_tokens: int,
    text_col: str,
    id_col: str,
    num_partitions: int,
    cfg: PipelineConfig | None = None,
) -> rd.Dataset:
    """Shingle-hash-bucketed semi-join (the above-broadcast-cap path)."""
    from .agg import hash_aggregate

    sch = corpus.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    if not isinstance(id_type, pa.DataType):  # pandas-block schema
        id_type = (pa.string() if id_type == np.dtype("O")
                   else pa.from_numpy_dtype(id_type))

    def part_col(sh: np.ndarray) -> pa.Array:
        return pa.array((sh % np.uint64(num_partitions)).astype(np.int64),
                        pa.int64())

    def bench_rows(t: pa.Table) -> pa.Table:
        sh = t.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "sh": pa.array(sh, pa.uint64()),
            "doc": pa.nulls(len(sh), id_type),
            "side": pa.array(np.zeros(len(sh), dtype=np.int8), pa.int8()),
            "part": part_col(sh),
        })

    def corpus_rows(batch: pd.DataFrame) -> pa.Table:
        h, doc_idx = _raw_shingle_hashes(batch[text_col].tolist(), n_tokens)
        ids = batch[id_col].to_numpy()
        # per-batch (sh, doc) dedup bounds the shuffle at distinct
        # shingle-doc incidences, not raw shingle count
        if len(h):
            key = np.stack([h, doc_idx.astype(np.uint64)], axis=1)
            _, keep = np.unique(key, axis=0, return_index=True)
            h, doc_idx = h[keep], doc_idx[keep]
        return pa.table({
            "sh": pa.array(h, pa.uint64()),
            "doc": pa.array(ids[doc_idx], id_type),
            "side": pa.array(np.ones(len(h), dtype=np.int8), pa.int8()),
            "part": part_col(h),
        })

    tagged = bench_parts.map_batches(bench_rows, batch_format="pyarrow").union(
        corpus.map_batches(corpus_rows, batch_format="pandas")
    )

    def part_hits(group: pd.DataFrame) -> pd.DataFrame:
        b = np.unique(group.loc[group["side"] == 0, "sh"].to_numpy(
            dtype=np.uint64))
        cor = group[group["side"] == 1]
        if len(b) == 0 or len(cor) == 0:
            return cor.iloc[0:0][["doc"]].rename(columns={"doc": id_col})
        h = cor["sh"].to_numpy(dtype=np.uint64)
        pos = np.minimum(np.searchsorted(b, h), len(b) - 1)
        out = cor.loc[b[pos] == h, ["doc"]].drop_duplicates()
        return out.rename(columns={"doc": id_col})

    hits = tagged.groupby("part", num_partitions=num_partitions).map_groups(
        part_hits, batch_format="pandas")
    return _distinct_sorted(hits, id_col, hash_aggregate, cfg)
