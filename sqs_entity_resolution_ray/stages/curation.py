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

from ..functions.hashing import hash_str_array, hash_u64_pairs

_WS_RE = re.compile(r"\S+")

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
    batch (scalar numeric fields — the overwhelmingly common case for
    event properties). Rows the regex misses (nested/escaped layouts)
    fall back to ``json.loads`` individually, so semantics stay full
    JSON while the hot path stays vectorized."""
    out_col = out_col or field
    pattern = rf'"{re.escape(field)}"\s*:\s*(?P<v>-?\d+)'

    def f(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t.column(json_col), pattern)
        vals = pc.cast(pc.struct_field(ext, "v"), pa.int64())
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
) -> rd.Dataset:
    """Find corpus docs sharing any exact n-token shingle with a
    benchmark set (training-data decontamination against eval sets).

    The benchmark side (small by definition — eval suites are MBs, not
    TBs) is shingle-hashed in parallel, deduped, and broadcast ONCE as
    a sorted uint64 array; each corpus batch then shingles itself and
    does a vectorized searchsorted membership test. Corpus text never
    crosses a shuffle. Returns the distinct contaminated ``id_col``.
    """

    def bench_hashes(batch: pd.DataFrame) -> pa.Table:
        h, _ = _raw_shingle_hashes(batch[text_col].tolist(), n_tokens)
        return pa.table({"sh": pa.array(np.unique(h), pa.uint64())})

    parts = benchmark.map_batches(bench_hashes, batch_format="pandas")
    bench = np.unique(
        parts.to_pandas()["sh"].to_numpy(dtype=np.uint64)
    )
    if len(bench) > BENCH_BROADCAST_CAP:
        raise ValueError(
            f"benchmark shingle set ({len(bench)}) exceeds broadcast cap; "
            "use the shuffle semi-join path (flat_map shingles + "
            "stages/joins.broadcast_semi_join per hash bucket)"
        )
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
    # distinct (a doc can hit in several batches only if it spans blocks,
    # which it can't — but keep the contract explicit and oracle-exact)
    return hits.groupby(id_col).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    ).sort(id_col)
