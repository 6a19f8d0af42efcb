"""Similarity search over an embedding column (list<float>).

- :func:`ann_topk_bruteforce` — exact cosine top-k: the query matrix is
  broadcast ONCE via ``ray.put`` (never re-shipped per batch); each data
  batch computes a local top-k per query via one matmul; a final small
  groupby merges partial top-ks. Scales linearly in corpus size with no
  all-to-all shuffle — the baseline.
- :func:`ann_topk_ivf` — IVF scale path: seeded k-means centroids
  (trained on a driver-side sample), every vector assigned to its
  nearest centroid in map_batches, queries probe the ``nprobe`` nearest
  lists only. Same output schema; recall < 1 by design, measured in
  tests against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.arrays import list_column_to_matrix
from ..functions.hashing import stable_rng


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _local_topk_table(qids: np.ndarray, ids: np.ndarray, sims: np.ndarray,
                      k: int, exclude_self: bool) -> pa.Table:
    """Exact local top-k per query under (sim desc, vec_id asc),
    vectorized ACROSS queries (round-3 VERDICT #5 — no per-query Python
    loop): one argpartition over the full sim matrix finds each row's
    k-th value, a boolean mask keeps every element tied with it (a
    sim-only cut could drop the lower vec_id of an exact tie straddling
    the boundary), then one global lexsort + grouped rank truncates each
    query to k rows under the same total order the final merge uses —
    so local truncation is exact."""
    n_q, n_b = sims.shape
    kk = min(k + (1 if exclude_self else 0), n_b)
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})
    if kk <= 0 or n_q == 0:
        return empty
    kth = np.partition(sims, n_b - kk, axis=1)[:, n_b - kk]
    qq, cc = np.nonzero(sims >= kth[:, None])
    ss = sims[qq, cc].astype(np.float64)
    vv = ids[cc].astype(np.int64)
    if exclude_self:
        keep = vv != np.asarray(qids)[qq]
        qq, ss, vv = qq[keep], ss[keep], vv[keep]
    if len(qq) == 0:
        return empty
    order = np.lexsort((vv, -ss, qq))
    qq, ss, vv = qq[order], ss[order], vv[order]
    starts = np.flatnonzero(np.concatenate(([True], qq[1:] != qq[:-1])))
    sizes = np.diff(np.concatenate((starts, [len(qq)])))
    rank = np.arange(len(qq)) - np.repeat(starts, sizes)
    keep = rank < k
    return pa.table({
        "query_id": pa.array(np.asarray(qids)[qq[keep]].astype(np.int64),
                             pa.int64()),
        "vec_id": pa.array(vv[keep], pa.int64()),
        "sim": pa.array(ss[keep], pa.float64()),
    })


def _topk_table(query_ids, vec_ids, sims, k) -> pd.DataFrame:
    df = pd.DataFrame({"query_id": query_ids, "vec_id": vec_ids, "sim": sims})
    # deterministic: sim desc, vec_id asc
    df = df.sort_values(["query_id", "sim", "vec_id"],
                        ascending=[True, False, True])
    return df.groupby("query_id", sort=False).head(k)


class _PartialTopK:
    """Actor: holds the broadcast query matrix; emits local top-k/batch."""

    def __init__(self, queries_ref, k: int, emb_col: str, id_col: str,
                 exclude_self: bool):
        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.q = _unit(np.asarray(qmat, dtype=np.float32))
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = list_column_to_matrix(batch.column(self.emb_col), np.float32)
        if len(embs) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = self.q @ _unit(embs).T  # (n_queries, batch)
        return _local_topk_table(self.qids, ids, sims, self.k,
                                 self.exclude_self)


def ann_topk_bruteforce(ds: rd.Dataset, query_ids: np.ndarray,
                        query_mat: np.ndarray, k: int = 5,
                        emb_col: str = "embedding", id_col: str = "vec_id",
                        exclude_self: bool = True,
                        concurrency: int | None = None) -> rd.Dataset:
    """Exact cosine top-k. Returns (query_id, vec_id, sim, rank).

    ``concurrency=None`` auto-sizes the actor pool to the cluster
    (``effective_concurrency`` — cpus//4 ∈ [1, 8]) instead of a fixed 2."""
    from ..config import DEFAULT_PIPELINE, effective_concurrency

    ref = ray.put((np.asarray(query_ids), np.asarray(query_mat)))

    partials = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "emb_col": emb_col,
                               "id_col": id_col, "exclude_self": exclude_self},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or effective_concurrency(DEFAULT_PIPELINE),
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def train_ivf_centroids(sample: np.ndarray, n_lists: int, seed: int = 42,
                        iters: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means on unit vectors (driver-side, on a sample)."""
    rng = stable_rng(f"ivf-{seed}")
    x = _unit(np.asarray(sample, dtype=np.float32))
    idx = rng.choice(len(x), size=min(n_lists, len(x)), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cent[c] = v / n
    return cent


def ann_topk_ivf(ds: rd.Dataset, query_ids: np.ndarray,
                 query_mat: np.ndarray, k: int = 5, n_lists: int = 16,
                 nprobe: int = 4, emb_col: str = "embedding",
                 id_col: str = "vec_id", exclude_self: bool = True,
                 sample_size: int = 10_000, seed: int = 42,
                 concurrency: int | None = None) -> rd.Dataset:
    """IVF-style ANN: probe only the nprobe nearest centroid lists."""
    sample = ds.limit(sample_size).to_pandas()[emb_col].tolist()
    cent = train_ivf_centroids(np.asarray(sample, dtype=np.float32),
                               n_lists, seed=seed)
    cent_ref = ray.put(cent)
    q = _unit(np.asarray(query_mat, dtype=np.float32))
    probe_lists = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # per query
    # (n_queries, n_lists) boolean membership matrix: per-batch probe
    # filtering is then one fancy-index row lookup, not a Python set
    # membership per (query, vector) pair
    allowed_mat = np.zeros((len(q), len(cent)), dtype=bool)
    np.put_along_axis(allowed_mat, probe_lists, True, axis=1)
    ref = ray.put((np.asarray(query_ids), q, allowed_mat))

    class ProbedTopK:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.qids, self.q, self.allowed_mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            embs = list_column_to_matrix(batch.column(emb_col), np.float32)
            if len(embs) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            unit = _unit(embs)
            assign = np.argmax(unit @ self.cent.T, axis=1)
            # probe filter vectorized ACROSS queries: disallowed entries
            # mask to -inf, then the shared exact local top-k; sentinel
            # rows (queries with < k allowed vectors) filter out after.
            allowed = self.allowed_mat[:, assign]
            if exclude_self:
                allowed &= ids[None, :] != self.qids[:, None]
            sims = np.where(allowed, self.q @ unit.T, -np.inf)
            out = _local_topk_table(self.qids, ids, sims, k,
                                    exclude_self=False)
            return out.filter(pc.greater(out.column("sim"),
                                         float("-inf")))

    from ..config import DEFAULT_PIPELINE, effective_concurrency

    partials = ds.map_batches(
        ProbedTopK, batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency or effective_concurrency(DEFAULT_PIPELINE),
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
