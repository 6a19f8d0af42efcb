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
        n_q, n_b = sims.shape
        k = min(self.k + (1 if self.exclude_self else 0), n_b)
        out_q, out_v, out_s = [], [], []
        for qi in range(n_q):
            row = sims[qi]
            # exact local top-k under (sim desc, vec_id asc): take every
            # element tied with the k-th value, then order ties by vec_id
            # — a sim-only argpartition could drop the lower vec_id of an
            # exact tie straddling the local k boundary.
            kth = np.partition(row, n_b - k)[n_b - k]
            cand = np.flatnonzero(row >= kth)
            cand = cand[np.lexsort((ids[cand], -row[cand]))]
            taken = 0
            for c in cand:
                if taken >= k:
                    break
                if self.exclude_self and ids[c] == self.qids[qi]:
                    continue
                out_q.append(self.qids[qi])
                out_v.append(int(ids[c]))
                out_s.append(float(row[c]))
                taken += 1
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


def ann_topk_bruteforce(ds: rd.Dataset, query_ids: np.ndarray,
                        query_mat: np.ndarray, k: int = 5,
                        emb_col: str = "embedding", id_col: str = "vec_id",
                        exclude_self: bool = True,
                        concurrency: int | None = None) -> rd.Dataset:
    """Exact cosine top-k. Returns (query_id, vec_id, sim, rank)."""
    ref = ray.put((np.asarray(query_ids), np.asarray(query_mat)))

    partials = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "emb_col": emb_col,
                               "id_col": id_col, "exclude_self": exclude_self},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or 2,
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
                 sample_size: int = 10_000, seed: int = 42) -> rd.Dataset:
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
            sims = self.q @ unit.T
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = self.allowed_mat[qi, assign]
                if exclude_self:
                    mask &= ids != self.qids[qi]
                cand = np.flatnonzero(mask)
                if len(cand) == 0:
                    continue
                top = cand[np.argsort(-sims[qi, cand])[: k]]
                for c in top:
                    out_q.append(self.qids[qi])
                    out_v.append(ids[c])
                    out_s.append(float(sims[qi, c]))
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(ProbedTopK, batch_format="pyarrow",
                              batch_size=4096, concurrency=2)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
