"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k — the queries are broadcast
  once (``ray.put`` on the driver, ``ray.get`` in actor ``__init__``),
  each batch computes a numpy matmul against the query matrix and emits
  only its batch-local top-k candidates; a tiny ``groupby(query_id)``
  merge produces the global top-k.  The corpus never shuffles.
- ``knn_ivf``: the scale path — IVF with seeded k-means centroids;
  vectors are assigned to their nearest centroid map-side and only the
  ``nprobe`` closest clusters are scanned per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .util import default_pool


def _as_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _filter_ids(ds, id_col: str, ids: list[int]):
    """Vectorized id-set filter (semi-join via broadcast key set)."""
    import pyarrow.compute as pc

    id_arr = pa.array(sorted(ids), pa.int64())

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[id_col], value_set=id_arr))

    return ds.map_batches(f, batch_format="pyarrow")


class _BatchTopK:
    """Actor: holds the broadcast (unit-normalized) query matrix; emits
    batch-local top-k rows (query_id, neighbor_id, sim)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str) -> None:
        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.qunit = _unit(qmat)
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        unit = _unit(_as_matrix(batch[self.vec_col]))
        sims = self.qunit @ unit.T  # (n_query, n_batch)
        out_q, out_n, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])  # +1 headroom for self-match
        for qi, qid in enumerate(self.qids):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            for j in idx:
                if ids[j] == qid:
                    continue
                out_q.append(int(qid))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(k: int):
    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return topk


def knn_bruteforce(ds, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   concurrency=None):
    """Exact cosine top-k of each query id against the full corpus
    (self excluded).  Returns (query_id, neighbor_id, rank)."""
    qdf = _filter_ids(ds, id_col, query_ids).to_pandas()
    qdf = qdf.sort_values(id_col)
    qids = qdf[id_col].to_numpy(dtype=np.int64)
    qmat = np.array([np.asarray(v, dtype=np.float64) for v in qdf[vec_col]])
    ref = ray.put((qids, qmat))
    cand = ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency if concurrency is not None else default_pool(),
        num_cpus=1,
    )
    return cand.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


def _kmeans(mat: np.ndarray, n_clusters: int, n_iter: int = 10, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(n_iter):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            m = mat[assign == c]
            if len(m):
                cent[c] = m.mean(0)
    return cent


def knn_ivf(ds, query_ids: list[int], k: int = 5, *, n_clusters: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
            train_sample: int = 2048, concurrency=None):
    """IVF approximate top-k: seeded k-means on a driver-side sample
    (bounded ``train_sample`` rows — the only materialized subset), then
    map-side cluster assignment and probe-filtered scan.  At cluster
    scale the centroid fit stays O(sample); the scan touches
    ~nprobe/n_clusters of the corpus."""
    sample = ds.limit(train_sample).to_pandas()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    cent = _unit(_kmeans(_unit(mat), n_clusters))
    qdf = _filter_ids(ds, id_col, query_ids).to_pandas().sort_values(id_col)
    qids = qdf[id_col].to_numpy(dtype=np.int64)
    qmat = _unit(np.array([np.asarray(v, dtype=np.float64) for v in qdf[vec_col]]))
    # clusters to probe per query → union set broadcast with the queries
    probes = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probe_union = set(int(c) for row in probes for c in row)
    ref = ray.put((qids, qmat, cent, probe_union))

    class _IVFTopK:
        def __init__(self) -> None:
            self.qids, self.qunit, self.cent, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            unit = _unit(_as_matrix(batch[vec_col]))
            assign = (unit @ self.cent.T).argmax(1)
            keep = np.isin(assign, list(self.probe))
            ids, unit = ids[keep], unit[keep]
            out_q, out_n, out_s = [], [], []
            if len(ids):
                sims = self.qunit @ unit.T
                kk = min(k + 1, sims.shape[1])
                for qi, qid in enumerate(self.qids):
                    idx = np.argpartition(-sims[qi], kk - 1)[:kk]
                    for j in idx:
                        if ids[j] == qid:
                            continue
                        out_q.append(int(qid))
                        out_n.append(int(ids[j]))
                        out_s.append(float(sims[qi, j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    cand = ds.map_batches(_IVFTopK, batch_format="pyarrow", batch_size=4096,
                          concurrency=concurrency if concurrency is not None else default_pool(),
                          num_cpus=1)
    return cand.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")
