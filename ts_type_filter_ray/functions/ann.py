"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put`` → read per actor in ``__init__``), each
  batch does one float64 matmul, emits only its local top-k per query,
  and a tiny ``groupby(query_id)`` merge finishes — the map-side partial
  top-k keeps the shuffle at O(#batches · k), not O(N).
- :func:`ivf_topk` — the scale path: k-means coarse centroids (seeded,
  Lloyd iterations as map_batches partial sums), each vector assigned to
  its nearest centroid (an inverted file), queries probe only the
  ``nprobe`` nearest lists. Approximate → rows-only correctness check.
- :func:`embedding_near_dup_pairs` — cosine near-dup pairs via blocked
  matmul against the broadcast matrix (sf-scale exact baseline).

Similarities are computed in float64; ranked outputs carry integer ranks
so correctness checks never compare floats across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def load_query_matrix(ds: Dataset, query_ids: list[int]) -> tuple[np.ndarray, list[int]]:
    """Fetch the query vectors (small side) onto the driver."""
    import pyarrow.compute as pc
    ids = pa.array(sorted(query_ids), type=pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["vec_id"], value_set=ids))

    rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return _normalize(mat), [r["vec_id"] for r in rows]


class _BatchTopK:
    """Actor: holds the broadcast normalized query matrix; per batch emits
    the batch-local top-k candidates per query."""

    def __init__(self, q_ref, query_ids: list[int], k: int):
        self._q = ray.get(q_ref)  # (#queries, dim) — fetched once per actor
        self._qids = np.asarray(query_ids, dtype=np.int64)
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_embedding_matrix(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self._q @ emb.T  # (#queries, batch)
        k = min(self._k, sims.shape[1])
        # local top-k per query (unordered partial)
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        qid_col, vid_col, sim_col = [], [], []
        for qi in range(sims.shape[0]):
            qid_col.extend([int(self._qids[qi])] * k)
            vid_col.extend(vec_ids[idx[qi]].tolist())
            sim_col.extend(sims[qi, idx[qi]].tolist())
        return pa.table({
            "query_id": pa.array(qid_col, type=pa.int64()),
            "vec_id": pa.array(vid_col, type=pa.int64()),
            "sim": pa.array(sim_col, type=pa.float64()),
        })


def _final_topk(k: int):
    def fn(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        vids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        sims = np.asarray(group["sim"].to_pylist(), dtype=np.float64)
        order = np.lexsort((vids, -sims))[:k]  # (sim desc, vec_id asc)
        n = len(order)
        return pa.table({
            "query_id": pa.array([qid] * n, type=pa.int64()),
            "rank": pa.array(np.arange(1, n + 1), type=pa.int32()),
            "vec_id": pa.array(vids[order], type=pa.int64()),
            "sim": pa.array(sims[order], type=pa.float64()),
        })
    return fn


def brute_force_topk(ds: Dataset, query_ids: list[int], k: int = 10,
                     concurrency=(1, 8)) -> Dataset:
    """Exact cosine top-k for each query id. Output:
    (query_id, rank, vec_id, sim), rank 1-based, tie-break
    (sim desc, vec_id asc)."""
    q_mat, qids = load_query_matrix(ds, query_ids)
    q_ref = ray.put(q_mat)
    partial = ds.map_batches(_BatchTopK,
                             fn_constructor_args=(q_ref, qids, k),
                             batch_format="pyarrow", concurrency=concurrency)
    return partial.groupby("query_id").map_groups(_final_topk(k),
                                                  batch_format="pyarrow")


def embedding_near_dup_pairs(ds: Dataset, threshold: float = 0.35,
                             concurrency=(1, 8)) -> Dataset:
    """All (id_a < id_b) pairs with cosine ≥ threshold: blocked matmul of
    each batch against the full broadcast matrix (exact; the N×N baseline
    for the LSH/IVF approximations). O(N²/B) per batch — the sf-scale
    oracle, not the 100 TB path (that's :func:`ivf_topk`-style bucketing)."""
    import pyarrow.compute as pc_  # noqa: F401

    all_rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    all_rows.sort(key=lambda r: r["vec_id"])
    full = _normalize(np.array([r["embedding"] for r in all_rows],
                               dtype=np.float64))
    full_ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    full_ref = ray.put((full, full_ids))

    class PairFinder:
        def __init__(self):
            self._full, self._ids = ray.get(full_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_embedding_matrix(batch))
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            sims = emb @ self._full.T
            rows_a, rows_b = [], []
            for i in range(len(vids)):
                hits = np.flatnonzero(sims[i] >= threshold)
                for j in hits:
                    a, b = int(vids[i]), int(self._ids[j])
                    if a < b:
                        rows_a.append(a)
                        rows_b.append(b)
            return pa.table({"id_a": pa.array(rows_a, type=pa.int64()),
                             "id_b": pa.array(rows_b, type=pa.int64())})

    return ds.map_batches(PairFinder, batch_format="pyarrow",
                          concurrency=concurrency)


# ------------------------------------------------------------------ IVF


def train_centroids(ds: Dataset, n_centroids: int = 16, iters: int = 3,
                    sample_ids: list[int] | None = None) -> np.ndarray:
    """Distributed Lloyd iterations: centroids init from the first
    ``n_centroids`` vectors (deterministic), each iteration is a
    map_batches partial-sum (sum, count per centroid) + tiny driver reduce."""
    init_ids = sample_ids or list(range(n_centroids))
    cents, _ = load_query_matrix(ds, init_ids)

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            emb = _normalize(_embedding_matrix(batch))
            assign = np.argmax(emb @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, emb)
            counts = np.bincount(assign, minlength=c.shape[0])
            return pa.table({
                "cid": pa.array(np.arange(c.shape[0]), type=pa.int32()),
                "vsum": pa.array(sums.tolist(),
                                 type=pa.list_(pa.float64())),
                "n": pa.array(counts, type=pa.int64()),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        dim = cents.shape[1]
        sums = np.zeros((cents.shape[0], dim))
        counts = np.zeros(cents.shape[0], dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["vsum"])
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        cents[nz] = _normalize(sums[nz] / counts[nz, None])
    return cents


def ivf_topk(ds: Dataset, query_ids: list[int], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             concurrency=(1, 8)) -> Dataset:
    """IVF-style ANN: assign vectors to coarse centroids, score only the
    vectors whose centroid is among each query's ``nprobe`` nearest.
    Approximate (recall < 1 by design) → rows-only correctness check."""
    cents = train_centroids(ds, n_centroids)
    q_mat, qids = load_query_matrix(ds, query_ids)
    probe = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]  # (#q, nprobe)
    state_ref = ray.put((cents, q_mat, np.asarray(qids, dtype=np.int64), probe))

    class ProbeTopK:
        def __init__(self):
            self._cents, self._q, self._qids, self._probe = ray.get(state_ref)
            self._k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_embedding_matrix(batch))
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            assign = np.argmax(emb @ self._cents.T, axis=1)
            qid_col, vid_col, sim_col = [], [], []
            for qi in range(self._q.shape[0]):
                mask = np.isin(assign, self._probe[qi])
                if not mask.any():
                    continue
                sims = emb[mask] @ self._q[qi]
                sel_ids = vids[mask]
                kk = min(self._k, sims.size)
                top = np.argpartition(-sims, kth=kk - 1)[:kk]
                qid_col.extend([int(self._qids[qi])] * kk)
                vid_col.extend(sel_ids[top].tolist())
                sim_col.extend(sims[top].tolist())
            return pa.table({
                "query_id": pa.array(qid_col, type=pa.int64()),
                "vec_id": pa.array(vid_col, type=pa.int64()),
                "sim": pa.array(sim_col, type=pa.float64()),
            })

    partial = ds.map_batches(ProbeTopK, batch_format="pyarrow",
                             concurrency=concurrency)
    return partial.groupby("query_id").map_groups(_final_topk(k),
                                                  batch_format="pyarrow")
