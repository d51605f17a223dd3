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
from ray.data.datasource import Datasource


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


def _load_block(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read one spilled embedding block → (vec_ids, L2-normalized f64)."""
    import pyarrow.dataset as pads
    tbl = pads.dataset(path).to_table(columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    col = tbl["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return ids, _normalize(flat.reshape(len(ids), -1))


def _block_pair_table(path_i: str, path_j: str, same: bool,
                      threshold: float) -> pa.Table:
    ids_i, emb_i = _load_block(path_i)
    if same:
        ids_j, emb_j = ids_i, emb_i
    else:
        ids_j, emb_j = _load_block(path_j)
    sims = emb_i @ emb_j.T
    ii, jj = np.nonzero(sims >= threshold)
    a = ids_i[ii]
    b = ids_j[jj]
    if same:
        # a<b keeps each pair once and drops self-pairs
        keep = a < b
        a, b = a[keep], b[keep]
    else:
        # cross blocks hold disjoint id sets and each unordered pair is
        # visited exactly once (i<j sweep): canonicalize by min/max
        a, b = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"id_a": pa.array(a, type=pa.int64()),
                     "id_b": pa.array(b, type=pa.int64())})


class _BlockPairDatasource(Datasource):
    """One ``ReadTask`` per block pair (K·(K+1)/2 tasks) so the executor
    runs the exact O(N²) pair sweep as independent, memory-bounded tasks
    (2 blocks resident per task) — never a driver-side matrix.

    ``block_dirs`` are the block directories ACTUALLY present after the
    spill — enumerated, not assumed, because ``vid % k`` residue classes
    can be empty under skewed/sparse vec_ids and a missing directory
    would otherwise fault inside the read task (ADVICE r2)."""

    def __init__(self, block_dirs: list[str], threshold: float,
                 block_bytes: list[int]):
        self._dirs = block_dirs
        self._threshold = threshold
        self._sizes = block_bytes

    def estimate_inmemory_data_size(self):
        return sum(self._sizes) * len(self._dirs)  # each block read ~K times

    def get_name(self):
        return "EmbeddingBlockPairs"

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask
        out = []
        k = len(self._dirs)
        for i in range(k):
            for j in range(i, k):
                pi, pj = self._dirs[i], self._dirs[j]
                meta = BlockMetadata(
                    num_rows=None,
                    size_bytes=self._sizes[i] + self._sizes[j],
                    exec_stats=None, input_files=[pi, pj])
                thr = self._threshold
                out.append(ReadTask(
                    lambda a=pi, b=pj, s=(i == j), t=thr:
                        [_block_pair_table(a, b, s, t)],
                    meta))
        return out


def embedding_near_dup_pairs(ds: Dataset, threshold: float = 0.35,
                             block_rows: int = 8192,
                             spill_dir: str | None = None) -> Dataset:
    """All (id_a < id_b) pairs with cosine ≥ threshold — **exact** at any
    scale. Pass 1 streams the embeddings into K = ⌈N/block_rows⌉ hash
    blocks of partitioned Parquet; pass 2 is one Ray task per block pair,
    each loading two blocks, doing one float64 matmul, and emitting the
    qualifying pairs. Work is inherently O(N²) (so is the output bound —
    that is this operator's contract); memory is O(block² ) per task and
    the driver never sees a matrix. The sub-quadratic *approximate* path
    is :func:`ivf_topk`-style bucketing."""
    import glob
    import tempfile

    import ray.data as rd

    n = ds.count()
    k = max(1, -(-n // block_rows))
    spill = spill_dir or tempfile.mkdtemp(prefix="graft_emb_blocks_")

    def add_block(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": batch["vec_id"],
            "embedding": batch["embedding"],
            "block": pa.array((vid % k).astype(np.int32)),
        })

    (ds.select_columns(["vec_id", "embedding"])
       .map_batches(add_block, batch_format="pyarrow")
       .write_parquet(spill, partition_cols=["block"]))

    # enumerate the block dirs that actually materialized (empty residue
    # classes under vid % k write nothing)
    import os
    dirs = sorted(d for d in glob.glob(f"{spill}/block=*")
                  if glob.glob(f"{d}/*.parquet"))
    sizes = [sum(os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet"))
             for d in dirs]
    return rd.read_datasource(
        _BlockPairDatasource(dirs, threshold, sizes))


# ------------------------------------------------------------------ IVF


def train_centroids(ds: Dataset, n_centroids: int = 16, iters: int = 3,
                    sample_ids: list[int] | None = None) -> np.ndarray:
    """Distributed Lloyd iterations: centroids init from the first
    ``n_centroids`` vectors (deterministic). Each iteration emits
    per-batch partial (cid, dim, s=Σemb, n) rows and reduces them with a
    ``groupby(["cid", "dim"]).aggregate(Sum)`` IN the cluster — the
    driver pulls only the final (n_centroids × dim)-row table, a size
    independent of the corpus (r2 pulled every batch's partials to the
    driver, O(#batches·centroids·dim))."""
    from ray.data.aggregate import Sum

    init_ids = sample_ids or list(range(n_centroids))
    cents, _ = load_query_matrix(ds, init_ids)
    dim = cents.shape[1]

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            emb = _normalize(_embedding_matrix(batch))
            assign = np.argmax(emb @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, emb)
            counts = np.bincount(assign, minlength=c.shape[0])
            k_c = c.shape[0]
            # one row per (cid, dim); n rides on every dim row (constant
            # within a cid, so the aggregated n is count·dim-consistent)
            return pa.table({
                "cid": pa.array(np.repeat(np.arange(k_c, dtype=np.int32),
                                          dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32),
                                        k_c)),
                "s": pa.array(sums.ravel(), type=pa.float64()),
                "n": pa.array(np.repeat(counts, dim), type=pa.int64()),
            })

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["cid", "dim"])
               .aggregate(Sum("s", alias_name="s"),
                          Sum("n", alias_name="n"))
               .take_all())  # ≤ n_centroids·dim rows — small by contract
        sums = np.zeros((cents.shape[0], dim))
        counts = np.zeros(cents.shape[0], dtype=np.int64)
        for r in agg:
            sums[r["cid"], r["dim"]] = r["s"]
            counts[r["cid"]] = r["n"] if r["dim"] == 0 else counts[r["cid"]]
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
