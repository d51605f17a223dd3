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
        # local top-k per query with the GLOBAL tie-break (sim desc,
        # vec_id asc): a plain argpartition keeps an arbitrary member
        # of a sim tie straddling the local cutoff — the dropped twin
        # may be the one the final lexsort (and the SQL oracle's
        # row_number) would rank first. A full per-query lexsort of
        # the batch is exact under any tie structure and costs
        # O(n log n) on a few-thousand-row batch — noise next to the
        # matmul above.
        qid_col, vid_col, sim_col = [], [], []
        for qi in range(sims.shape[0]):
            pick = np.lexsort((vec_ids, -sims[qi]))[:k]
            qid_col.extend([int(self._qids[qi])] * len(pick))
            vid_col.extend(vec_ids[pick].tolist())
            sim_col.extend(sims[qi, pick].tolist())
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
                      threshold: float, chunk_rows: int = 8192) -> pa.Table:
    ids_i, emb_i = _load_block(path_i)
    if same:
        ids_j, emb_j = ids_i, emb_i
    else:
        ids_j, emb_j = _load_block(path_j)
    # chunked matmul: the sims matrix (the memory peak) stays ≤
    # chunk_rows², even when centroid blocking skews a block's row count
    ii_out, jj_out = [], []
    for s in range(0, len(ids_i), chunk_rows):
        sims = emb_i[s:s + chunk_rows] @ emb_j.T
        ii, jj = np.nonzero(sims >= threshold)
        ii_out.append(ii + s)
        jj_out.append(jj)
    ii = np.concatenate(ii_out) if ii_out else np.empty(0, dtype=np.int64)
    jj = np.concatenate(jj_out) if jj_out else np.empty(0, dtype=np.int64)
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
    """One ``ReadTask`` per SURVIVING block pair so the executor runs the
    exact pair sweep as independent, memory-bounded tasks (2 blocks
    resident, chunked matmul) — never a driver-side matrix.

    ``pairs`` is the pruned (i, j) index list into ``block_dirs`` — with
    centroid blocking most of the K·(K+1)/2 grid is provably below the
    threshold and never becomes a task (see
    :func:`_plan_block_pairs`). ``block_dirs`` are the directories
    ACTUALLY present after the spill — enumerated, not assumed, because
    residue/centroid classes can be empty and a missing directory would
    otherwise fault inside the read task (ADVICE r2). ``task_fn`` is the
    per-pair kernel ``(path_i, path_j, same) -> pa.Table`` — the
    threshold sweep and the kNN join share this scheduling shape."""

    def __init__(self, block_dirs: list[str], block_bytes: list[int],
                 pairs: list[tuple[int, int]], task_fn):
        self._dirs = block_dirs
        self._sizes = block_bytes
        self._pairs = pairs
        self._task_fn = task_fn

    def estimate_inmemory_data_size(self):
        return sum(self._sizes[i] + self._sizes[j] for i, j in self._pairs)

    def get_name(self):
        return "EmbeddingBlockPairs"

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask
        out = []
        fn = self._task_fn
        for i, j in self._pairs:
            pi, pj = self._dirs[i], self._dirs[j]
            meta = BlockMetadata(
                num_rows=None,
                size_bytes=self._sizes[i] + self._sizes[j],
                exec_stats=None, input_files=[pi, pj])
            out.append(ReadTask(
                lambda a=pi, b=pj, s=(i == j): [fn(a, b, s)],
                meta))
        return out


def _plan_block_pairs(cents: np.ndarray | None, devs: np.ndarray | None,
                      threshold: float, k: int) -> list[tuple[int, int]]:
    """Surviving (i ≤ j) block pairs under the angular triangle bound.

    With centroid blocking, block i carries (centroid c_i, max angular
    deviation δ_i = max_a∈i angle(a, c_i)). Angle is a metric on the unit
    sphere, so for any a∈i, b∈j:
        angle(a, b) ≥ angle(c_i, c_j) − δ_i − δ_j
    and cos is decreasing on [0, π]; if
    ``cos(max(0, θ_ij − δ_i − δ_j)) < threshold`` NO pair across (i, j)
    can qualify and the pair is skipped — provably safe, so exactness is
    preserved (the gate stays value-exact). On isotropic data (δ ≈ 90°)
    nothing prunes and this degenerates to the full grid — the honest
    worst case of any exact algorithm whose output bound is O(N²); on
    clusterable real embedding corpora most of the grid dies here.
    ``cents=None`` (hash blocking) keeps every pair."""
    if cents is None or devs is None:
        return [(i, j) for i in range(k) for j in range(i, k)]
    lim = float(np.arccos(min(1.0, max(-1.0, threshold))))
    theta = np.arccos(np.clip(cents @ cents.T, -1.0, 1.0))
    lb = theta - devs[:, None] - devs[None, :]
    keep = np.maximum(lb, 0.0) <= lim
    return [(i, j) for i in range(k) for j in range(i, k) if keep[i, j]]


def embedding_near_dup_pairs(ds: Dataset, threshold: float = 0.35,
                             block_rows: int = 8192,
                             spill_dir: str | None = None,
                             blocking: str = "centroid") -> Dataset:
    """All (id_a < id_b) pairs with cosine ≥ threshold — **exact** at any
    scale. Pass 1 streams the embeddings into K ≈ ⌈N/block_rows⌉ blocks
    of partitioned Parquet; pass 2 is one Ray task per SURVIVING block
    pair, each loading two blocks, doing a chunked float64 matmul, and
    emitting the qualifying pairs. The driver never sees a matrix.

    ``blocking="centroid"`` (default, the scale path): blocks are
    k-means cells; each block carries its centroid and max angular
    deviation, and block pairs provably below the threshold are pruned
    by the spherical triangle inequality BEFORE any task is scheduled
    (:func:`_plan_block_pairs`) — exactness is untouched, so the
    value-exact gate holds. On a clusterable corpus the K² grid
    collapses to near-diagonal; on isotropic data nothing prunes, which
    is the floor of any exact algorithm here (the output bound itself
    is O(N²)). ``blocking="hash"`` (``vid % K``) skips the centroid
    passes and always runs the full grid — the cheap choice when K is
    tiny. The sub-quadratic *approximate* path (recall < 1, verified
    candidates only) is :func:`embedding_near_dup_pairs_lsh`.

    Skew note: a hot k-means cell can exceed ``block_rows`` rows; the
    matmul is chunked so the sims matrix stays bounded, but the block
    load itself is O(cell size) — cap cell skew upstream (split hot
    cells) if a corpus collapses into one cluster."""
    import ray.data as rd

    import functools

    dirs, sizes, plan_cents, devs = _spill_blocks(ds, block_rows,
                                                  blocking, spill_dir)
    pairs = _plan_block_pairs(plan_cents, devs, threshold, len(dirs))
    return rd.read_datasource(_BlockPairDatasource(
        dirs, sizes, pairs,
        functools.partial(_block_pair_table, threshold=threshold)))


def _spill_blocks(ds: Dataset, block_rows: int, blocking: str,
                  spill_dir: str | None):
    """Pass 1 of the blocked exact sweeps: stream the embeddings into
    K ≈ ⌈N/block_rows⌉ partitioned-Parquet blocks (k-means cells under
    ``blocking="centroid"``, ``vid % K`` under ``"hash"``). Returns
    ``(dirs, sizes, cents, devs)`` — the block directories ACTUALLY
    present (empty residue/centroid classes write nothing, ADVICE r2),
    their byte sizes, and under centroid blocking each block's unit
    centroid and max angular deviation for triangle-bound planning."""
    import glob
    import os
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Max

    n = ds.count()
    k = max(1, -(-n // block_rows))
    spill = spill_dir or tempfile.mkdtemp(prefix="graft_emb_blocks_")
    use_centroids = blocking == "centroid" and k > 1

    cents = None
    if use_centroids:
        init_ids = [r["vec_id"] for r in
                    ds.select_columns(["vec_id"]).take(k)]
        cents = train_centroids(ds, n_centroids=k, iters=2,
                                sample_ids=init_ids)
        c_ref = ray.put(cents)

        def add_block(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            emb = _normalize(_embedding_matrix(batch))
            sims = emb @ c.T
            assign = np.argmax(sims, axis=1)
            dev = np.arccos(np.clip(sims[np.arange(len(assign)), assign],
                                    -1.0, 1.0))
            return pa.table({
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "dev": pa.array(dev, type=pa.float64()),
                "block": pa.array(assign.astype(np.int32)),
            })
    else:
        def add_block(batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy(zero_copy_only=False)
            n_rows = batch.num_rows
            return pa.table({
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "dev": pa.array(np.zeros(n_rows), type=pa.float64()),
                "block": pa.array((vid % k).astype(np.int32)),
            })

    (ds.select_columns(["vec_id", "embedding"])
       .map_batches(add_block, batch_format="pyarrow")
       .write_parquet(spill, partition_cols=["block"]))

    # enumerate the block dirs that actually materialized (empty
    # residue/centroid classes write nothing)
    dirs = sorted((d for d in glob.glob(f"{spill}/block=*")
                   if glob.glob(f"{d}/*.parquet")),
                  key=lambda d: int(d.rsplit("=", 1)[1]))
    cids = [int(d.rsplit("=", 1)[1]) for d in dirs]
    sizes = [sum(os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet"))
             for d in dirs]

    if use_centroids:
        # per-block max deviation: one column-pruned pass over the spill
        # (dev + hive partition col only), reduced in the cluster
        dev_rows = (rd.read_parquet(spill, columns=["dev", "block"])
                    .groupby("block").aggregate(Max("dev", alias_name="dev"))
                    .take_all())  # ≤ K rows
        dev_by_cid = {int(r["block"]): float(r["dev"]) for r in dev_rows}
        devs = np.array([dev_by_cid.get(c, 0.0) for c in cids])
        plan_cents = cents[cids]
    else:
        devs = None
        plan_cents = None

    return dirs, sizes, plan_cents, devs


def _block_pair_knn_table(path_i: str, path_j: str, same: bool,
                          k: int, chunk_rows: int = 8192) -> pa.Table:
    """Per-pair kNN kernel: for block pair (i, j), each side's vectors'
    top-k cosine candidates against the OTHER side's vectors (both
    directions for cross pairs; self-pairs excluded on the diagonal).
    Emits ≤ k rows per (vector, pair) — the partial the merge groupby
    reduces, so shuffle volume is O(N · pairs-per-block · k), never
    O(N²) rows."""
    ids_i, emb_i = _load_block(path_i)
    if same:
        ids_j, emb_j = ids_i, emb_i
    else:
        ids_j, emb_j = _load_block(path_j)
    v_out, n_out, s_out = [], [], []

    def side(ids_a, emb_a, ids_b, emb_b, diag: bool):
        n_cols = len(ids_b)
        for s in range(0, len(ids_a), chunk_rows):
            sims = emb_a[s:s + chunk_rows] @ emb_b.T
            if diag:  # same block: column c of row r is id pair (r+s, c)
                rows = np.arange(sims.shape[0])
                sims[rows, rows + s] = -np.inf
            kk = min(k, n_cols - 1 if diag else n_cols)
            if kk <= 0:
                continue
            idx = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
            v_out.append(np.repeat(ids_a[s:s + chunk_rows], kk))
            n_out.append(ids_b[idx].ravel())
            s_out.append(np.take_along_axis(sims, idx, axis=1).ravel())

    side(ids_i, emb_i, ids_j, emb_j, diag=same)
    if not same:
        side(ids_j, emb_j, ids_i, emb_i, diag=False)
    if not v_out:
        return pa.table({"vec_id": pa.array([], type=pa.int64()),
                         "neighbor_id": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})
    return pa.table({
        "vec_id": pa.array(np.concatenate(v_out), type=pa.int64()),
        "neighbor_id": pa.array(np.concatenate(n_out), type=pa.int64()),
        "sim": pa.array(np.concatenate(s_out), type=pa.float64()),
    })


def knn_join(ds: Dataset, k: int = 5, block_rows: int = 8192,
             blocking: str = "centroid", nprobe: int | None = None,
             spill_dir: str | None = None) -> Dataset:
    """Self kNN join: (vec_id, rank, neighbor_id, sim) — each vector's
    k nearest neighbors by cosine, tie-break (sim desc, neighbor asc) —
    the all-pairs similarity primitive behind semantic dedup clustering,
    diversity sampling and retrieval-graph construction.

    Same two-pass shape as :func:`embedding_near_dup_pairs`: spill to K
    blocks (k-means cells by default), one memory-bounded Ray task per
    block pair emitting ≤ k partial candidates per vector per side, one
    ``groupby(vec_id)`` top-k merge. ``nprobe=None`` runs the full
    K·(K+1)/2 grid — EXACT (a kNN join has no threshold to prune with,
    so exactness costs the O(N²) compute floor; it stays value-exact on
    the driver gate). ``nprobe=m`` is the scale path: only pairs where
    one block is among the other's m angularly-nearest cells run —
    IVF-style approximation whose recall follows the cell geometry
    (high when clusters are tight; always includes the diagonal)."""
    import functools

    import ray.data as rd

    dirs, sizes, cents, devs = _spill_blocks(ds, block_rows, blocking,
                                             spill_dir)
    K = len(dirs)
    if nprobe is None or cents is None:
        pairs = [(i, j) for i in range(K) for j in range(i, K)]
    else:
        order = np.argsort(-(cents @ cents.T), axis=1)[:, :nprobe]
        want = {(i, i) for i in range(K)}
        for i in range(K):
            for j in order[i]:
                want.add((min(i, int(j)), max(i, int(j))))
        pairs = sorted(want)
    partial = rd.read_datasource(_BlockPairDatasource(
        dirs, sizes, pairs, functools.partial(_block_pair_knn_table, k=k)))

    def final(group: pa.Table) -> pa.Table:
        vid = group["vec_id"][0].as_py()
        nids = np.asarray(group["neighbor_id"].to_pylist(), dtype=np.int64)
        sims = np.asarray(group["sim"].to_pylist(), dtype=np.float64)
        order = np.lexsort((nids, -sims))[:k]
        n = len(order)
        return pa.table({
            "vec_id": pa.array([vid] * n, type=pa.int64()),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "neighbor_id": pa.array(nids[order], type=pa.int64()),
            "sim": pa.array(sims[order], type=pa.float64()),
        })

    return partial.groupby("vec_id").map_groups(final,
                                                batch_format="pyarrow")


# ------------------------------------------------ LSH near-dup (scale)


def hyperplane_band_plan(threshold: float, target_detect: float = 0.999,
                         max_bands: int = 256) -> tuple[int, int]:
    """(bands, rows_per_band) for random-hyperplane LSH at *threshold*.

    Per-hyperplane collision probability for a pair at cosine t is
    p = 1 − arccos(t)/π (Charikar 2002, SimHash — public). A band of r
    sign bits collides with p^r; B bands detect with 1 − (1 − p^r)^B.
    Picks the MOST selective feasible banding: the largest r (≤ 32, so a
    band packs into uint64 with headroom) whose band count for
    ``target_detect`` at the threshold stays ≤ ``max_bands`` — recall-
    biased for the same reason as :func:`..dedup.optimal_bands`: the
    exact verify makes false candidates cost only compute, while a
    missed true pair is unrecoverable. Low thresholds (cos barely above
    isotropic background) force tiny r — candidate selectivity
    degrades toward all-pairs, which is fundamental to hyperplane LSH,
    not a tuning artifact; this operator earns its keep at the realistic
    near-dup regime (t ≳ 0.7)."""
    import math
    t = min(1.0, max(-1.0, threshold))
    p = 1.0 - math.acos(t) / math.pi
    for r in (32, 24, 16, 12, 10, 8, 6, 4, 2, 1):
        pr = p ** r
        if pr >= 1.0:
            return 1, r
        need = math.ceil(math.log(1.0 - target_detect) / math.log(1.0 - pr))
        if need <= max_bands:
            return max(1, need), r
    return max_bands, 1


class HyperplaneSignatureStage:
    """Actor-pool stage: embedding → (part, band, key, doc_id) banded
    sign-bit rows. The Gaussian plane matrix is seeded and built once per
    actor on the first batch (dim inferred), so signatures are identical
    across actors and batch splits — deterministic output."""

    def __init__(self, bands: int, rows_per_band: int, num_parts: int,
                 seed: int = 11):
        self._bands = bands
        self._r = rows_per_band
        self._num_parts = num_parts
        self._seed = seed
        self._planes: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_embedding_matrix(batch))
        n, dim = emb.shape
        if self._planes is None:
            rng = np.random.default_rng(self._seed)
            self._planes = rng.standard_normal((self._bands * self._r, dim))
        bits = (emb @ self._planes.T) > 0.0  # (n, bands·r)
        weights = (np.uint64(1) << np.arange(self._r, dtype=np.uint64))
        bh = (bits.reshape(n, self._bands, self._r).astype(np.uint64)
              * weights).sum(axis=2, dtype=np.uint64)  # (n, bands)
        band_ids = np.tile(np.arange(self._bands, dtype=np.int32), n)
        # fold the band index into the segment key so equal sign-patterns
        # in different bands never merge
        key = (band_ids.astype(np.uint64) << np.uint64(self._r)) | bh.ravel()
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array((key % self._num_parts).astype(np.int32)),
            "band": pa.array(band_ids),
            "bhash": pa.array(key),
            "doc_id": pa.array(np.repeat(vids, self._bands),
                               type=pa.int64()),
        })


def embedding_near_dup_pairs_lsh(ds: Dataset, threshold: float = 0.7,
                                 target_detect: float = 0.999,
                                 bands: int | None = None,
                                 rows_per_band: int | None = None,
                                 bucket_pair_cap: int | None = None,
                                 num_parts: int | None = None,
                                 seed: int = 11,
                                 concurrency=(1, 8)) -> Dataset:
    """Sub-quadratic cosine near-dup: (id_a, id_b, cosine) for pairs with
    cosine ≥ threshold, found via random-hyperplane signature banding and
    verified EXACTLY — the 100-TB path (VERDICT r2 #2).

    Shape: signature stage (one seeded plane matrix per actor, one
    matmul per batch) → explode to (band, key, doc_id) rows → the same
    coarse-partition vectorized segment scan the minhash path uses
    (``dedup._segment_index_pairs``) → distinct candidate pairs → the
    groupby-union shuffle join (``dedup._attach_blobs``) attaches each
    side's packed normalized float64 vector → one vectorized dot per
    candidate. Every reported pair is exact (the verify recomputes
    cosine); recall is 1 − (1 − p^r)^bands per true pair, auto-planned
    from the threshold to ≥ ``target_detect`` — approximate by design,
    hence a rows-only driver check; pytest asserts recall vs the exact
    sweep. No O(N²) task grid and no all-pairs matmul anywhere:
    candidate volume tracks bucket collisions, not N²."""
    from .dedup import _attach_blobs, _segment_index_pairs
    from .partitioning import auto_num_parts

    if bands is None or rows_per_band is None:
        auto_b, auto_r = hyperplane_band_plan(threshold, target_detect)
        bands = bands if bands is not None else auto_b
        rows_per_band = rows_per_band if rows_per_band is not None else auto_r
    if num_parts is None:
        num_parts = auto_num_parts(ds.count() * bands)

    sig_rows = ds.map_batches(
        HyperplaneSignatureStage,
        fn_constructor_args=(bands, rows_per_band, num_parts, seed),
        batch_format="pyarrow", concurrency=concurrency)

    cap = bucket_pair_cap

    def pairs(group: pa.Table) -> pa.Table:
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order, ia, ib = _segment_index_pairs(
            group["band"].to_numpy(zero_copy_only=False),
            group["bhash"].to_numpy(zero_copy_only=False), did, cap)
        did = did[order]
        return pa.table({"id_a": pa.array(did[ia], type=pa.int64()),
                         "id_b": pa.array(did[ib], type=pa.int64())})

    from ray.data.aggregate import Count
    cand = (sig_rows.groupby("part")
            .map_groups(pairs, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .aggregate(Count(alias_name="n_bands"))
            .select_columns(["id_a", "id_b"]))

    def pack(batch: pa.Table) -> pa.Table:
        emb = _normalize(_embedding_matrix(batch))
        return pa.table({
            "doc_id": batch["vec_id"].cast(pa.int64()),
            "blob": pa.array([row.tobytes() for row in emb],
                             type=pa.binary()),
        })

    blobs = ds.select_columns(["vec_id", "embedding"]).map_batches(
        pack, batch_format="pyarrow")
    joined = _attach_blobs(cand, blobs, num_parts=min(num_parts, 4096))

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch["id_a"].to_numpy(zero_copy_only=False)
        b_ids = batch["id_b"].to_numpy(zero_copy_only=False)
        ba = batch["blob_a"].to_pylist()
        bb = batch["blob_b"].to_pylist()
        if not len(a_ids):
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        va = np.frombuffer(b"".join(ba), dtype=np.float64).reshape(
            len(a_ids), -1)
        vb = np.frombuffer(b"".join(bb), dtype=np.float64).reshape(
            len(b_ids), -1)
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= threshold
        return pa.table({
            "id_a": pa.array(a_ids[keep], type=pa.int64()),
            "id_b": pa.array(b_ids[keep], type=pa.int64()),
            "cosine": pa.array(cos[keep], type=pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow").sort(
        ["id_a", "id_b"])


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

# ------------------------------------------------- product quantization


def train_pq_codebooks(ds: Dataset, m: int = 4, ksub: int = 16,
                       iters: int = 3) -> np.ndarray:
    """Per-subspace Lloyd codebooks for product quantization (Jégou,
    Douze & Schmid 2011): the D-dim unit vectors split into *m*
    contiguous subspaces of D/m dims; each subspace gets *ksub*
    centroids minimizing L2 over its sub-vectors. Returns
    ``(m, ksub, D/m)`` float64.

    Distributed shape: ALL subspaces train in the same pass — each
    iteration is one ``map_batches`` emitting (sub, cid, dim) partial
    sums + counts, reduced by a cluster-side
    ``groupby.aggregate(Sum)``; the driver pulls only the
    m·ksub·(D/m) = ksub·D-row table per iteration, independent of the
    corpus. Init is deterministic (the first *ksub* vectors'
    sub-slices), so codebooks — and everything downstream — are
    reproducible."""
    from ray.data.aggregate import Sum

    init, _ = load_query_matrix(ds, list(range(ksub)))
    dim = init.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # (m, ksub, dsub) — subspace s's centroids start as the init rows'
    # s-th slice
    books = np.ascontiguousarray(
        init.reshape(ksub, m, dsub).transpose(1, 0, 2)).copy()

    for _ in range(iters):
        b_ref = ray.put(books)

        def partial(batch: pa.Table) -> pa.Table:
            bks = ray.get(b_ref)
            emb = _normalize(_embedding_matrix(batch))
            n = emb.shape[0]
            sub_cols, cid_cols, dim_cols, s_cols, n_cols = [], [], [], [], []
            for s_i in range(m):
                x = emb[:, s_i * dsub:(s_i + 1) * dsub]
                c = bks[s_i]
                # L2 assignment: argmin |x-c|^2 = argmin |c|^2 - 2 x·c
                d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
                assign = np.argmin(d2, axis=1)
                sums = np.zeros((ksub, dsub))
                np.add.at(sums, assign, x)
                counts = np.bincount(assign, minlength=ksub)
                sub_cols.append(np.full(ksub * dsub, s_i, dtype=np.int32))
                cid_cols.append(np.repeat(
                    np.arange(ksub, dtype=np.int32), dsub))
                dim_cols.append(np.tile(
                    np.arange(dsub, dtype=np.int32), ksub))
                s_cols.append(sums.ravel())
                n_cols.append(np.repeat(counts, dsub))
            return pa.table({
                "sub": pa.array(np.concatenate(sub_cols)),
                "cid": pa.array(np.concatenate(cid_cols)),
                "dim": pa.array(np.concatenate(dim_cols)),
                "s": pa.array(np.concatenate(s_cols), type=pa.float64()),
                "n": pa.array(np.concatenate(n_cols), type=pa.int64()),
            })

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["sub", "cid", "dim"])
               .aggregate(Sum("s", alias_name="s"),
                          Sum("n", alias_name="n"))
               .take_all())  # ksub·dim rows — small by contract
        sums = np.zeros_like(books)
        counts = np.zeros((m, ksub), dtype=np.int64)
        for r in agg:
            sums[r["sub"], r["cid"], r["dim"]] = r["s"]
            if r["dim"] == 0:
                counts[r["sub"], r["cid"]] = r["n"]
        nz = counts > 0
        books[nz] = sums[nz] / counts[nz][:, None]
    return books


def pq_encode(ds: Dataset, codebooks: np.ndarray) -> Dataset:
    """(vec_id, code:list<uint8>) — each vector compressed to *m* bytes
    (its per-subspace nearest-centroid ids). The 100-TB story: a
    float32 768-dim embedding is 3 KB; its m=96 PQ code is 96 bytes —
    a 32× smaller table that ADC scans entirely in memory. Codebooks
    broadcast once via ``ray.put``."""
    m, ksub, dsub = codebooks.shape
    b_ref = ray.put(codebooks)

    class Encode:
        def __init__(self):
            self._b = ray.get(b_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_embedding_matrix(batch))
            n = emb.shape[0]
            codes = np.empty((n, m), dtype=np.uint8)
            for s_i in range(m):
                x = emb[:, s_i * dsub:(s_i + 1) * dsub]
                c = self._b[s_i]
                d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
                codes[:, s_i] = np.argmin(d2, axis=1)
            return pa.table({
                "vec_id": batch["vec_id"],
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), type=pa.uint8()),
                    m).cast(pa.list_(pa.uint8())),
            })

    return ds.map_batches(Encode, batch_format="pyarrow",
                          concurrency=(1, 8))


def pq_topk(ds: Dataset, query_ids: list[int], k: int = 10,
            m: int = 4, ksub: int = 16, iters: int = 3,
            codebooks: np.ndarray | None = None,
            refine: int = 4, concurrency=(1, 8)) -> Dataset:
    """PQ-ADC approximate top-k with exact refinement: every vector
    quantizes to *m* bytes; each query precomputes a (m × ksub) lookup
    table of ``q_sub · centroid`` dots, and a candidate's approximate
    cosine is the sum of its codes' LUT entries — the asymmetric
    distance computation of Jégou et al. 2011, for inner product on
    unit vectors. One streaming pass over the corpus: encode the
    batch, gather LUT entries (vectorized ``take``/sum, no per-row
    Python), emit per-batch top-(refine·k) partials, reduce with the
    shared exact-tie-break merge; the surviving refine·k candidates
    per query are then rescored EXACTLY (one filtered gather + driver
    matmul — the small side by the queries-are-tiny contract). This is
    the standard compressed-scan + refine pipeline: at 100 TB the full
    float vectors are touched only for nq·refine·k candidates, the
    scan itself reads m bytes/vector. ``refine=0`` returns raw ADC
    scores. Approximate by construction → rows-only gate entry; the
    recall pytest pins the clustered-fixture recall vs brute force.
    Output (query_id, rank, vec_id, sim); sim is the exact cosine
    (ADC approximation when refine=0)."""
    if codebooks is None:
        codebooks = train_pq_codebooks(ds, m=m, ksub=ksub, iters=iters)
    m, ksub, dsub = codebooks.shape
    q_mat, qids = load_query_matrix(ds, query_ids)
    # (nq, m, ksub) LUT: query sub-vector · subspace centroid
    lut = np.einsum("qsd,skd->qsk",
                    q_mat.reshape(len(qids), m, dsub), codebooks)
    state = ray.put((codebooks, lut, np.asarray(qids, dtype=np.int64)))
    r_k = max(k, refine * k) if refine else k  # per-batch candidate pool

    class ADCTopK:
        def __init__(self):
            self._b, self._lut, self._qids = ray.get(state)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_embedding_matrix(batch))
            n = emb.shape[0]
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            codes = np.empty((n, m), dtype=np.int64)
            for s_i in range(m):
                x = emb[:, s_i * dsub:(s_i + 1) * dsub]
                c = self._b[s_i]
                d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
                codes[:, s_i] = np.argmin(d2, axis=1)
            # sims[q, i] = Σ_s lut[q, s, codes[i, s]] — gather + sum
            nq = self._lut.shape[0]
            flat = (np.arange(m) * ksub)[None, :] + codes  # (n, m)
            lut2 = self._lut.reshape(nq, m * ksub)
            sims = lut2[:, flat].sum(axis=2)  # (nq, n)
            qid_col, vid_col, sim_col = [], [], []
            kk = min(r_k, n)
            for qi in range(nq):
                top = np.argpartition(-sims[qi], kth=kk - 1)[:kk]
                qid_col.extend([int(self._qids[qi])] * kk)
                vid_col.extend(vids[top].tolist())
                sim_col.extend(sims[qi][top].tolist())
            return pa.table({
                "query_id": pa.array(qid_col, type=pa.int64()),
                "vec_id": pa.array(vid_col, type=pa.int64()),
                "sim": pa.array(sim_col, type=pa.float64()),
            })

    partial = ds.map_batches(ADCTopK, batch_format="pyarrow",
                             concurrency=concurrency)
    adc = partial.groupby("query_id").map_groups(_final_topk(r_k),
                                                 batch_format="pyarrow")
    if not refine:
        return adc
    # exact refinement: nq·refine·k candidate rows — driver-small
    cand = adc.take_all()
    by_q: dict[int, list[int]] = {}
    for r in cand:
        by_q.setdefault(int(r["query_id"]), []).append(int(r["vec_id"]))
    union = sorted({v for vs in by_q.values() for v in vs})
    vs_arr = pa.array(union, type=pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["vec_id"], value_set=vs_arr))

    rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    cand_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    cand_mat = _normalize(np.array([r["embedding"] for r in rows],
                                   dtype=np.float64))
    exact = q_mat @ cand_mat.T  # (nq, |union|)
    qpos = {int(q): i for i, q in enumerate(qids)}
    out_q, out_r, out_v, out_s = [], [], [], []
    for q, vs in sorted(by_q.items()):
        idx = np.searchsorted(cand_ids, np.array(sorted(set(vs)),
                                                 dtype=np.int64))
        sims = exact[qpos[q]][idx]
        vids = cand_ids[idx]
        order = np.lexsort((vids, -sims))[:k]
        for rank, o in enumerate(order.tolist(), 1):
            out_q.append(q)
            out_r.append(rank)
            out_v.append(int(vids[o]))
            out_s.append(float(sims[o]))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "rank": pa.array(out_r, type=pa.int32()),
        "vec_id": pa.array(out_v, type=pa.int64()),
        "sim": pa.array(out_s, type=pa.float64()),
    }))


# ------------------------------------------------- NN-Descent kNN graph


def _eval_pair_sims(cand: Dataset, blobs: Dataset,
                    num_parts: int) -> Dataset:
    """Exact cosine for DISTINCT candidate pairs: joins each side's packed
    unit vector with the groupby-union shuffle (``dedup._attach_blobs``)
    then one vectorized row-wise dot per batch. ``cand`` must be
    duplicate-free — the pair-zip join pairs halves positionally."""
    from .dedup import _attach_blobs

    joined = _attach_blobs(cand, blobs, num_parts=min(num_parts, 4096))

    def dot(batch: pa.Table) -> pa.Table:
        a_ids = batch["id_a"].to_numpy(zero_copy_only=False)
        b_ids = batch["id_b"].to_numpy(zero_copy_only=False)
        if not len(a_ids):
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        va = np.frombuffer(b"".join(batch["blob_a"].to_pylist()),
                           dtype=np.float64).reshape(len(a_ids), -1)
        vb = np.frombuffer(b"".join(batch["blob_b"].to_pylist()),
                           dtype=np.float64).reshape(len(b_ids), -1)
        return pa.table({
            "id_a": pa.array(a_ids, type=pa.int64()),
            "id_b": pa.array(b_ids, type=pa.int64()),
            "sim": pa.array(np.einsum("ij,ij->i", va, vb),
                            type=pa.float64()),
        })

    return joined.map_batches(dot, batch_format="pyarrow")


def _graph_topk_merge(directed: Dataset, k: int,
                      num_parts: int) -> Dataset:
    """(vec_id, neighbor_id, sim) rows → best-k distinct neighbors per
    vec_id with rank 1..k, tie-break (sim desc, neighbor asc). Coarse
    hash partitions + one vectorized segment scan per partition — never
    one Python group per vertex."""
    import pyarrow.compute as pc

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(pc.bit_wise_and(batch["vec_id"], num_parts - 1),
                       pa.int32())
        return batch.append_column("part", part)

    def seg_topk(group: pa.Table) -> pa.Table:
        vid = group["vec_id"].to_numpy(zero_copy_only=False)
        nid = group["neighbor_id"].to_numpy(zero_copy_only=False)
        sim = group["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sim, vid))
        vid, nid, sim = vid[order], nid[order], sim[order]
        # drop duplicate (vec, neighbor) rows — best sim sorts first
        keep = np.ones(len(vid), dtype=bool)
        keep[1:] = (vid[1:] != vid[:-1]) | (nid[1:] != nid[:-1])
        vid, nid, sim = vid[keep], nid[keep], sim[keep]
        # rank within each vec_id segment (rows are already sim-desc)
        new_seg = np.ones(len(vid), dtype=bool)
        new_seg[1:] = vid[1:] != vid[:-1]
        starts = np.flatnonzero(new_seg)
        rank = np.arange(len(vid), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(vid))))
        top = rank < k
        return pa.table({
            "vec_id": pa.array(vid[top], type=pa.int64()),
            "rank": pa.array(rank[top] + 1, type=pa.int64()),
            "neighbor_id": pa.array(nid[top], type=pa.int64()),
            "sim": pa.array(sim[top], type=pa.float64()),
        })

    return (directed.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(seg_topk, batch_format="pyarrow"))


def knn_graph_descent(ds: Dataset, k: int = 5, iters: int = 3,
                      max_degree: int | None = None, seed: int = 0,
                      num_parts: int | None = None) -> Dataset:
    """Approximate kNN graph via distributed NN-Descent (Dong, Moses &
    Li, WWW 2011 — public): start from a deterministic pseudo-random
    k-regular graph, then repeat "a neighbor of a neighbor is probably a
    neighbor" — generate candidate pairs inside each vertex's combined
    forward+reverse neighborhood, score them exactly, and keep each
    vertex's best k. Returns (vec_id, rank, neighbor_id, sim), the same
    schema as :func:`knn_join`, so recall is directly measurable.

    This is the graph-construction scale path past :func:`knn_join`'s
    exact O(N²) compute floor: per-iteration work is O(N·d²) pair
    evaluations (d = ``max_degree``, default 3k) and every step is a
    bounded Ray Data shape — candidate generation is a coarse-partition
    vectorized segment scan (no per-vertex Python groups), pair dedup is
    a ``groupby`` count, scoring joins packed unit vectors through the
    same two-shuffle ``_attach_blobs`` join the LSH verifier uses, and
    the merge is a vectorized per-partition top-k. The graph (N·k rows)
    is materialized between iterations to truncate lineage; the corpus
    itself is never materialized. Reverse-neighborhood hubs are capped
    at ``max_degree`` members by sim rank, bounding skew from popular
    vectors. NN-Descent's incremental new/old flags (which skip
    re-scored pairs) are omitted for statelessness — re-scores are
    wasted compute but never wrong answers.

    Init assumes the repo's dense-id contract (vec_id = 0..N-1, the
    corpus/embeddings reader invariant); refinement itself works on any
    int64 ids. Approximate by nature → rows-only driver check; pytest
    asserts recall ≥ 0.95 vs :func:`knn_join` on a clustered fixture.

    Recall depends on the data's INTRINSIC dimensionality (the NN-Descent
    paper's own caveat): on clustered/manifold data it converges to
    ≈1.0 in a few iterations; on i.i.d. random high-dim vectors (the
    synthetic bench embeddings are exactly that — no neighbor-of-neighbor
    locality exists) it plateaus far below 1 and :func:`knn_join`'s exact
    grid is the only correct answer. Output is deterministic either way:
    seeded init, exact float64 sims, (sim desc, id asc) tie-breaks."""
    from ray.data.aggregate import Count

    from .partitioning import auto_num_parts

    n = ds.count()
    if n <= k + 1:
        return knn_join(ds, k=min(k, max(n - 1, 1)))
    if max_degree is None:
        max_degree = 3 * k
    if num_parts is None:
        num_parts = auto_num_parts(n * k)

    def pack(batch: pa.Table) -> pa.Table:
        emb = _normalize(_embedding_matrix(batch))
        return pa.table({
            "doc_id": batch["vec_id"].cast(pa.int64()),
            "blob": pa.array([row.tobytes() for row in emb],
                             type=pa.binary()),
        })

    blobs = ds.select_columns(["vec_id", "embedding"]).map_batches(
        pack, batch_format="pyarrow")

    stride_mod = max(1, (n - 1) // k)

    def init_pairs(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # per-vertex stride walk: offsets 1 + j*step stay in [1, n-1] and
        # are pairwise distinct, so the k picks are distinct non-self ids
        step = (1 + (vid.astype(np.uint64) * np.uint64(2654435761)
                     + np.uint64(seed)) % np.uint64(stride_mod)
                ).astype(np.int64)
        offs = 1 + np.arange(k, dtype=np.int64)[None, :] * step[:, None]
        nbr = (vid[:, None] + offs) % n
        a = np.repeat(vid, k)
        b = nbr.ravel()
        return pa.table({
            "id_a": pa.array(np.minimum(a, b), type=pa.int64()),
            "id_b": pa.array(np.maximum(a, b), type=pa.int64()),
        })

    def distinct(pairs: Dataset) -> Dataset:
        return (pairs.groupby(["id_a", "id_b"])
                .aggregate(Count(alias_name="n_src"))
                .select_columns(["id_a", "id_b"]))

    def both_directions(edges: Dataset) -> Dataset:
        def flip(batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            s = batch["sim"].to_numpy(zero_copy_only=False)
            return pa.table({
                "vec_id": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate([b, a]),
                                        type=pa.int64()),
                "sim": pa.array(np.concatenate([s, s]), type=pa.float64()),
            })
        return edges.map_batches(flip, batch_format="pyarrow")

    from .dedup import _segment_index_pairs

    def neighborhood_pairs(graph: Dataset) -> Dataset:
        """Candidates: all member pairs inside each pivot's fwd+rev
        neighborhood, hub-capped at max_degree members by sim rank."""

        def incidence(batch: pa.Table) -> pa.Table:
            v = batch["vec_id"].to_numpy(zero_copy_only=False)
            u = batch["neighbor_id"].to_numpy(zero_copy_only=False)
            s = batch["sim"].to_numpy(zero_copy_only=False)
            pivot = np.concatenate([v, u])
            member = np.concatenate([u, v])
            part = (pivot & (num_parts - 1)).astype(np.int32)
            return pa.table({
                "part": pa.array(part),
                "pivot": pa.array(pivot, type=pa.int64()),
                "member": pa.array(member, type=pa.int64()),
                "sim": pa.array(np.concatenate([s, s]), type=pa.float64()),
            })

        def gen(group: pa.Table) -> pa.Table:
            piv = group["pivot"].to_numpy(zero_copy_only=False)
            mem = group["member"].to_numpy(zero_copy_only=False)
            sim = group["sim"].to_numpy(zero_copy_only=False)
            order = np.lexsort((mem, -sim, piv))
            piv, mem = piv[order], mem[order]
            # dedup (pivot, member) — u in fwd(v) and v in fwd(u) both
            # put u in v's group
            keep = np.ones(len(piv), dtype=bool)
            keep[1:] = (piv[1:] != piv[:-1]) | (mem[1:] != mem[:-1])
            piv, mem = piv[keep], mem[keep]
            # hub cap: best max_degree members per pivot by sim rank
            new_seg = np.ones(len(piv), dtype=bool)
            new_seg[1:] = piv[1:] != piv[:-1]
            starts = np.flatnonzero(new_seg)
            rank = np.arange(len(piv), dtype=np.int64) - np.repeat(
                starts, np.diff(np.append(starts, len(piv))))
            top = rank < max_degree
            piv, mem = piv[top], mem[top]
            sort2, ia, ib = _segment_index_pairs(
                np.zeros(len(piv), dtype=np.int64), piv, mem, None)
            mem = mem[sort2]
            return pa.table({
                "id_a": pa.array(mem[ia], type=pa.int64()),
                "id_b": pa.array(mem[ib], type=pa.int64()),
            })

        return (graph.map_batches(incidence, batch_format="pyarrow")
                .groupby("part").map_groups(gen, batch_format="pyarrow"))

    init = ds.select_columns(["vec_id"]).map_batches(
        init_pairs, batch_format="pyarrow")
    # round discipline: bound the block count at every materialize
    # boundary — the per-round union otherwise grows blocks linearly
    # and per-block task overhead dominates (the connected-components
    # lesson, NOTES r4)
    graph = _graph_topk_merge(
        both_directions(_eval_pair_sims(distinct(init), blobs, num_parts)),
        k, num_parts).repartition(num_parts).materialize()

    for _ in range(iters):
        cand = distinct(neighborhood_pairs(graph))
        new_edges = both_directions(_eval_pair_sims(cand, blobs, num_parts))
        graph = _graph_topk_merge(
            graph.select_columns(["vec_id", "neighbor_id", "sim"])
            .union(new_edges), k, num_parts).repartition(
                num_parts).materialize()

    return graph.sort(["vec_id", "rank"])


def write_graph_index(graph: Dataset, out_dir: str,
                      num_buckets: int = 64) -> str:
    """Persist a kNN graph hash-partitioned by ``vec_id`` so beam-search
    hops become PRUNED file reads instead of full-graph ``is_in`` scans
    (VERDICT r3 #7 — the postings term-pushdown pattern applied to
    adjacency). Layout: ``out_dir/bucket=<b>/*.parquet`` with (vec_id,
    neighbor_id), ``bucket = vec_id & (num_buckets-1)``; the graph is
    globally sorted by vec_id first so each bucket holds few files and
    Parquet row-group min/max stats prune within them. ``_meta.json``
    records num_buckets (the ``_`` prefix keeps it out of dataset
    discovery). Per hop the searcher opens only the frontier's buckets:
    O(frontier) reads, independent of graph size."""
    import json
    import os

    graph = (graph.select_columns(["vec_id", "neighbor_id"])
             .sort("vec_id"))
    mask = num_buckets - 1

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["vec_id"].to_numpy(zero_copy_only=False)
             & mask).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    (graph.map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["bucket"]))
    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets}, f)
    return out_dir


def write_vector_index(ds: Dataset, out_dir: str,
                       num_buckets: int = 64) -> str:
    """Persist (vec_id, embedding) hash-partitioned by vec_id — the
    vector-side mirror of :func:`write_graph_index`, so beam-search
    candidate GATHERS are pruned reads of the candidates' buckets
    instead of full-table scans per hop. Same layout contract:
    ``out_dir/bucket=<b>/*.parquet``, vec_id-sorted within buckets,
    ``_meta.json`` with num_buckets."""
    import json
    import os

    ds = ds.select_columns(["vec_id", "embedding"]).sort("vec_id")
    mask = num_buckets - 1

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["vec_id"].to_numpy(zero_copy_only=False)
             & mask).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    (ds.map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["bucket"]))
    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets}, f)
    return out_dir


def max_indexed_vec_id(vdir: str) -> int:
    """Largest vec_id in a :func:`write_vector_index` layout, from
    parquet FOOTER statistics only (no data pages read) — the
    collision-check anchor for :func:`extend_vector_index`. -1 for an
    empty layout."""
    import os

    import pyarrow.parquet as pq

    best = -1
    for bd in os.listdir(vdir):
        if not bd.startswith("bucket="):
            continue
        full = os.path.join(vdir, bd)
        for fn in os.listdir(full):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(full, fn)).metadata
            idx = md.schema.to_arrow_schema().get_field_index("vec_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    best = max(best, int(st.max))
    return best


def extend_vector_index(vdir: str, ds: Dataset) -> str:
    """Append NEW vectors to an existing :func:`write_vector_index`
    layout — the ANN mirror of the inverted index's LSM ``extend``:
    fresh parquet files land inside the existing ``bucket=`` partitions
    (existing files untouched, so a crash mid-extend leaves the old
    index readable), and every pruned read
    (:func:`_read_vectors_indexed`, beam-search candidate gathers)
    spans old and new files transparently via the hive dataset scan.

    Ids must be strictly greater than everything already indexed (the
    id-ceiling contract the inverted index uses): the ceiling comes
    from one footer-statistics scan and the NEW ids' minimum is checked
    in a separate pass BEFORE the write starts — a streaming per-batch
    guard alone could let non-violating blocks land before a violating
    block raised, leaving a half-extended layout. (The per-batch guard
    stays as a belt against a mutated input between the two passes.)"""
    import json
    import os

    with open(os.path.join(vdir, "_meta.json")) as f:
        num_buckets = json.load(f)["num_buckets"]
    mask = num_buckets - 1
    ceiling = max_indexed_vec_id(vdir)

    ds = (ds.select_columns(["vec_id", "embedding"])
          .sort("vec_id").materialize())
    new_min = ds.min("vec_id")
    if new_min is not None and int(new_min) <= ceiling:
        raise ValueError(
            f"extend_vector_index: new vec_id {int(new_min)} is not "
            f"above the indexed ceiling {ceiling} — ids must be fresh "
            "(the id-ceiling contract); nothing was written")

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(v) and int(v.min()) <= ceiling:
            raise ValueError(
                f"extend_vector_index: new vec_id {int(v.min())} is not "
                f"above the indexed ceiling {ceiling} — ids must be "
                "fresh (the id-ceiling contract)")
        b = (v & mask).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    (ds.map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(vdir, partition_cols=["bucket"]))
    return vdir


def _read_vectors_indexed(vdir: str, ids: list[int]) -> pa.Table:
    """Pruned (vec_id, embedding) read from a :func:`write_vector_index`
    layout: only the ids' buckets are opened, vec_id row-group stats
    prune within them — O(len(ids)) read volume, not O(table)."""
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    with open(os.path.join(vdir, "_meta.json")) as f:
        mask = json.load(f)["num_buckets"] - 1
    vs = pa.array(sorted(ids), type=pa.int64())
    bks = sorted({int(v) & mask for v in ids})
    return pads.dataset(vdir, partitioning="hive").to_table(
        filter=pc.field("bucket").isin(bks) & pc.field("vec_id").isin(vs),
        columns=["vec_id", "embedding"])


def graph_search_topk(ds, graph, query_ids: list[int],
                      k: int = 10, ef: int = 32, num_hops: int = 4,
                      concurrency=(1, 8)) -> Dataset:
    """Beam search over a prebuilt kNN graph (the query-time half of a
    graph-based ANN index, HNSW's search layer without the hierarchy —
    Malkov & Yashunin 2016's search loop in batch form): seed each
    query at its own node, repeatedly gather the frontier's graph
    neighbors, score them exactly against the query vectors, and keep
    the best ``ef`` per query; answer is the beam's top *k*. Output
    (query_id, rank, vec_id, sim) — same schema/tie-break as
    :func:`brute_force_topk`, so recall is directly measurable.

    Division of labor at scale: per-query beam state is O(ef) and
    queries are few (the same "queries are tiny" contract as
    :func:`load_query_matrix`), so beams/visited sets live on the
    driver; the DATA-proportional work — gathering frontier adjacency
    and scoring candidate vectors — runs distributed. *graph* may be a
    Dataset (adjacency gathered by streaming ``is_in`` scans over the
    materialized graph) or a PATH written by :func:`write_graph_index`
    — then each hop opens only the frontier's ``bucket=`` partitions
    with a vec_id row-group filter: **O(frontier) pruned reads,
    independent of graph size** (VERDICT r3 #7). *ds* may likewise be
    a Dataset (candidates scored by a distributed scan) or a PATH
    written by :func:`write_vector_index` — then each hop's candidate
    gather is an O(candidates) pruned read + one driver matmul
    (candidates ≤ nq·frontier·k, the small side by contract). All
    mode combinations return identical results (pytest-pinned). For
    query sets that are
    themselves datasets, the pairing must move into the
    ``_attach_blobs`` join (the :func:`knn_graph_descent` machinery)
    instead of a driver beam per query.

    Recall follows the GRAPH's quality: on a :func:`knn_join`-exact or
    well-converged NN-Descent graph over clustered data it is ≈1.0 in
    a few hops; on a weak graph the beam inherits its blind spots."""
    import pyarrow.compute as pc

    if isinstance(ds, str):
        qtbl = _read_vectors_indexed(ds, query_ids)
        qtbl = qtbl.take(pc.sort_indices(qtbl["vec_id"]))
        q_mat = _normalize(_embedding_matrix(qtbl))
        qids = qtbl["vec_id"].to_pylist()
    else:
        q_mat, qids = load_query_matrix(ds, query_ids)
    nq = len(qids)

    def _adj_from_table(tbl: pa.Table) -> dict[int, list[int]]:
        vids = tbl["vec_id"].to_numpy(zero_copy_only=False)
        nbrs = tbl["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(vids, kind="stable")
        vids, nbrs = vids[order], nbrs[order]
        adj: dict[int, list[int]] = {}
        if len(vids):
            first = np.ones(len(vids), dtype=bool)
            first[1:] = vids[1:] != vids[:-1]
            starts = np.flatnonzero(first)
            ends = np.append(starts[1:], len(vids))
            for s, e in zip(starts.tolist(), ends.tolist()):
                adj[int(vids[s])] = nbrs[s:e].tolist()
        return adj

    if isinstance(graph, str):
        import json
        import os

        import pyarrow.dataset as pads

        with open(os.path.join(graph, "_meta.json")) as f:
            nb_mask = json.load(f)["num_buckets"] - 1
        gdset = pads.dataset(graph, partitioning="hive")

        def gather_neighbors(node_ids: list[int]) -> dict[int, list[int]]:
            vs = pa.array(sorted(node_ids), type=pa.int64())
            bks = sorted({int(v) & nb_mask for v in node_ids})
            tbl = gdset.to_table(
                filter=(pc.field("bucket").isin(bks)
                        & pc.field("vec_id").isin(vs)),
                columns=["vec_id", "neighbor_id"])
            return _adj_from_table(tbl)
    else:
        adj_src = graph.select_columns(
            ["vec_id", "neighbor_id"]).materialize()

        def gather_neighbors(node_ids: list[int]) -> dict[int, list[int]]:
            vs = pa.array(sorted(node_ids), type=pa.int64())

            def keep(batch: pa.Table) -> pa.Table:
                return batch.filter(pc.is_in(batch["vec_id"],
                                             value_set=vs))

            rows = adj_src.map_batches(
                keep, batch_format="pyarrow").take_all()
            if not rows:
                return {}
            return _adj_from_table(pa.table({
                "vec_id": pa.array([r["vec_id"] for r in rows],
                                   type=pa.int64()),
                "neighbor_id": pa.array([r["neighbor_id"] for r in rows],
                                        type=pa.int64())}))

    if isinstance(ds, str):
        # vector-index mode: gather ONLY the candidates' buckets (a
        # pruned O(candidates) read — candidates per hop are bounded by
        # nq·frontier·k, the small side by contract) and score with one
        # driver matmul; same float64 expression as the scan mode
        def score_union(cand_ids: list[int]
                        ) -> dict[tuple[int, int], float]:
            tbl = _read_vectors_indexed(ds, cand_ids)
            if tbl.num_rows == 0:
                return {}
            emb = _normalize(_embedding_matrix(tbl))
            vids = tbl["vec_id"].to_numpy(zero_copy_only=False)
            sims = q_mat @ emb.T
            return {(i, int(v)): float(sims[i, j])
                    for j, v in enumerate(vids.tolist())
                    for i in range(nq)}

        return _beam_loop(q_mat, qids, gather_neighbors, score_union,
                          k, ef, num_hops)

    q_ref = ray.put(q_mat)

    def score_union(cand_ids: list[int]) -> dict[tuple[int, int], float]:
        vs = pa.array(sorted(cand_ids), type=pa.int64())

        class Score:
            def __init__(self):
                self._q = ray.get(q_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                batch = batch.filter(pc.is_in(batch["vec_id"],
                                              value_set=vs))
                if batch.num_rows == 0:
                    return pa.table({
                        "qidx": pa.array([], type=pa.int32()),
                        "vec_id": pa.array([], type=pa.int64()),
                        "sim": pa.array([], type=pa.float64())})
                emb = _normalize(_embedding_matrix(batch))
                vids = batch["vec_id"].to_numpy(zero_copy_only=False)
                sims = self._q @ emb.T  # (#queries, #cands-in-batch)
                m = sims.shape[1]
                return pa.table({
                    "qidx": pa.array(np.repeat(
                        np.arange(sims.shape[0], dtype=np.int32), m)),
                    "vec_id": pa.array(np.tile(vids, sims.shape[0]),
                                       type=pa.int64()),
                    "sim": pa.array(sims.ravel(), type=pa.float64()),
                })

        rows = ds.map_batches(Score, batch_format="pyarrow",
                              concurrency=concurrency).take_all()
        return {(int(r["qidx"]), int(r["vec_id"])): float(r["sim"])
                for r in rows}

    return _beam_loop(q_mat, qids, gather_neighbors, score_union,
                      k, ef, num_hops)


def _beam_loop(q_mat, qids, gather_neighbors, score_union,
               k: int, ef: int, num_hops: int) -> Dataset:
    """The shared beam iteration of :func:`graph_search_topk` — both
    adjacency modes and both scoring modes feed the same loop, so the
    two layouts are trivially result-identical."""
    nq = len(qids)
    # driver beam state: O(nq · ef) — the small side by contract
    beams: list[dict[int, float]] = [
        {int(qids[i]): float(q_mat[i] @ q_mat[i])} for i in range(nq)]
    visited: list[set[int]] = [{int(qids[i])} for i in range(nq)]
    frontier: list[list[int]] = [[int(qids[i])] for i in range(nq)]

    for _ in range(num_hops):
        nodes = sorted({n for f in frontier for n in f})
        if not nodes:
            break
        adj = gather_neighbors(nodes)
        cand: list[list[int]] = []
        for i in range(nq):
            want = {nb for n in frontier[i] for nb in adj.get(n, [])}
            cand.append(sorted(want - visited[i]))
        union = sorted({c for cs in cand for c in cs})
        if not union:
            break
        sims = score_union(union)
        for i in range(nq):
            for c in cand[i]:
                s = sims.get((i, c))
                if s is None:
                    # graph references a vec_id absent from ds (graph
                    # built from a different/filtered corpus) — a
                    # contract violation, not a KeyError (ADVICE r3)
                    raise ValueError(
                        f"graph neighbor vec_id={c} is not present in the "
                        "vector dataset — the kNN graph must be built from "
                        "the same corpus being searched")
                beams[i][c] = s
                visited[i].add(c)
            # trim to ef by (sim desc, id asc); new frontier = the
            # newly-scored nodes that survived the trim
            order = sorted(beams[i].items(), key=lambda t: (-t[1], t[0]))
            beams[i] = dict(order[:ef])
            frontier[i] = [c for c in cand[i] if c in beams[i]]

    qid_col, rank_col, vid_col, sim_col = [], [], [], []
    for i in range(nq):
        order = sorted(beams[i].items(), key=lambda t: (-t[1], t[0]))[:k]
        for r, (vid, s) in enumerate(order, 1):
            qid_col.append(int(qids[i]))
            rank_col.append(r)
            vid_col.append(vid)
            sim_col.append(s)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "query_id": pa.array(qid_col, type=pa.int64()),
        "rank": pa.array(rank_col, type=pa.int32()),
        "vec_id": pa.array(vid_col, type=pa.int64()),
        "sim": pa.array(sim_col, type=pa.float64()),
    }))


def mmr_topk(ds: Dataset, query_ids: list[int], k: int = 10,
             pool: int = 50, lam: float = 0.7) -> Dataset:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): greedily pick argmax over the remaining pool
    of ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)`` — relevance
    traded against redundancy, the standard rerank for dedup-aware
    retrieval and kNN-prompt diversity.

    Output (query_id, rank, vec_id), rank 1-based; per-step tie-break
    (score desc, vec_id asc).

    Shape: candidate generation is the EXACT distributed cosine
    top-``pool`` (:func:`brute_force_topk`); the greedy selection runs
    driver-side over the tiny pool — O(pool²) per query under the
    "queries are tiny" contract, with one pruned vector gather for the
    pool's pairwise sims (never a corpus-wide pass). ``lam=1.0``
    degenerates to plain cosine top-k EXACTLY (the redundancy term is
    multiplied by zero and the selection order is the same (sim desc,
    vec_id asc) fold), so the lambda-1 configuration shares the
    brute-force oracle on the value-exact gate.

    Caveat at exactly ``lam=0.5`` with the query point in its own
    pool: after the query is picked first, every remaining score is
    0.5·(rel − sim-to-query) ≡ 0 up to summation order, so the
    selection degenerates to the vec_id tie-break over floating
    noise — prefer any other lambda (or pre-filter the query id) when
    the ordering itself matters downstream."""
    import ray.data as rd
    if pool < k:
        raise ValueError("mmr_topk: pool must be >= k")
    cand = brute_force_topk(ds, query_ids, k=pool).take_all()
    by_q: dict[int, list] = {}
    for r in cand:
        by_q.setdefault(r["query_id"], []).append(r)
    all_ids = sorted({r["vec_id"] for r in cand})
    mat, ids = load_query_matrix(ds, all_ids)
    idx = {v: i for i, v in enumerate(ids)}
    out_q: list[int] = []
    out_rank: list[int] = []
    out_vid: list[int] = []
    for qid in sorted(by_q):
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        cids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        rel = np.array([r["sim"] for r in rows], dtype=np.float64)
        v = mat[[idx[c] for c in cids]]
        pair = v @ v.T
        remaining = np.arange(len(cids))
        selected: list[int] = []
        while len(remaining) and len(selected) < k:
            score = lam * rel[remaining]
            if selected:
                score = score - (1.0 - lam) * pair[
                    np.ix_(remaining, selected)].max(axis=1)
            order = np.lexsort((cids[remaining], -score))
            pick = remaining[order[0]]
            selected.append(int(pick))
            remaining = remaining[remaining != pick]
        out_q.extend([int(qid)] * len(selected))
        out_rank.extend(range(1, len(selected) + 1))
        out_vid.extend(int(cids[s]) for s in selected)
    return rd.from_arrow(pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "rank": pa.array(out_rank, type=pa.int32()),
        "vec_id": pa.array(out_vid, type=pa.int64()),
    }))


def semantic_dedup_pairs(ds: Dataset, threshold: float,
                         n_clusters: int = 8, iters: int = 3,
                         chunk: int = 4096) -> Dataset:
    """SemDeDup candidate pairs (Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication"):
    k-means-cluster the embeddings, then emit all (id_a < id_b) pairs
    with cosine >= threshold WITHIN each cluster — O(N^2 / k) work
    instead of O(N^2), at the cost of missing cross-cluster pairs
    (the published algorithm's own approximation; recall vs the exact
    sweep is pytest-bounded on the clustered fixture).

    ``n_clusters=1`` degenerates EXACTLY to the global
    :func:`embedding_near_dup_pairs` sweep (every pair is
    within-cluster) — the exactness-configuration gate.

    Shape: one Lloyd training pass (:func:`train_centroids`, cluster-
    side reduce), one assignment ``map_batches`` (centroid matrix
    broadcast once via ``ray.put``), then ``groupby(cid)`` with a
    double-chunked upper-triangle matmul per cluster (peak memory
    O(chunk^2) regardless of cluster size). Skew note: a hot cluster
    still costs O(cell^2) multiplies in one task — the exact operator's
    triangle-inequality block pruning is the remedy when clusters
    collapse; cap cluster skew upstream if a corpus degenerates."""
    if n_clusters == 1:
        return embedding_near_dup_pairs(ds, threshold)

    cents = train_centroids(ds, n_centroids=n_clusters, iters=iters)
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        emb = _normalize(_embedding_matrix(batch))
        cid = np.argmax(emb @ c.T, axis=1).astype(np.int32)
        return pa.table({
            "vec_id": batch["vec_id"],
            "embedding": batch["embedding"],
            "cid": pa.array(cid),
        })

    def pairs(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(_embedding_matrix(group))
        order = np.argsort(ids)
        ids, emb = ids[order], emb[order]
        n = len(ids)
        out_a, out_b = [], []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            for t in range(s, n, chunk):
                te = min(t + chunk, n)
                sims = emb[s:e] @ emb[t:te].T
                ii, jj = np.nonzero(sims >= threshold)
                gi, gj = ii + s, jj + t
                m = gi < gj
                if m.any():
                    out_a.append(ids[gi[m]])
                    out_b.append(ids[gj[m]])
        if not out_a:
            z = pa.array([], type=pa.int64())
            return pa.table({"id_a": z, "id_b": z})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cid")
            .map_groups(pairs, batch_format="pyarrow"))


def semantic_dedup(ds: Dataset, threshold: float, n_clusters: int = 8,
                   iters: int = 3, chunk: int = 4096) -> Dataset:
    """(vec_id, component, keep) — full SemDeDup: within-cluster
    near-dup pairs -> connected components (min-id canonical, the
    dedup_clusters convention) -> ``keep = 1`` for the canonical
    exemplar of each duplicate group, 0 for the rest. Downstream
    filters on ``keep = 1`` to deduplicate semantically.

    ``n_clusters=1`` makes the pair set exact, so the whole output is
    value-exact vs a near-dup-pairs + recursive-closure SQL oracle."""
    from .graph import connected_components

    edges = semantic_dedup_pairs(ds, threshold, n_clusters=n_clusters,
                                 iters=iters, chunk=chunk)
    comp = connected_components(ds.select_columns(["vec_id"]), edges,
                                node_col="vec_id")

    def add_keep(batch: pa.Table) -> pa.Table:
        node = batch["vec_id"].to_numpy(zero_copy_only=False)
        lab = batch["component"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(node, type=pa.int64()),
            "component": pa.array(lab, type=pa.int64()),
            "keep": pa.array((node == lab).astype(np.int64)),
        })

    return comp.map_batches(add_keep, batch_format="pyarrow")


def topk_recall(approx: Dataset | pa.Table,
                exact: Dataset | pa.Table) -> pa.Table:
    """Per-query recall of an approximate top-k result against the
    exact one — the evaluation loop every approximate ANN config
    (IVF nprobe, PQ refine, beam ef/hops, LSH bands) is tuned with.
    Inputs are two (query_id, rank, vec_id[, ...]) result sets (any
    of this module's top-k outputs); output is
    ``(query_id, n_hits, n_exact, recall)`` ordered by query_id plus
    the convention that recall is measured against the EXACT set's
    size (an approximate result with extra rows cannot exceed 1.0).

    Distributed shape: both sides project to fixed-width (query_id,
    vec_id, side) rows, one coarse query-hash groupby intersects
    per query — queries are the tiny side by the module's standing
    contract, so the result is a driver-friendly table."""
    import ray.data as rd

    def rows(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            q = batch["query_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "part": pa.array((q % 64).astype(np.int32)),
                "query_id": pa.array(q.astype(np.int64)),
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "side": pa.array(np.full(len(q), side, dtype=np.int8)),
            })
        return fn

    def to_ds(x) -> Dataset:
        return rd.from_arrow(x) if isinstance(x, pa.Table) else x

    def intersect(group: pa.Table) -> pa.Table:
        q = group["query_id"].to_numpy(zero_copy_only=False)
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        s = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, v, q))
        q, v, s = q[order], v[order], s[order]
        # a (q, v) present on both sides becomes two adjacent rows
        both = np.zeros(len(q), dtype=bool)
        if len(q) > 1:
            both[1:] = ((q[1:] == q[:-1]) & (v[1:] == v[:-1])
                        & (s[1:] != s[:-1]))
        uq, inv = np.unique(q, return_inverse=True)
        hits = np.bincount(inv[both], minlength=uq.size)
        n_exact = np.bincount(inv[s == 1], minlength=uq.size)
        if (n_exact == 0).any():
            raise ValueError(
                "query present in the approximate result but missing "
                "from the exact result — the two result sets cover "
                "different query sets")
        return pa.table({
            "query_id": pa.array(uq, type=pa.int64()),
            "n_hits": pa.array(hits.astype(np.int64)),
            "n_exact": pa.array(n_exact.astype(np.int64)),
            "recall": pa.array(hits / n_exact),
        })

    out = (to_ds(approx).map_batches(rows(0), batch_format="pyarrow")
           .union(to_ds(exact).map_batches(rows(1),
                                           batch_format="pyarrow"))
           .groupby("part")
           .map_groups(intersect, batch_format="pyarrow"))
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")
         if b.num_rows]
        or [pa.table({"query_id": pa.array([], type=pa.int64()),
                      "n_hits": pa.array([], type=pa.int64()),
                      "n_exact": pa.array([], type=pa.int64()),
                      "recall": pa.array([], type=pa.float64())})])
    import pyarrow.compute as pc
    return tbl.take(pc.sort_indices(tbl["query_id"]))
