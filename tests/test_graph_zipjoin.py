"""Broadcast vs zip-join ("dataset") state-mode parity for the
iterative graph family (VERDICT r4 "what's wrong" #1).

The dataset mode exists for graphs past the ~10^8-node driver-state
bound; these fixtures obviously can't reach that, so parity is pinned
on fixtures LARGER than the per-group batch size (multiple partitions,
multi-block state, skewed degrees) and on every semantic wrinkle the
broadcast mode carries (weights, flat teleport, directedness,
multigraph votes, unreachable nodes). Scores must be BIT-identical —
both modes run the same per-dst ordered/commutative folds.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.graph import (
    bfs_hops, hits, kcore, label_propagation, pagerank, shortest_paths)


@pytest.fixture(scope="module")
def graph(ray_session):
    rng = np.random.default_rng(42)
    n, e = 3000, 60000
    src = rng.integers(0, n, e).astype(np.int64)
    # skew: 10% of edges hit a single hub (the hot-key shape)
    hub = rng.random(e) < 0.1
    dst = np.where(hub, 17, rng.integers(0, n, e)).astype(np.int64)
    w = rng.integers(1, 7, e).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))
    return n, edges


def _same(a: pa.Table, b, cols):
    bt = b.to_pandas()
    at = a.to_pandas() if hasattr(a, "to_pandas") else a
    assert len(at) == len(bt)
    for c in cols:
        av = at[c].to_numpy()
        bv = bt[c].to_numpy()
        assert av.dtype == bv.dtype, c
        assert (av == bv).all(), c


def test_pagerank_modes_bit_identical(graph):
    n, edges = graph
    b = pagerank(edges, n, iters=3)
    d = pagerank(edges, n, iters=3, state_mode="dataset")
    _same(b, d, ["node", "pagerank"])


def test_pagerank_weighted_flat_teleport(graph):
    n, edges = graph
    b = pagerank(edges, n, iters=2, weight_col="w", flat_teleport=True)
    d = pagerank(edges, n, iters=2, weight_col="w", flat_teleport=True,
                 state_mode="dataset")
    _same(b, d, ["node", "pagerank"])


def test_hits_modes_bit_identical(graph):
    n, edges = graph
    b = hits(edges, n, iters=2)
    d = hits(edges, n, iters=2, state_mode="dataset")
    _same(b, d, ["node", "hub", "authority"])


@pytest.mark.parametrize("directed", [False, True])
def test_label_propagation_modes(graph, directed):
    n, edges = graph
    b = label_propagation(edges, n, iters=3, directed=directed)
    d = label_propagation(edges, n, iters=3, directed=directed,
                          state_mode="dataset")
    _same(b, d, ["node", "label"])


@pytest.mark.parametrize("directed", [False, True])
def test_bfs_modes(graph, directed):
    n, edges = graph
    b = bfs_hops(edges, n, sources=[3, 99], directed=directed,
                 max_hops=5)
    d = bfs_hops(edges, n, sources=[3, 99], directed=directed,
                 max_hops=5, state_mode="dataset")
    _same(b, d, ["node", "hops"])


def test_shortest_paths_modes(graph):
    n, edges = graph
    b = shortest_paths(edges, n, sources=[3], rounds=6, weight_col="w")
    d = shortest_paths(edges, n, sources=[3], rounds=6, weight_col="w",
                       state_mode="dataset")
    _same(b, d, ["node", "dist"])


@pytest.mark.parametrize("k", [3, 25])
def test_kcore_modes(graph, k):
    n, edges = graph
    b = kcore(edges, n, k=k)
    d = kcore(edges, n, k=k, state_mode="dataset")
    _same(b, d, ["node"])


def test_unknown_state_mode_raises(graph):
    n, edges = graph
    with pytest.raises(ValueError, match="state_mode"):
        pagerank(edges, n, state_mode="mystery")


def test_dataset_mode_rejects_foreign_ids(ray_session):
    edges = rd.from_arrow(pa.table({
        "src": pa.array([0, 5], type=pa.int64()),
        "dst": pa.array([1, 9], type=pa.int64()),
    }))
    with pytest.raises(Exception, match="node"):
        pagerank(edges, 4, state_mode="dataset").to_pandas()


# -- alternating-star connected components (r5) ------------------------


def _uf_labels(n, pairs):
    p = list(range(n))

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            p[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])


def _cc_pair(n, pairs, **kw):
    from ts_type_filter_ray.functions.graph import connected_components
    nodes = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64))}))
    edges = rd.from_arrow(pa.table({
        "id_a": pa.array(np.array([a for a, b in pairs],
                                  dtype=np.int64)),
        "id_b": pa.array(np.array([b for a, b in pairs],
                                  dtype=np.int64))}))
    got = (connected_components(nodes, edges, algorithm="star", **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == n
    assert (got["component"].to_numpy() == _uf_labels(n, pairs)).all()


def test_star_cc_random(ray_session):
    rng = np.random.default_rng(7)
    pairs = ([(i, i + 1) for i in range(0, 40, 2)]
             + [(int(rng.integers(0, 200)), int(rng.integers(0, 200)))
                for _ in range(150)])
    _cc_pair(220, pairs)


def test_star_cc_long_chain(ray_session):
    # the diameter-bound killer: min-label needs one round per hop
    # (400 here); the star variant converges in O(log n)
    _cc_pair(420, [(i, i + 1) for i in range(400)])


def test_star_cc_loops_dups_cliques(ray_session):
    _cc_pair(30, [(5, 5), (1, 2), (2, 1), (1, 2), (10, 11)])
    pairs = ([(a, b) for a in range(10) for b in range(a + 1, 10)]
             + [(a, b) for a in range(30, 40) for b in range(a + 1, 40)])
    _cc_pair(50, pairs)


def test_star_cc_matches_minlabel(ray_session):
    from ts_type_filter_ray.functions.graph import connected_components
    rng = np.random.default_rng(11)
    n = 300
    pairs = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(200)]
    nodes = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64))}))
    edges = rd.from_arrow(pa.table({
        "id_a": pa.array(np.array([a for a, b in pairs],
                                  dtype=np.int64)),
        "id_b": pa.array(np.array([b for a, b in pairs],
                                  dtype=np.int64))}))
    a = (connected_components(nodes, edges)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (connected_components(nodes, edges, algorithm="star")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (a["component"].to_numpy() == b["component"].to_numpy()).all()


def test_auto_state_mode(graph):
    from ts_type_filter_ray.functions.graph import _resolve_state_mode
    n, edges = graph
    # below the threshold auto = broadcast (pa.Table result)
    out = pagerank(edges, n, iters=1, state_mode="auto")
    assert isinstance(out, pa.Table)
    assert _resolve_state_mode("auto", 10 ** 9) == "dataset"
    with pytest.raises(ValueError, match="auto"):
        pagerank(edges, n, state_mode="typo")
