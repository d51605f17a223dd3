"""Sorted-neighborhood blocking: naive-reference parity (incl. skewed
and duplicate keys), halo-boundary exactness, rank correctness."""

import random

import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.blocking import (
    global_ranks, sorted_neighborhood_pairs)


def _ds(keys):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(keys)), type=pa.int64()),
        "bkey": pa.array(keys),
    }))


def naive(keys, w):
    ranked = sorted(range(len(keys)), key=lambda i: (keys[i], i))
    rk = {i: p + 1 for p, i in enumerate(ranked)}
    out = []
    for i in range(len(keys)):
        for j in range(len(keys)):
            if 0 < rk[j] - rk[i] <= w:
                out.append((i, j, rk[i], rk[j]))
    return sorted(out)


def _run(keys, w, **kw):
    rows = sorted_neighborhood_pairs(_ds(keys), "bkey", window=w,
                                     **kw).take_all()
    return [(r["id_a"], r["id_b"], r["rank_a"], r["rank_b"])
            for r in rows]


def test_golden(ray_session):
    keys = ["banana", "apple", "apricot", "cherry", "banana"]
    assert _run(keys, 2) == naive(keys, 2)


def test_duplicate_and_skewed_keys(ray_session):
    # one key value dominating: ranks tie-break by id, pairs exact
    keys = ["same"] * 20 + ["aaa", "zzz"]
    for w in (1, 3):
        assert _run(keys, w) == naive(keys, w)


def test_fuzz_parity(ray_session):
    rng = random.Random(3)
    for w in (1, 2, 5):
        keys = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 12)))
                for _ in range(80)]
        assert _run(keys, w, num_parts=16) == naive(keys, w)


def test_window_larger_than_corpus(ray_session):
    keys = ["b", "a", "c"]
    assert _run(keys, 10) == naive(keys, 10)


def test_long_shared_prefixes(ray_session):
    # keys identical in the first 8 packed bytes: the full-key local
    # sort must resolve them (they co-locate in one part by bounds)
    keys = [f"prefix-shared-{i:03d}" for i in (5, 1, 9, 3, 7)]
    assert _run(keys, 2) == naive(keys, 2)


def test_non_ascii_byte_order(ray_session):
    # utf-8 byte order ≡ codepoint order: packed prefixes with the
    # high bit set must not wrap negative
    keys = ["zebra", "ångström", "東京", "apple", "ümlaut"]
    assert _run(keys, 2) == naive(keys, 2)


def test_global_ranks_values(ray_session):
    keys = ["b", "a", "a", "c"]
    rows = {r["id"]: r["rank"]
            for r in global_ranks(_ds(keys), "bkey", id_col="doc_id"
                                  ).take_all()}
    assert rows == {1: 1, 2: 2, 0: 3, 3: 4}
