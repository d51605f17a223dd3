"""Power-iteration spectral direction: dense-numpy integer reference
parity, shift mode, overflow guard, edge cases."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.spectral import (
    doc_projections, dominant_direction)
from ts_type_filter_ray.text.hashvec import md5_lower64_strings


def _dense_reference(texts, dim_bits, iters, shift_bits=0):
    """Exact integer power iteration on the dense hashed tf matrix."""
    dim = 1 << dim_bits
    rows = []
    for t in texts:
        toks = t.strip().split()
        a = np.zeros(dim, dtype=object)
        if toks:
            h = md5_lower64_strings([w.lower() for w in toks])
            for f in (h % np.uint64(dim)).astype(np.int64):
                a[f] += 1
        rows.append(a)
    A = np.array(rows, dtype=object)
    v = np.ones(dim, dtype=object)
    for _ in range(iters):
        u = A @ v
        v = A.T @ u
        if shift_bits:
            v = np.array([int(x) >> shift_bits for x in v], dtype=object)
    return A, v


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }))


TEXTS = ["big data table scan", "table scan fast", "slow merge sort",
         "merge sort table", "", "  ", "big big big data"]


def test_direction_matches_dense_reference(ray_session):
    A, v = _dense_reference(TEXTS, 6, 2)
    got = dominant_direction(_ds(TEXTS), dim_bits=6, iters=2).take_all()
    exp = sorted(((int(x), f) for f, x in enumerate(v) if x),
                 key=lambda p: (-p[0], p[1]))
    assert [(r["score"], r["feature_idx"]) for r in got] == exp


def test_top_k_truncates(ray_session):
    got = dominant_direction(_ds(TEXTS), dim_bits=6, iters=2,
                             top_k=3).take_all()
    full = dominant_direction(_ds(TEXTS), dim_bits=6, iters=2).take_all()
    assert got == full[:3]


def test_shift_mode_matches_reference(ray_session):
    _, v = _dense_reference(TEXTS, 6, 3, shift_bits=4)
    got = dominant_direction(_ds(TEXTS), dim_bits=6, iters=3,
                             shift_bits=4).take_all()
    exp = sorted(((int(x), f) for f, x in enumerate(v) if x),
                 key=lambda p: (-p[0], p[1]))
    assert [(r["score"], r["feature_idx"]) for r in got] == exp


def test_doc_projections_match_reference(ray_session):
    A, v = _dense_reference(TEXTS, 6, 2)
    got = doc_projections(_ds(TEXTS), dim_bits=6, iters=2).take_all()
    exp = [(d, int(A[d] @ v)) for d in range(len(TEXTS))
           if TEXTS[d].strip()]
    assert [(r["doc_id"], r["proj"]) for r in got] == exp


def test_overflow_guard_raises(ray_session):
    with pytest.raises(ValueError, match="2\\^62"):
        dominant_direction(_ds(TEXTS), dim_bits=6, iters=20)
    # the same iteration count is fine once shifts bound the growth
    dominant_direction(_ds(TEXTS), dim_bits=6, iters=20, shift_bits=16)


def test_all_blank_corpus(ray_session):
    assert dominant_direction(_ds(["", "  "]), dim_bits=4,
                              iters=2).take_all() == []
    assert doc_projections(_ds(["", "  "]), dim_bits=4,
                           iters=2).take_all() == []
