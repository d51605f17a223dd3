"""Dirichlet query-likelihood scorer: bit-identical to a pure-Python
reference with the same float64 expression shapes, query-multiplicity
semantics, OOV handling, pagination-free top-k truncation, and deletion
visibility."""

import numpy as np

import pyarrow as pa
import pytest

from ts_type_filter_ray.pipelines.build import build_index, delete_docs
from ts_type_filter_ray.pipelines.flagship import QL_MU, identity_stemmer
from ts_type_filter_ray.pipelines.query import (LocalSearcher,
                                                query_stem_counts)

DOCS = [
    "spark engine overview and notes about the runtime and its parts",
    "engine design overview and notes spark appears later in the body",
    "query planner handles the fast path for every query and query",
    "storage layer compaction merges runs of sorted files on disk",
    "spark spark spark tuning guide for shuffle heavy workloads",
    "short doc",
    "",
]
QUERIES = ["spark", "query query fast", "spark engine spark",
           "nosuchterm", "", "spark nosuchterm"]


@pytest.fixture(scope="module")
def ql_index(ray_session, tmp_path_factory):
    import ray.data as rd
    out = tmp_path_factory.mktemp("ql_idx")
    t = pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.large_string()),
    })
    return build_index(rd.from_arrow(t), str(out), doc_part_bits=2,
                       num_term_buckets=4, tokenize_batch_size=4,
                       stemmer=identity_stemmer)


def _ref_ql(query, mu):
    """Pure-Python Dirichlet QL with the engine's float64 shapes.
    Uses np.log (not math.log): the two differ by 1 ULP on some inputs
    and the engine's contract is numpy's rounding (the driver gate is
    rank-only, so the ULP never reaches the DuckDB compare)."""
    toks = [d.lower().split() for d in DOCS]
    coll = float(sum(len(t) for t in toks))
    pairs = query_stem_counts(query, stemmer=identity_stemmer)
    present = []
    qlen = 0
    for term, qtf in pairs:
        ctf = sum(t.count(term) for t in toks)
        if ctf == 0:
            continue  # OOV drops from the sum AND from |q|
        qlen += qtf
        present.append((term, float(qtf), float(ctf)))
    if not present:
        return {}
    scores = {}
    for term, qtf, ctf in present:  # ascending term order
        for d, t in enumerate(toks):
            tf = float(t.count(term))
            if tf == 0.0:
                continue
            c = qtf * float(np.log(1.0 + tf / (mu * (ctf / coll))))
            scores[d] = scores.get(d, 0.0) + c
    for d in scores:
        scores[d] = scores[d] + float(qlen) * float(np.log(
            mu / (float(len(toks[d])) + mu)))
    return scores


def test_ql_bit_identical_to_reference(ql_index):
    s = LocalSearcher(ql_index, stemmer=identity_stemmer)
    for q in QUERIES:
        got = s.query_likelihood(q, k=len(DOCS), mu=QL_MU)
        ref = _ref_ql(q, QL_MU)
        exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (dg, sg), (_de, se) in zip(got, exp):
            assert sg == se, (q, dg, sg, se)


def test_ql_query_multiplicity_matters(ql_index):
    """Repeating a query term reweights it: 'spark spark query' must not
    rank like 'spark query'."""
    s = LocalSearcher(ql_index, stemmer=identity_stemmer)
    single = {d: sc for d, sc in s.query_likelihood("spark query", k=7)}
    double = {d: sc for d, sc in
              s.query_likelihood("spark spark query", k=7)}
    assert set(single) == set(double)  # same candidates (matched docs)
    assert single != double            # different scores


def test_ql_topk_truncation(ql_index):
    s = LocalSearcher(ql_index, stemmer=identity_stemmer)
    full = s.query_likelihood("spark engine overview", k=len(DOCS))
    for k in (1, 2, 3):
        assert s.query_likelihood("spark engine overview", k=k) == full[:k]


def test_ql_deleted_docs_never_rank(ray_session, tmp_path_factory):
    import ray.data as rd
    out = tmp_path_factory.mktemp("ql_del")
    t = pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.large_string()),
    })
    idx = build_index(rd.from_arrow(t), str(out), doc_part_bits=2,
                      num_term_buckets=4, tokenize_batch_size=4,
                      stemmer=identity_stemmer)
    before = LocalSearcher(idx, stemmer=identity_stemmer)
    assert 4 in [d for d, _ in before.query_likelihood("spark", k=7)]
    delete_docs(str(out), [4])
    from ts_type_filter_ray.pipelines.build import BuiltIndex
    after = LocalSearcher(BuiltIndex.load(str(out)),
                          stemmer=identity_stemmer)
    assert 4 not in [d for d, _ in after.query_likelihood("spark", k=7)]


# -- Jelinek-Mercer smoothing (query_likelihood_jm) ------------------------


def _ref_jm(query, lam):
    """Pure-Python JM QL with the engine's float64 shapes."""
    toks = [d.lower().split() for d in DOCS]
    coll = float(sum(len(t) for t in toks))
    ratio = (1.0 - lam) / lam
    pairs = query_stem_counts(query, stemmer=identity_stemmer)
    present = []
    qconst = 0.0
    import math
    for term, qtf in pairs:
        ctf = sum(t.count(term) for t in toks)
        if ctf == 0:
            continue
        present.append((term, float(qtf), float(ctf)))
        qconst += float(qtf) * math.log(lam * (ctf / coll))
    if not present:
        return {}
    scores = {}
    for term, qtf, ctf in present:  # ascending term order
        for d, t in enumerate(toks):
            tf = float(t.count(term))
            if tf == 0.0:
                continue
            dl = float(len(t))
            c = qtf * float(np.log(1.0 + ratio
                                   * ((tf / dl) / (ctf / coll))))
            scores[d] = scores.get(d, 0.0) + c
    return {d: sc + qconst for d, sc in scores.items()}


def test_jm_bit_identical_to_reference(ql_index):
    s = LocalSearcher(ql_index, stemmer=identity_stemmer)
    for lam in (0.3, 0.7):
        for q in QUERIES:
            got = s.query_likelihood_jm(q, k=len(DOCS), lam=lam)
            ref = _ref_jm(q, lam)
            exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
            assert [d for d, _ in got] == [d for d, _ in exp], (q, lam)
            for (dg, sg), (_de, se) in zip(got, exp):
                assert sg == se, (q, lam, dg, sg, se)


def test_jm_lambda_bounds(ql_index):
    s = LocalSearcher(ql_index, stemmer=identity_stemmer)
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            s.query_likelihood_jm("spark", lam=bad)


def test_jm_differs_from_dirichlet(ql_index):
    """The two smoothers are genuinely different scorers: scores differ
    even when the candidate universe agrees."""
    s = LocalSearcher(ql_index, stemmer=identity_stemmer)
    jm = dict(s.query_likelihood_jm("spark engine", k=7))
    dir_ = dict(s.query_likelihood("spark engine", k=7))
    assert set(jm) == set(dir_)
    assert jm != dir_
