"""Forward index (term vectors) and the BM25 explain() surface:
vectors equal a per-doc tokenize reference; explain contributions sum
bit-identically to the ranked score; staleness / tombstone / missing-id
contracts are loud."""

import numpy as np
import pyarrow as pa
import pytest

from ts_type_filter_ray.pipelines.build import build_index, delete_docs
from ts_type_filter_ray.pipelines.flagship import identity_stemmer
from ts_type_filter_ray.pipelines.forward import (ForwardIndex,
                                                  build_forward_index)
from ts_type_filter_ray.pipelines.query import LocalSearcher

DOCS = [
    "spark engine overview and notes about the runtime and its parts",
    "engine design overview and notes spark appears later in the body",
    "query planner handles the fast path for every query and query",
    "storage layer compaction merges runs of sorted files on disk",
    "spark spark spark tuning guide for shuffle heavy workloads",
    "short doc",
    "",
]


def _make_index(tmp_path_factory, name: str):
    import ray.data as rd
    out = tmp_path_factory.mktemp(name)
    t = pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.large_string()),
    })
    idx = build_index(rd.from_arrow(t), str(out), doc_part_bits=2,
                      num_term_buckets=4, tokenize_batch_size=4,
                      stemmer=identity_stemmer)
    return idx


@pytest.fixture(scope="module")
def fwd_index(ray_session, tmp_path_factory):
    idx = _make_index(tmp_path_factory, "fwd_idx")
    build_forward_index(idx.root)
    return idx


def _ref_vectors(doc_ids):
    rows = []
    for d in doc_ids:
        toks = DOCS[d].lower().split()
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        for t in sorted(counts):
            rows.append((d, t, counts[t]))
    return rows


def test_term_vectors_match_reference(fwd_index):
    fwd = ForwardIndex(fwd_index.root)
    got = fwd.term_vectors([0, 2, 4, 5, 6])
    exp = _ref_vectors([0, 2, 4, 5, 6])
    assert list(zip(got["doc_id"].to_pylist(), got["term"].to_pylist(),
                    got["tf"].to_pylist())) == exp


def test_term_vectors_empty_doc_and_bounds(fwd_index):
    fwd = ForwardIndex(fwd_index.root)
    assert fwd.term_vectors([6]).num_rows == 0  # '' doc: no triples
    with pytest.raises(KeyError, match="outside"):
        fwd.term_vectors([99])


def test_forward_index_stale_after_extend(ray_session, tmp_path_factory):
    import ray.data as rd
    from ts_type_filter_ray.pipelines.build import extend_index
    idx = _make_index(tmp_path_factory, "fwd_stale")
    build_forward_index(idx.root)
    more = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "content": pa.array(["brand new words"], type=pa.large_string()),
    })
    extend_index(idx.root, rd.from_arrow(more), stemmer=identity_stemmer)
    with pytest.raises(ValueError, match="STALE"):
        ForwardIndex(idx.root)
    # rebuild resolves it, and the new doc's vector is served
    build_forward_index(idx.root)
    got = ForwardIndex(idx.root).term_vectors([len(DOCS)])
    assert got["term"].to_pylist() == ["brand", "new", "words"]


def test_term_vectors_tombstoned_raises(ray_session, tmp_path_factory):
    idx = _make_index(tmp_path_factory, "fwd_tomb")
    build_forward_index(idx.root)
    delete_docs(idx.root, [4])
    with pytest.raises(KeyError, match="tombstoned"):
        ForwardIndex(idx.root).term_vectors([4])


# -- explain ---------------------------------------------------------------


def test_explain_sums_to_bm25_score(fwd_index):
    s = LocalSearcher(fwd_index, stemmer=identity_stemmer)
    for q in ["spark", "spark engine overview", "the and query",
              "query fast nosuchterm"]:
        ranked = dict(s.bm25(q, k=len(DOCS)))
        for doc_id, score in ranked.items():
            ex = s.explain(q, doc_id)
            assert ex["score"] == score, (q, doc_id)
            # contributions re-fold to the same score (ascending terms)
            acc = 0.0
            for t in ex["terms"]:
                assert t["contribution"] == t["idf"] * t["tf_factor"]
                acc += t["contribution"]
            assert acc == score
            terms = [t["term"] for t in ex["terms"]]
            assert terms == sorted(terms)


def test_explain_non_matching_doc(fwd_index):
    s = LocalSearcher(fwd_index, stemmer=identity_stemmer)
    ex = s.explain("spark", 3)  # doc 3 has no 'spark'
    assert ex == {"doc_id": 3, "score": 0.0, "terms": []}


def test_explain_fields_are_consistent(fwd_index):
    s = LocalSearcher(fwd_index, stemmer=identity_stemmer)
    ex = s.explain("spark", 4)  # tf=3 in doc 4
    (t,) = ex["terms"]
    assert t["term"] == "spark" and t["tf"] == 3
    assert t["df"] == 3  # docs 0, 1, 4
    assert t["dl"] == len(DOCS[4].split())


def test_explain_tombstoned_raises(ray_session, tmp_path_factory):
    idx = _make_index(tmp_path_factory, "exp_tomb")
    delete_docs(idx.root, [0])
    from ts_type_filter_ray.pipelines.build import BuiltIndex
    s = LocalSearcher(BuiltIndex.load(idx.root), stemmer=identity_stemmer)
    with pytest.raises(KeyError, match="tombstoned"):
        s.explain("spark", 0)
