"""BM25F fielded retrieval: field derivation, scoring exactness vs a
pure-Python reference with the same float64 expression shapes, title
boosting semantics, and deletion visibility across sub-indexes."""

import math

import numpy as np
import pyarrow as pa
import pytest

from ts_type_filter_ray.pipelines.fielded import (FieldedSearcher,
                                                  build_fielded_index,
                                                  derive_title_body)
from ts_type_filter_ray.pipelines.flagship import identity_stemmer

DOCS = [
    # (title-ish head ... body tail); token 'spark' placed in title for
    # doc 0 and in body for doc 1, same total length → title boost must
    # rank doc 0 first
    "spark engine overview and notes about the runtime and its parts",
    "engine design overview and notes spark appears later in the body",
    "query planner handles the fast path for every query and query",
    "storage layer compaction merges runs of sorted files on disk",
    "spark spark spark tuning guide for shuffle heavy workloads today",
    "short doc",
    "",
    "   ",
]
TITLE_TOKENS = 4
WEIGHTS = {"title": 2.0, "body": 1.0}
QUERIES = ["spark", "query fast", "spark engine", "nosuchterm", ""]


def _corpus(ray_session):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.large_string()),
    })
    return rd.from_arrow(t)


@pytest.fixture(scope="module")
def fielded_root(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("fielded_idx")
    corpus = derive_title_body(_corpus(ray_session), TITLE_TOKENS)
    build_fielded_index(corpus, str(out), list(WEIGHTS),
                        doc_part_bits=2, num_term_buckets=4,
                        tokenize_batch_size=4,
                        stemmer=identity_stemmer)
    return str(out)


def _ref_fields():
    """Python-reference field split (mirrors the oracle's array slice)."""
    out = []
    for text in DOCS:
        toks = text.strip().lower().split()
        out.append((toks[:TITLE_TOKENS], toks[TITLE_TOKENS:]))
    return out


def test_derive_title_body_matches_python_split(ray_session):
    got = derive_title_body(_corpus(ray_session), TITLE_TOKENS).take_all()
    got = {r["doc_id"]: r for r in got}
    for i, text in enumerate(DOCS):
        toks = text.split()
        assert got[i]["title"].split() == toks[:TITLE_TOKENS]
        assert got[i]["body"].split() == toks[TITLE_TOKENS:]


def _ref_bm25f(query, k1, bs, avgdl, n):
    """Pure-Python BM25F with the SAME float64 expression shapes as
    FieldedSearcher.bm25f (and the DuckDB oracle): per-doc scores must
    be bit-identical, not merely close."""
    fields = _ref_fields()
    terms = sorted({t.lower() for t in query.split()})
    scores: dict[int, float] = {}
    for t in terms:  # ascending-term left fold
        posting = {}
        for d, (tarr, barr) in enumerate(fields):
            tf_t, tf_b = tarr.count(t), barr.count(t)
            if tf_t or tf_b:
                posting[d] = (tf_t, tf_b, len(tarr), len(barr))
        if not posting:
            continue
        df = len(posting)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, (tf_t, tf_b, dlt, dlb) in posting.items():
            wtf = 0.0
            wtf += WEIGHTS["title"] * (
                tf_t / (1.0 - bs["title"]
                        + bs["title"] * float(dlt) / avgdl["title"]))
            wtf += WEIGHTS["body"] * (
                tf_b / (1.0 - bs["body"]
                        + bs["body"] * float(dlb) / avgdl["body"]))
            contrib = idf * ((wtf * (k1 + 1.0)) / (wtf + k1))
            scores[d] = scores.get(d, 0.0) + contrib
    return scores


def test_bm25f_bit_identical_to_reference(fielded_root):
    fs = FieldedSearcher(fielded_root, WEIGHTS, stemmer=identity_stemmer)
    assert fs.n_docs == len(DOCS)
    for q in QUERIES:
        got = fs.bm25f(q, k=len(DOCS))
        ref = _ref_bm25f(q, fs.k1, fs.bs, fs.avgdl, fs.n_docs)
        exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (dg, sg), (de, se) in zip(got, exp):
            assert sg == se, (q, dg, sg, se)  # bit-identical float64


def test_title_boost_ranks_title_hit_first(fielded_root):
    fs = FieldedSearcher(fielded_root, WEIGHTS, stemmer=identity_stemmer)
    order = [d for d, _ in fs.bm25f("spark", k=len(DOCS))]
    # 'spark' is in doc 0's TITLE but only in doc 1's BODY (tf 1 each,
    # same doc shape) — the 2x title weight must rank doc 0 above doc 1
    assert order.index(0) < order.index(1)


def test_union_df_and_empty_docs(fielded_root):
    fs = FieldedSearcher(fielded_root, WEIGHTS, stemmer=identity_stemmer)
    # 'spark': docs 0 (title), 1 (body), 4 (title+body) → union df 3
    assert fs.term_df("spark") == 3
    # whitespace-only and empty docs indexed at field length 0
    assert fs.n_docs == len(DOCS)
    assert fs.bm25f("nosuchterm") == []
    assert fs.bm25f("") == []


def test_topk_truncation_and_tiebreak(fielded_root):
    fs = FieldedSearcher(fielded_root, WEIGHTS, stemmer=identity_stemmer)
    full = fs.bm25f("spark engine overview", k=len(DOCS))
    for k in (1, 2, 3):
        assert fs.bm25f("spark engine overview", k=k) == full[:k]
    # deterministic (score desc, doc_id asc) order
    scores = [(-s, d) for d, s in full]
    assert scores == sorted(scores)


def test_deletion_in_any_field_hides_doc(ray_session, tmp_path_factory):
    import os

    from ts_type_filter_ray.pipelines.build import delete_docs

    out = tmp_path_factory.mktemp("fielded_del")
    corpus = derive_title_body(_corpus(ray_session), TITLE_TOKENS)
    build_fielded_index(corpus, str(out), list(WEIGHTS),
                        doc_part_bits=2, num_term_buckets=4,
                        tokenize_batch_size=4, stemmer=identity_stemmer)
    before = FieldedSearcher(str(out), WEIGHTS, stemmer=identity_stemmer)
    assert 4 in [d for d, _ in before.bm25f("spark", k=8)]
    # tombstone doc 4 in the TITLE sub-index only — a doc deleted in any
    # field never ranks
    delete_docs(os.path.join(str(out), "field=title"), [4])
    after = FieldedSearcher(str(out), WEIGHTS, stemmer=identity_stemmer)
    got = [d for d, _ in after.bm25f("spark", k=8)]
    assert 4 not in got and got  # others still rank


def test_mismatched_universe_rejected(ray_session, tmp_path_factory):
    import ray.data as rd

    from ts_type_filter_ray.pipelines.build import build_index

    out = tmp_path_factory.mktemp("fielded_bad")
    corpus = derive_title_body(_corpus(ray_session), TITLE_TOKENS)
    build_fielded_index(corpus, str(out), ["title"], doc_part_bits=2,
                        num_term_buckets=4, tokenize_batch_size=4,
                        stemmer=identity_stemmer)
    # a body index over a SMALLER corpus → different doc universe
    small = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "content": pa.array(["alpha beta", "gamma"], pa.large_string()),
    })
    build_index(rd.from_arrow(small), f"{out}/field=body",
                doc_part_bits=2, num_term_buckets=4,
                tokenize_batch_size=4, stemmer=identity_stemmer)
    with pytest.raises(ValueError, match="doc universes"):
        FieldedSearcher(str(out), WEIGHTS, stemmer=identity_stemmer)
