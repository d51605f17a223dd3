"""Unit coverage for the round-4 LLM-curation additions: the hashed
linear quality classifier (fastText-style model filter), SemDeDup
semantic deduplication, and the CCNet-style bigram-LM perplexity
scorer. Each is pinned against an independent pure-Python
reimplementation of its documented contract (float values included —
the gate pairs are engineered bit-identical)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions import ann
from ts_type_filter_ray.functions.lm import (bigram_logprob_scores,
                                             distinct_token_count)
from ts_type_filter_ray.functions.textstats import (classifier_scores,
                                                    hashed_weights)
from ts_type_filter_ray.text.hashvec import md5_lower64_strings


def _docs_ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs], type=pa.string()),
    }))


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat SAT"),
    (3, "   "),                       # blank: no features, no bigrams
    (4, "solo"),                      # 1 token: classified, no bigrams
    (5, "a b a b a"),
    (6, "The THE the"),               # case folding
]


def test_classifier_scores_matches_pure_python(ray_session):
    dim_bits, seed, scale = 10, "w1", 64
    got = {r["doc_id"]: r for r in classifier_scores(
        _docs_ds(DOCS), dim_bits=dim_bits, seed=seed,
        scale=scale).take_all()}
    w = hashed_weights(dim_bits, seed)
    dim = 1 << dim_bits
    expected = {}
    for did, text in DOCS:
        toks = text.strip().split()
        if not toks:
            continue
        h = md5_lower64_strings([t.lower() for t in toks])
        # int(x) first: np.uint64 % python-int silently promotes to
        # float64 and destroys the modulus
        dot = int(sum(int(w[int(x) % dim]) for x in h))
        expected[did] = (len(toks), dot,
                         1.0 / (1.0 + math.exp(-(dot / float(scale)))))
    assert set(got) == set(expected)        # blank doc 3 emits no row
    for did, (n, dot, score) in expected.items():
        r = got[did]
        assert r["n_tokens"] == n
        assert r["dot"] == dot
        assert r["score"] == score          # bit-identical float


def test_hashed_weights_deterministic_and_bounded():
    w = hashed_weights(6, "w1")
    assert w.shape == (64,) and w.dtype == np.int64
    assert w.min() >= -8 and w.max() <= 8
    assert np.array_equal(w, hashed_weights(6, "w1"))
    assert not np.array_equal(w, hashed_weights(6, "other-seed"))


def _clustered_embeddings(n_clusters=6, per=30, dim=12, seed=11):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, dim))
    vecs = (np.repeat(cents, per, axis=0)
            + 0.05 * rng.normal(size=(n_clusters * per, dim)))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    }))


def test_semantic_dedup_pairs_subset_and_recall(ray_session):
    ds = _clustered_embeddings()
    thr = 0.9
    exact = {(r["id_a"], r["id_b"])
             for r in ann.embedding_near_dup_pairs(ds, thr).take_all()}
    got = {(r["id_a"], r["id_b"])
           for r in ann.semantic_dedup_pairs(ds, thr, n_clusters=6,
                                             iters=3).take_all()}
    # within-cluster pairs are exact-verified -> always a SUBSET of the
    # exact sweep; on the tight-cluster fixture recall is near-total
    assert got <= exact
    assert exact and len(got) / len(exact) >= 0.95


def test_semantic_dedup_exact_configuration(ray_session):
    # n_clusters=1 degenerates to the exact global sweep: components
    # are the connected components of the exact pair graph, keep marks
    # exactly the min-id exemplar of each component
    ds = _clustered_embeddings(n_clusters=3, per=8)
    thr = 0.9
    from ts_type_filter_ray.functions.graph import connected_components
    comp_ref = {r["vec_id"]: r["component"] for r in connected_components(
        ds.select_columns(["vec_id"]),
        ann.embedding_near_dup_pairs(ds, thr),
        node_col="vec_id").take_all()}
    rows = ann.semantic_dedup(ds, thr, n_clusters=1).take_all()
    assert {r["vec_id"]: r["component"] for r in rows} == comp_ref
    for r in rows:
        assert r["keep"] == (1 if r["vec_id"] == r["component"] else 0)
    kept = {r["component"] for r in rows if r["keep"] == 1}
    assert kept == set(comp_ref.values())   # one exemplar per component


def _ref_bigram(docs, alpha):
    toks = {d: [w.lower() for w in t.strip().split()] for d, t in docs}
    vocab = {w for ws in toks.values() for w in ws}
    c12, c1 = {}, {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    av = alpha * len(vocab)
    out = {}
    for d, ws in toks.items():
        if len(ws) < 2:
            continue
        total = 0.0
        for a, b in zip(ws, ws[1:]):        # strict position-order fold
            total += (math.log(c12[(a, b)] + alpha)
                      - math.log(c1[a] + av))
        n = len(ws) - 1
        out[d] = (n, -total, math.exp(-total / n))
    return out


@pytest.mark.parametrize("alpha", [1, 3])
def test_bigram_lm_matches_pure_python(ray_session, alpha):
    got = {r["doc_id"]: r for r in bigram_logprob_scores(
        _docs_ds(DOCS), alpha=alpha).take_all()}
    exp = _ref_bigram(DOCS, alpha)
    assert set(got) == set(exp)             # docs 3 and 4 emit no row
    for did, (n, neg, ppl) in exp.items():
        r = got[did]
        assert r["n_bigrams"] == n
        assert r["neg_logprob"] == neg      # bit-identical float
        assert r["perplexity"] == ppl
    # repeated boilerplate (doc 5's alternating bigrams) scores more
    # fluent (lower perplexity) than the one-off doc-2 tail
    assert got[5]["perplexity"] < got[2]["perplexity"]


def test_bigram_lm_alpha_contract(ray_session):
    with pytest.raises(ValueError, match="alpha"):
        bigram_logprob_scores(_docs_ds(DOCS), alpha=0)
    with pytest.raises(ValueError, match="alpha"):
        bigram_logprob_scores(_docs_ds(DOCS), alpha=0.5)


def test_distinct_token_count_exact(ray_session):
    n = distinct_token_count(_docs_ds(DOCS))
    vocab = {w.lower() for _, t in DOCS for w in t.strip().split()}
    assert n == len(vocab)
