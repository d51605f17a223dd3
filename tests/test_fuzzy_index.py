"""SymSpell deletion-neighborhood fuzzy index (pipelines/fuzzy.py):
candidate completeness and match parity with the vocabulary-sweep path
(``LocalSearcher.match_fuzzy``) over fuzzed query tokens, plus artifact
lifecycle (idempotent reuse, depth guard, missing-artifact error)."""

import random

import pytest

from ts_type_filter_ray.pipelines.build import build_index
from ts_type_filter_ray.pipelines.fuzzy import (build_fuzzy_index,
                                                deletion_variants,
                                                fuzzy_candidate_terms,
                                                match_fuzzy_indexed)
from ts_type_filter_ray.pipelines.query import LocalSearcher
from ts_type_filter_ray.sources.corpus import read_corpus


@pytest.fixture(scope="module")
def fuzzy_fixture(ray_session, sonnets_corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("fuzzyidx")
    corpus = read_corpus(sonnets_corpus_dir)
    idx = build_index(corpus, str(out / "idx"), doc_part_bits=6,
                      num_term_buckets=8, tokenize_batch_size=32)
    build_fuzzy_index(idx.root, max_dist=2)
    return idx, LocalSearcher(idx)


def test_deletion_variants():
    assert deletion_variants("ab", 1) == {"ab", "a", "b"}
    assert deletion_variants("abc", 2) == {
        "abc", "ab", "ac", "bc", "a", "b", "c"}
    assert deletion_variants("a", 2) == {"a", ""}
    assert deletion_variants("", 1) == {""}


def test_candidates_match_vocab_sweep(fuzzy_fixture):
    idx, searcher = fuzzy_fixture
    vocab = [searcher._terms.arr[i].as_py()
             for i in range(searcher._terms.n)]
    rng = random.Random(1234)

    def mutate(w):
        ops = rng.randint(0, 2)
        for _ in range(ops):
            if not w:
                break
            i = rng.randrange(len(w))
            kind = rng.randint(0, 3)
            if kind == 0:
                w = w[:i] + w[i + 1:]
            elif kind == 1:
                w = w[:i] + chr(rng.randint(97, 122)) + w[i:]
            elif kind == 2:
                w = w[:i] + chr(rng.randint(97, 122)) + w[i + 1:]
            elif kind == 3 and i + 1 < len(w):
                w = w[:i] + w[i + 1] + w[i] + w[i + 2:]
        return w

    tokens = [mutate(rng.choice(vocab)) for _ in range(60)]
    tokens += ["fire", "saem", "xq", "thrall", "zzzz"]
    for tok in tokens:
        if not tok:
            continue
        for d in (0, 1, 2):
            want = sorted(t for t, _dist in searcher.fuzzy_terms(tok, d))
            got = fuzzy_candidate_terms(idx.root, tok, d)
            assert got == want, (tok, d)


def test_match_parity_with_sweep(fuzzy_fixture):
    idx, searcher = fuzzy_fixture
    for tok, d in (("fire", 1), ("saem", 2), ("thrll", 1), ("zzzz", 1),
                   ("Fire", 1), ("heat", 0)):
        assert (match_fuzzy_indexed(idx, tok, d).tolist()
                == searcher.match_fuzzy(tok, d).tolist()), (tok, d)


def test_reuse_and_depth_guard(fuzzy_fixture, tmp_path):
    import os
    idx, _searcher = fuzzy_fixture
    d = build_fuzzy_index(idx.root, max_dist=1)  # depth 2 exists → reuse
    meta = os.path.join(d, "_meta.json")
    import json
    assert json.load(open(meta))["max_dist"] == 2
    with pytest.raises(ValueError):
        fuzzy_candidate_terms(idx.root, "fire", 3)


def test_missing_artifact_raises(ray_session, sonnets_corpus_dir,
                                 tmp_path_factory):
    out = tmp_path_factory.mktemp("nofuzzy")
    corpus = read_corpus(sonnets_corpus_dir)
    idx = build_index(corpus, str(out / "idx"), doc_part_bits=6,
                      num_term_buckets=4, tokenize_batch_size=64)
    with pytest.raises(FileNotFoundError):
        fuzzy_candidate_terms(idx.root, "fire", 1)


def test_stale_after_extend_detected(ray_session, tmp_path_factory):
    """Extending the index changes the vocabulary: the deletion artifact
    must refuse to answer (stale) until rebuilt, and the rebuild picks
    up the new terms."""
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.pipelines.build import extend_index

    docs = ["alpha beta", "gamma delta"]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "content": pa.array(docs, type=pa.string())}))
    root = str(tmp_path_factory.mktemp("fz_stale") / "idx")
    from ts_type_filter_ray.pipelines.build import build_index as bi
    idx = bi(corpus, root, doc_part_bits=3, num_term_buckets=4)
    build_fuzzy_index(root, max_dist=1)
    assert fuzzy_candidate_terms(root, "alpho", 1) == ["alpha"]

    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "content": pa.array(["omega zulu"], type=pa.string())}))
    extend_index(root, new)
    with pytest.raises(ValueError, match="STALE"):
        fuzzy_candidate_terms(root, "omega", 1)
    build_fuzzy_index(root, max_dist=1)  # rebuild over the new vocab
    assert fuzzy_candidate_terms(root, "omego", 1) == ["omega"]
    assert fuzzy_candidate_terms(root, "alpho", 1) == ["alpha"]
