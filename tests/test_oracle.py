"""Oracle conformance with the reference's documented behavior.

Golden expectations mirror ``documentation/inverted-index.md:22-136`` and
``samples/inverted_index/query.md`` structurally via the planted F2 corpus
(FIXTURES.md F2); reference behaviors verified by execution are from
SURVEY.md §1.1 (``ts_type_filter/inverted_index.py``).
"""

import pytest

from ts_type_filter_ray.oracle.index import CorpusOracle, Index, build_oracle
from ts_type_filter_ray.sources.synthetic import (GOLDEN_FIRE_HEAT,
                                                  GOLDEN_SAME,
                                                  GOLDEN_THRALL_QUENCH,
                                                  roman, sonnets_analog)


@pytest.fixture(scope="module")
def sonnets():
    return sonnets_analog()


@pytest.fixture(scope="module")
def oracle(sonnets):
    # doc numbering is 1-based like the sonnets (doc i == sonnets[i-1])
    return build_oracle(list(range(1, len(sonnets) + 1)), sonnets)


def test_corpus_shape(sonnets):
    assert len(sonnets) == 154
    assert sonnets[0].startswith("Doc I\n")
    assert roman(154) == "CLIV"


def test_golden_same(oracle):
    assert oracle.match("same") == list(GOLDEN_SAME)


def test_golden_thrall_quench_requires_stemming(oracle):
    # matched only via the inflected forms thralled/quenched
    assert oracle.match("thrall quench") == list(GOLDEN_THRALL_QUENCH)


def test_golden_fire_heat(oracle):
    assert oracle.match("fire heat") == list(GOLDEN_FIRE_HEAT)


def test_set_semantics_no_duplicate_postings(oracle):
    # doc 12 contains "fire" three times but appears once in the result
    res = oracle.match("fire")
    assert res.count(12) == 1


def test_list_query_form(oracle):
    # Index.match accepts str | list[str] (inverted_index.py:87-91)
    assert oracle.match(["thrall", "quench"]) == list(GOLDEN_THRALL_QUENCH)
    assert oracle.match(["thrall quench"]) == list(GOLDEN_THRALL_QUENCH)


def test_empty_query_returns_pinned_only(sonnets):
    o = build_oracle([1, 2, 3], sonnets[:3], pinned={2})
    assert o.match("") == [2]
    assert o.match("zzznohit") == [2]
    # pinned docs join every match, in insertion order
    o2 = build_oracle(list(range(1, 155)), sonnets, pinned={100})
    assert o2.match("same") == sorted(set(GOLDEN_SAME) | {100})


def test_duplicate_add_raises():
    o = CorpusOracle()
    o.add(1, "hello world")
    with pytest.raises(ValueError, match="duplicate"):
        o.add(1, "other text")


def test_opaque_document_index_matches_reference_shape():
    # the reference Index semantics with documents as opaque strings
    idx = Index()
    idx.add("the cat sat")
    idx.add("dogs dogs dogs")
    idx.pin("the cat sat")
    assert idx.match("dog") == ["the cat sat", "dogs dogs dogs"]
    assert idx.match("") == ["the cat sat"]
    with pytest.raises(ValueError):
        idx.add("the cat sat")
    stats = idx.statistics()
    assert stats["num_documents"] == 2
    # "dogs dogs dogs" contributes ONE posting for "dog" (set semantics)
    assert ("dog", 1) in stats["df_table"]


def test_statistics_counts(oracle):
    stats = oracle.statistics()
    assert stats["num_documents"] == 154
    assert stats["num_postings"] == sum(df for _, df in stats["df_table"])
    assert stats["num_unique_words"] == len(stats["df_table"])
    # df table sorted (df desc, term asc) — explicit deterministic tie-break
    tbl = stats["df_table"]
    assert all((-a[1], a[0]) <= (-b[1], b[0]) for a, b in zip(tbl, tbl[1:]))


def test_bm25_topk_deterministic(oracle):
    top = oracle.bm25("fire heat", k=10)
    ids = [d for d, _ in top]
    # every scored doc is in the boolean match set
    assert set(ids) <= set(GOLDEN_FIRE_HEAT)
    assert len(ids) == len(GOLDEN_FIRE_HEAT)  # k > matches → all ranked
    scores = [s for _, s in top]
    assert scores == sorted(scores, reverse=True)
    # deterministic across rebuilds
    top2 = oracle.bm25(["fire", "heat"], k=10)
    assert top == top2


def test_bm25_tf_matters(oracle):
    # doc 12 has tf(fire)=3; others tf=1 — with equal-ish doc lengths the
    # tf-saturating factor must rank doc 12 first for the "fire" query
    top = oracle.bm25("fire", k=3)
    assert top[0][0] == 12


def test_highlight():
    idx = Index()
    idx.add("fire and water")
    out = idx.highlight("fire", "fire and water")
    assert out == "[bold green]fire[/bold green] and water"
