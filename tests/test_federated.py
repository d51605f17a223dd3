"""Federated search (DFS query-then-fetch): a federation of
independently built indexes with the query-time global-stats merge must
rank BIT-IDENTICALLY to one index built over the union corpus — and
shard-local statistics must demonstrably NOT (the misranking the DFS
phase exists to fix)."""

import numpy as np
import pyarrow as pa
import pytest

from ts_type_filter_ray.pipelines.build import build_index, extend_index
from ts_type_filter_ray.pipelines.federated import (FederatedSearcher,
                                                    merged_global_df)
from ts_type_filter_ray.pipelines.flagship import identity_stemmer
from ts_type_filter_ray.pipelines.query import LocalSearcher

# Shard A: 'rare' appears once; shard B: 'rare' is hot. Under
# shard-local df, A's doc gets a huge idf for 'rare'; under global df
# both shards agree. 'common' is everywhere; 'only_a'/'only_b' exist in
# one shard's vocabulary only (df-merge must handle disjoint terms).
DOCS_A = [
    "common rare alpha beta",
    "common alpha alpha gamma",
    "common beta gamma delta only_a",
    "common delta alpha",
]
DOCS_B = [
    "common rare rare epsilon",
    "common rare zeta epsilon",
    "common rare epsilon zeta eta",
    "common zeta eta only_b",
    "common rare eta",
]

QUERIES = ["rare", "common rare", "only_a only_b", "alpha epsilon zeta",
           "rare rare common", "missingterm", "Common RARE"]


def _corpus(docs, id_start):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(id_start, id_start + len(docs)),
                           type=pa.int64()),
        "content": pa.array(docs, type=pa.string())}))


@pytest.fixture(scope="module")
def shards(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("fed")
    a = build_index(_corpus(DOCS_A, 0), str(root / "a"),
                    num_term_buckets=4, doc_part_bits=2,
                    stemmer=identity_stemmer)
    b = build_index(_corpus(DOCS_B, len(DOCS_A)), str(root / "b"),
                    num_term_buckets=4, doc_part_bits=2,
                    stemmer=identity_stemmer)
    union = build_index(_corpus(DOCS_A + DOCS_B, 0), str(root / "u"),
                        num_term_buckets=4, doc_part_bits=2,
                        stemmer=identity_stemmer)
    return a, b, union


def test_global_stats_merge(shards):
    a, b, union = shards
    fed = FederatedSearcher([a, b], stemmer=identity_stemmer)
    assert fed.num_documents == union.stats.num_documents
    assert fed.total_doc_len == union.stats.total_doc_len
    df = merged_global_df([a, b]).to_pydict()
    want = merged_global_df([union]).to_pydict()
    assert df == want


def test_bm25_bit_identical_to_merged_index(shards):
    a, b, union = shards
    fed = FederatedSearcher([a, b], stemmer=identity_stemmer)
    ref = LocalSearcher(union, stemmer=identity_stemmer)
    for q in QUERIES:
        got = [(d, s) for _shard, d, s in fed.bm25(q, k=6)]
        want = [(d, s) for d, s in ref.bm25(q, k=6)]
        assert got == want, q  # exact float equality, same tie-break


def test_match_parity(shards):
    a, b, union = shards
    fed = FederatedSearcher([a, b], stemmer=identity_stemmer)
    ref = LocalSearcher(union, stemmer=identity_stemmer)
    for q in QUERIES:
        got = [d for _shard, d in fed.match(q)]
        assert got == ref.match(q).tolist(), q


def test_shard_local_stats_would_misrank(shards):
    """Without the DFS merge, shard A scores 'rare' with df=1 of N=4 —
    a different idf than the global df=6 of N=9. The federation must
    NOT equal that shard-local score (proves the override is live)."""
    a, b, union = shards
    local_a = LocalSearcher(a, stemmer=identity_stemmer)
    fed = FederatedSearcher([a, b], stemmer=identity_stemmer)
    local_score = dict(local_a.bm25("rare", k=6))[0]
    fed_score = {d: s for _sh, d, s in fed.bm25("rare", k=6)}[0]
    assert local_score != fed_score
    # and the federated score equals the union index's
    union_score = dict(
        LocalSearcher(union, stemmer=identity_stemmer).bm25("rare", k=6))[0]
    assert fed_score == union_score


def test_extended_shard_federates_exactly(shards, tmp_path, ray_session):
    """A shard that was itself LSM-extended (impact_correction > 1
    territory) still federates bit-identically — the block-max bounds
    stay valid under BOTH the extension's and the federation's avgdl."""
    a, b, union = shards
    ext = build_index(_corpus(DOCS_B[:2], len(DOCS_A)),
                      str(tmp_path / "ext"), num_term_buckets=4,
                      doc_part_bits=2, stemmer=identity_stemmer)
    # extend_index shifts incoming ids by next_doc_id (= 2 here, its
    # own doc count — the dense-0-based-shard contract); pre-offset the
    # extension corpus so the final ids land at the union's 6, 7, 8
    ext = extend_index(str(tmp_path / "ext"),
                       _corpus(DOCS_B[2:], len(DOCS_A)))
    docs_tbl = __import__("pyarrow.dataset", fromlist=["dataset"]).dataset(
        str(tmp_path / "ext" / "docs")).to_table(columns=["doc_id"])
    assert sorted(docs_tbl["doc_id"].to_pylist()) == [4, 5, 6, 7, 8]
    assert ext.stats.num_segments == 2
    fed = FederatedSearcher([a, ext], stemmer=identity_stemmer)
    ref = LocalSearcher(union, stemmer=identity_stemmer)
    for q in QUERIES:
        got = [(d, s) for _shard, d, s in fed.bm25(q, k=6)]
        assert got == [(d, s) for d, s in ref.bm25(q, k=6)], q


def test_single_index_federation_is_identity(shards):
    """Federating ONE index must not change its ranking (global stats
    reduce to its own stats)."""
    _a, _b, union = shards
    fed = FederatedSearcher([union], stemmer=identity_stemmer)
    ref = LocalSearcher(union, stemmer=identity_stemmer)
    for q in QUERIES:
        got = [(d, s) for _shard, d, s in fed.bm25(q, k=6)]
        assert got == [(d, s) for d, s in ref.bm25(q, k=6)], q


def test_shard_attribution(shards):
    a, b, _union = shards
    fed = FederatedSearcher([a, b], stemmer=identity_stemmer)
    for shard, d, _s in fed.bm25("common", k=9):
        assert (shard == 0) == (d < len(DOCS_A))
