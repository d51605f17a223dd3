"""Distributed search-actor pool: rank/score identity with the oracle and
the local searcher."""

import pytest

from ts_type_filter_ray.oracle.index import build_oracle
from ts_type_filter_ray.pipelines.build import build_index
from ts_type_filter_ray.pipelines.query import LocalSearcher
from ts_type_filter_ray.pipelines.serve import SearchService
from ts_type_filter_ray.sources.corpus import read_corpus

QUERIES = ["same", "thrall quench", "fire heat", "", "zzznohit",
           "w1z w2z w3z", ["fire", "heat"]]


@pytest.fixture(scope="module")
def served(ray_session, sonnets_corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("serve_idx")
    # small doc partitions so the pool actually splits work (154 docs,
    # 16-doc parts → 10 partitions over 3 actors)
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    svc = SearchService(idx.root, num_actors=3)
    local = LocalSearcher(idx)
    import pyarrow.dataset as pads
    tbl = pads.dataset(sonnets_corpus_dir).to_table()
    oracle = build_oracle(list(range(tbl.num_rows)),
                          tbl["content"].to_pylist())
    return svc, local, oracle


def test_match_identical(served):
    svc, local, oracle = served
    for q in QUERIES:
        assert svc.match(q).tolist() == oracle.match(q), f"query {q!r}"


def test_bm25_identical(served):
    svc, local, oracle = served
    for q in QUERIES:
        got = svc.bm25(q, k=5)
        assert got == oracle.bm25(q, k=5) == local.bm25(q, k=5), f"{q!r}"


def test_pinned_routing(ray_session, sonnets_corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("serve_idx_pin")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    svc = SearchService(idx.root, num_actors=3, pinned_doc_ids={100, 3})
    assert svc.match("").tolist() == [3, 100]
    assert 100 in svc.match("same").tolist()


def test_pinned_doc_in_postingless_partition(ray_session, sonnets_corpus_dir,
                                             tmp_path_factory):
    """A pinned doc whose partition has no posting rows (e.g. an empty
    document) must still appear in every match — reference rule
    inverted_index.py:94 (ADVICE r1)."""
    out = tmp_path_factory.mktemp("serve_idx_pin2")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    # doc_id 5000 → part 312, far outside the 154-doc corpus's partitions
    svc = SearchService(idx.root, num_actors=3, pinned_doc_ids={5000, 3})
    assert svc.match("").tolist() == [3, 5000]
    assert 5000 in svc.match("same").tolist()


def test_persisted_global_df_matches_postings(served, sonnets_corpus_dir,
                                              tmp_path_factory):
    """The per-bucket ``_df.parquet`` files written at merge time must
    concatenate to exactly the (term, df) table aggregated from the full
    postings metadata (the legacy fallback path), and every bucket dir
    must carry one after a fresh build."""
    import os

    import pyarrow.dataset as pads

    from ts_type_filter_ray.pipelines.build import BuiltIndex
    from ts_type_filter_ray.pipelines.serve import load_global_df

    svc, local, oracle = served
    # rebuild a sibling index to get a root path we know
    out = tmp_path_factory.mktemp("serve_idx_df")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    buckets = [d for d in os.listdir(idx.postings_dir)
               if d.startswith("bucket=")]
    assert buckets
    for d in buckets:
        assert os.path.exists(
            os.path.join(idx.postings_dir, d, "_df.parquet"))
    fast = load_global_df(idx)
    # force the fallback by pointing at the same postings via the
    # aggregation path: recompute from full metadata
    meta = pads.dataset(idx.postings_dir, partitioning="hive").to_table(
        columns=["term", "df"])
    slow = (meta.group_by("term").aggregate([("df", "sum")])
            .rename_columns(["term", "df"]).sort_by("term"))
    assert fast.equals(slow)
    # and a full searcher over the same index agrees term-by-term
    s = LocalSearcher(idx)
    for t, df in zip(fast["term"].to_pylist(), fast["df"].to_pylist()):
        assert s._df_of(t) == df
    assert s._df_of("zzz_not_in_vocab") == 0


def test_flagship_served_identical_to_local(ray_session):
    """The driver's bm25_topk_served entry must equal bm25_topk exactly
    (distributed doc-partitioned serving is rank- and score-identical)."""
    from ts_type_filter_ray.pipelines.flagship import (bm25_topk_served_table,
                                                       bm25_topk_table)
    sf = "/root/testdata/sf0.001"
    local = bm25_topk_table(sf)
    served = bm25_topk_served_table(sf, num_actors=3)
    assert local.equals(served)


def test_match_expr_distributes(served):
    """Boolean expressions distribute over the doc-partitioned pool:
    union of per-actor evaluations ≡ the local evaluator."""
    from ts_type_filter_ray.pipelines.querylang import evaluate

    svc, local, _oracle = served
    for expr in ("fire OR heat", "fire AND NOT heat",
                 "(fire OR heat) AND same", "fir* AND NOT *ing",
                 "saem~2 OR thrall"):
        assert (svc.match_expr(expr).tolist()
                == evaluate(expr, local).tolist()), expr


def test_bm25_filtered_distributes(served):
    """Filter + rank over the pool ≡ local filtered ranking (each actor
    filters its own doc slice; local allowed ≡ global ∩ slice)."""
    from ts_type_filter_ray.pipelines.querylang import evaluate

    svc, local, _oracle = served
    for q, expr in (("fire heat", "same OR thrall"),
                    ("same", "fire AND NOT heat"),
                    ("thrall quench", "f*")):
        allowed = evaluate(expr, local)
        assert (svc.bm25_filtered(q, expr, k=7)
                == local.bm25(q, k=7, allowed=allowed)), (q, expr)


def test_served_field_filters(ray_session, sonnets_corpus_dir,
                              tmp_path_factory):
    """Metadata field filters distribute over the pool: each actor holds
    the metadata postings for ITS doc partitions, so expression results
    equal the local evaluator with a whole-index fields searcher."""
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.pipelines.querylang import evaluate

    base = tmp_path_factory.mktemp("serve_fields")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(base / "idx"),
                      doc_part_bits=4, num_term_buckets=8)
    n = idx.stats.num_documents
    langs = ["en" if d % 2 else "de" for d in range(n)]
    meta = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "content": pa.array([f"lang:{la}" for la in langs],
                            type=pa.string()),
    })).repartition(3)
    mroot = str(base / "meta")
    midx = build_index(meta, mroot, doc_part_bits=4, num_term_buckets=2)

    svc = SearchService(idx.root, num_actors=3, metadata_root=mroot)
    local = LocalSearcher(idx)
    fields = LocalSearcher(midx)
    for expr in ("fire AND lang:en", "lang:de AND NOT heat",
                 "(fire OR heat) AND lang:e*", "lang:en OR lang:de"):
        want = evaluate(expr, local, fields=fields).tolist()
        assert svc.match_expr(expr).tolist() == want, expr
    q, expr = "fire heat", "same AND lang:en"
    allowed = evaluate(expr, local, fields=fields)
    assert svc.bm25_filtered(q, expr, k=7) == local.bm25(
        q, k=7, allowed=allowed)

    # mismatched partitioning is rejected up front
    bad = build_index(meta, str(base / "meta_bad"), doc_part_bits=6,
                      num_term_buckets=2)
    with pytest.raises(ValueError, match="doc_part_bits"):
        SearchService(idx.root, num_actors=2,
                      metadata_root=str(base / "meta_bad"))


# -- Term-partitioned topology (TermRoutedService) ------------------------


@pytest.fixture(scope="module")
def term_routed(ray_session, sonnets_corpus_dir, tmp_path_factory):
    from ts_type_filter_ray.pipelines.serve import TermRoutedService
    out = tmp_path_factory.mktemp("serve_idx_term")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    svc = TermRoutedService(idx.root, num_actors=3)
    local = LocalSearcher(idx)
    return svc, local


def test_term_routed_match_identical(term_routed):
    svc, local = term_routed
    for q in QUERIES:
        assert svc.match(q).tolist() == local.match(q).tolist(), f"{q!r}"


def test_term_routed_bm25_bit_identical(term_routed):
    """Scores (not just ranks) must equal LocalSearcher's: the
    coordinator's ascending-term fold reproduces the same float64
    accumulation."""
    svc, local = term_routed
    for q in QUERIES:
        assert svc.bm25(q, k=5) == local.bm25(q, k=5), f"{q!r}"


def test_term_routed_pinned_and_tombstones(ray_session, sonnets_corpus_dir,
                                           tmp_path_factory):
    from ts_type_filter_ray.pipelines.build import delete_docs
    from ts_type_filter_ray.pipelines.serve import TermRoutedService
    out = tmp_path_factory.mktemp("serve_idx_term_del")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    local = LocalSearcher(idx)
    victim = int(local.match("same")[0])
    delete_docs(idx.root, [victim])
    svc = TermRoutedService(idx.root, num_actors=3,
                            pinned_doc_ids={100, 3})
    assert svc.match("").tolist() == [3, 100]
    got = svc.match("same").tolist()
    assert victim not in got and 100 in got
    assert victim not in [d for d, _ in svc.bm25("same", k=200)]
