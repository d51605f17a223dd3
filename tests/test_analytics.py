"""Invariants for the search-analytics surfaces (pipelines/analytics.py).
Value-exactness vs DuckDB is covered by tests/test_driver_contract.py
(significant_terms / numeric_histogram / function_score_topk); these pin
the internal contracts."""

import numpy as np
import pytest

from ts_type_filter_ray.pipelines import analytics
from ts_type_filter_ray.pipelines.flagship import (
    build_documents_index_nostem, identity_stemmer)
from ts_type_filter_ray.pipelines.query import LocalSearcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(ray_session):
    return LocalSearcher(build_documents_index_nostem(SF),
                         stemmer=identity_stemmer)


def test_histogram_counts_cover_match_set(ray_session, searcher):
    tbl = analytics.numeric_histogram_table(SF).to_pandas()
    for i, q in enumerate(analytics.HISTOGRAM_QUERY_SET):
        n_match = int(searcher.match(q).size)
        assert tbl[tbl.query_idx == i].n_docs.sum() == n_match
    # bucket floors are multiples of the width
    assert (tbl.bucket_lo % analytics.HISTOGRAM_WIDTH == 0).all()


def test_significant_terms_contracts(ray_session, searcher):
    tbl = analytics.significant_terms_table(SF).to_pandas()
    assert len(tbl) > 0
    # a term's foreground df can never exceed its background df
    assert (tbl.fg_df <= tbl.bg_df).all()
    assert (tbl.fg_df >= analytics.SIGTERMS_MIN_FG).all()
    # ranks are 1..k dense per query and lift is non-increasing in rank
    for i, grp in tbl.groupby("query_idx"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g.lift.to_numpy()) <= 0).all()
        # query's own stems never appear
        from ts_type_filter_ray.pipelines.query import query_stems
        stems = set(query_stems(analytics.SIGTERMS_QUERY_SET[int(i)],
                                stemmer=identity_stemmer))
        assert not (set(g.term) & stems)
    # lift is reproducible from the integer columns with the documented
    # expression shape
    n = int(build_documents_index_nostem(SF).stats.num_documents)
    for i, grp in tbl.groupby("query_idx"):
        n_fg = int(searcher.match(
            analytics.SIGTERMS_QUERY_SET[int(i)]).size)
        fg = grp.fg_df.to_numpy(dtype=np.int64)
        bg = grp.bg_df.to_numpy(dtype=np.int64)
        expect = (fg * n).astype(np.float64) / \
            (bg * np.int64(n_fg)).astype(np.float64)
        assert (grp.lift.to_numpy() == expect).all()


def test_function_score_full_window_reorders_vs_bm25(ray_session, searcher):
    tbl = analytics.function_score_table(SF).to_pandas()
    assert len(tbl) > 0
    # every returned doc matches its query (boost never invents matches)
    for i, grp in tbl.groupby("query_idx"):
        q = analytics.BM25_NOSTEM_QUERY_SET[int(i)]
        match = set(searcher.match(q).tolist())
        assert set(grp.doc_id) <= match
        assert list(grp.sort_values("rank")["rank"]) == \
            list(range(1, len(grp) + 1))
