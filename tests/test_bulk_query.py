"""Late-r4 query surfaces: bulk (set-at-a-time) execution through the
BulkSearcher actor pool, regex vocabulary match, more-like-this,
field-collapsed top-k, and the OOV-rate quality signal."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.pipelines import flagship
from ts_type_filter_ray.pipelines.bulk import bulk_bm25, bulk_match
from ts_type_filter_ray.pipelines.flagship import (
    build_documents_index_nostem, identity_stemmer)
from ts_type_filter_ray.pipelines.query import LocalSearcher

SF = "/root/testdata/sf0.001"


# ---- bulk execution ≡ driver loop ------------------------------------

def test_bulk_match_equals_driver_loop(ray_session):
    idx = build_documents_index_nostem(SF)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    got = (bulk_match(idx.root, flagship.BULK_QUERY_SET,
                      stemmer=identity_stemmer, concurrency=2)
           .to_pandas())
    got = got.sort_values(["query_idx", "doc_id"]).reset_index(drop=True)
    exp_rows = [(i, int(d)) for i, q in enumerate(flagship.BULK_QUERY_SET)
                for d in searcher.match(q)]
    exp_rows.sort()
    assert list(map(tuple, got.itertuples(index=False))) == exp_rows


def test_bulk_bm25_equals_driver_loop(ray_session):
    a = flagship.bulk_bm25_topk_table(SF)
    b = flagship.bm25_topk_nostem_table(SF)
    key = lambda t: sorted(zip(*[t[c].to_pylist()  # noqa: E731
                                 for c in ("query_idx", "rank", "doc_id")]))
    assert key(a) == key(b)


def test_bulk_match_empty_and_miss_queries(ray_session):
    idx = build_documents_index_nostem(SF)
    got = (bulk_match(idx.root, ["", "nonexistentterm", "spark"],
                      stemmer=identity_stemmer, concurrency=2)
           .to_pandas())
    # empty query and miss produce no rows; spark produces some
    assert set(got["query_idx"]) == {2}
    assert len(got) > 0


# ---- regex vocabulary match ------------------------------------------

def test_match_regex_vs_naive(ray_session):
    idx = build_documents_index_nostem(SF)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    docs = rd.read_parquet(f"{SF}/documents.parquet").to_pandas()
    for pat in flagship.REGEX_QUERY_SET:
        rx = re.compile(pat)
        exp = sorted(
            int(r.doc_id) for r in docs.itertuples()
            if any(rx.search(t) for t in r.text.lower().split()))
        got = searcher.match_regex(pat).tolist()
        assert got == exp, pat


def test_match_regex_empty_pattern(ray_session):
    idx = build_documents_index_nostem(SF)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    assert searcher.match_regex("").size == 0


# ---- more-like-this ---------------------------------------------------

def test_mlt_excludes_seed_and_ranks(ray_session):
    tbl = flagship.mlt_topk_nostem_table(SF)
    df = tbl.to_pandas()
    for i, seed in enumerate(flagship.MLT_SEED_DOC_IDS):
        sub = df[df.query_idx == i]
        assert seed not in set(sub.doc_id), "seed must not match itself"
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
        assert len(sub) <= flagship.MLT_K


# ---- field-collapsed top-k --------------------------------------------

def test_collapse_one_doc_per_lang(ray_session):
    tbl = flagship.collapsed_topk_nostem_table(SF)
    df = tbl.to_pandas()
    docs = rd.read_parquet(f"{SF}/documents.parquet").to_pandas()
    lang = dict(zip(docs.doc_id, docs.lang))
    for i in df.query_idx.unique():
        sub = df[df.query_idx == i]
        langs = [lang[d] for d in sub.doc_id]
        assert len(langs) == len(set(langs)), "≤1 result per lang"
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))


# ---- OOV rate ---------------------------------------------------------

def test_oov_rate_small_fixture(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a a a b", "b zzz qqq", "   "]),
    })
    from ts_type_filter_ray.functions.textstats import oov_rate
    out = (oov_rate(rd.from_arrow(tbl), top_v=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # top-2 vocab = {a (3), b (2)}; zzz/qqq are OOV
    assert out.n_tokens.tolist() == [4, 3, 0]
    assert out.n_oov.tolist() == [0, 2, 0]
    assert out.oov_ratio.tolist() == [0.0, 2 / 3, 0.0]


def test_top_vocabulary_tie_break(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["b a c a b c d"]),  # a:2 b:2 c:2 d:1
    })
    from ts_type_filter_ray.functions.textstats import top_vocabulary
    assert top_vocabulary(rd.from_arrow(tbl), 2) == ["a", "b"]


def test_hybrid_rrf_matches_oracle(ray_session):
    """Hybrid lexical+dense RRF: rank-only output equals the DuckDB
    oracle (both rankings + same fusion arithmetic) at sf0.001."""
    import duckdb

    import __ray_entry__ as entry
    sf = SF
    got = (entry.queries()["hybrid_rrf"](sf).to_pandas()
           .sort_values(["query_idx", "rank"]).reset_index(drop=True))
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"create view {t} as select * from "
                    f"'{sf}/{t}.parquet'")
    want = (con.execute(entry.oracle_sql()["hybrid_rrf"]
                        + " order by query_idx, rank").fetchdf()
            .reset_index(drop=True))
    for c in got.columns:  # driver compare is dtype-KIND-insensitive
        assert (got[c].astype("int64").values
                == want[c].astype("int64").values).all(), c
    # the dense leg genuinely contributes: some top results are not in
    # the lexical-only ranking
    lex = (entry.queries()["bm25_topk_nostem"](sf).to_pandas())
    lex_pairs = set(zip(lex["query_idx"], lex["doc_id"]))
    hyb_pairs = set(zip(got["query_idx"], got["doc_id"]))
    assert hyb_pairs - lex_pairs
