"""Document deletion lifecycle: tombstones make docs invisible to every
query surface immediately (statistics frozen — the Lucene-style split),
and compaction purges them so the index then equals an oracle built over
only the surviving documents."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from ts_type_filter_ray.oracle.index import build_oracle
from ts_type_filter_ray.pipelines.build import (BuiltIndex, build_index,
                                                compact_index, delete_docs,
                                                extend_index,
                                                load_tombstones)
from ts_type_filter_ray.pipelines.query import (LocalSearcher,
                                                bm25_dataset,
                                                match_doc_ids)
from ts_type_filter_ray.sources.corpus import read_corpus

QUERIES = ["same", "fire heat", "thrall quench", "zzznohit", ""]
DELETED = [0, 3, 17, 54, 141]


@pytest.fixture(scope="module")
def deleted_index(ray_session, sonnets_corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("del_idx")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    delete_docs(idx.root, DELETED[:3])
    delete_docs(idx.root, DELETED[2:])  # overlapping re-delete is fine
    tbl = pads.dataset(sonnets_corpus_dir).to_table()
    contents = tbl["content"].to_pylist()
    return BuiltIndex.load(idx.root), contents


def test_tombstones_load_union(deleted_index):
    idx, _ = deleted_index
    assert load_tombstones(idx.root).tolist() == sorted(DELETED)


def test_match_surfaces_exclude_deleted(deleted_index):
    idx, contents = deleted_index
    s = LocalSearcher(idx)
    # oracle over the SURVIVORS with their ORIGINAL ids — visibility
    # semantics: match sets equal the survivor corpus's
    live = [(d, c) for d, c in enumerate(contents) if d not in DELETED]
    oracle = build_oracle([d for d, _ in live], [c for _, c in live])
    for q in QUERIES:
        assert s.match(q).tolist() == oracle.match(q), q
    for d in DELETED:
        assert d not in s.match_prefix("f").tolist()
        assert d not in s.match_all("same").tolist()
        assert d not in s.match_andnot("fire", "zzznohit").tolist()
        assert d not in s.match_atleast("fire heat same", 1).tolist()
        assert d not in s.match_fuzzy("fire", 1).tolist()
        assert d not in s.match_suffix("e").tolist()
        assert d not in s.match_contains("a").tolist()
        assert d not in [doc for doc, _sc in s.tfidf("fire heat", k=200)]
    from ts_type_filter_ray.pipelines.querylang import evaluate
    expr_out = evaluate("fire OR heat OR same", s)
    assert not set(DELETED) & set(expr_out.tolist())


def test_deletion_beats_pinning(deleted_index):
    idx, _ = deleted_index
    s = LocalSearcher(idx, pinned_doc_ids={DELETED[0], 5})
    out = s.match("").tolist()
    assert out == [5]
    assert DELETED[0] not in s.match("same").tolist()
    # EVERY empty-query pinned path filters tombstones (review finding:
    # match_all / match_atleast returned the raw pinned set)
    assert s.match_all("").tolist() == [5]
    assert s.match_atleast("", m=1).tolist() == [5]


def test_bm25_excludes_deleted_with_frozen_stats(deleted_index):
    """Deleted docs never rank; the survivors keep the FROZEN pre-delete
    scores (N/df/avgdl unchanged until compaction)."""
    idx, contents = deleted_index
    s = LocalSearcher(idx)
    full_oracle = build_oracle(list(range(len(contents))), contents)
    for q in QUERIES[:3]:
        frozen = [(d, sc) for d, sc in
                  full_oracle.bm25(q, k=10 + len(DELETED))
                  if d not in DELETED][:10]
        assert s.bm25(q, k=10) == frozen, q


def test_oneoff_paths_exclude_deleted(deleted_index):
    idx, _ = deleted_index
    got = match_doc_ids(idx, "same")
    assert not set(DELETED) & set(got.tolist())
    top = bm25_dataset(idx, "fire heat", k=200)
    assert not set(DELETED) & {d for d, _ in top}


def test_served_pool_excludes_deleted(deleted_index):
    from ts_type_filter_ray.pipelines.serve import SearchService
    idx, _ = deleted_index
    svc = SearchService(idx.root, num_actors=3)
    local = LocalSearcher(idx)
    for q in QUERIES:
        assert svc.match(q).tolist() == local.match(q).tolist(), q
        assert svc.bm25(q, k=5) == local.bm25(q, k=5), q


def test_compact_purges_to_survivor_oracle(ray_session, sonnets_corpus_dir,
                                           tmp_path_factory):
    """After compaction the index equals an oracle built over ONLY the
    surviving docs (original ids): match sets AND bit-identical BM25
    scores with the recomputed N/df/avgdl."""
    out = tmp_path_factory.mktemp("del_purge")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    pre = idx.stats
    delete_docs(idx.root, DELETED)
    comp = compact_index(idx.root)
    # tombstones cleared, stats recomputed, ceiling preserved
    assert load_tombstones(idx.root).size == 0
    assert comp.stats.num_documents == pre.num_documents - len(DELETED)
    assert comp.stats.total_doc_len < pre.total_doc_len
    assert comp.stats.id_ceiling == pre.num_documents
    assert comp.stats.num_postings < pre.num_postings
    # docs table holds exactly the survivors
    docs = pads.dataset(comp.docs_dir).to_table(columns=["doc_id"])
    ids = sorted(docs["doc_id"].to_pylist())
    assert set(DELETED) & set(ids) == set()
    assert len(ids) == comp.stats.num_documents

    tbl = pads.dataset(sonnets_corpus_dir).to_table()
    contents = tbl["content"].to_pylist()
    live = [(d, c) for d, c in enumerate(contents) if d not in DELETED]
    oracle = build_oracle([d for d, _ in live], [c for _, c in live])
    s = LocalSearcher(comp)
    for q in QUERIES:
        assert s.match(q).tolist() == oracle.match(q), q
        assert s.bm25(q, k=10) == oracle.bm25(q, k=10), q


def test_extend_after_purge_never_reuses_ids(ray_session,
                                             sonnets_corpus_dir,
                                             tmp_path_factory):
    out = tmp_path_factory.mktemp("del_extend")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    n0 = idx.stats.num_documents
    delete_docs(idx.root, DELETED)
    compact_index(idx.root)
    ext = extend_index(idx.root, read_corpus(sonnets_corpus_dir))
    # new docs start at the PRE-deletion ceiling, not at num_documents
    assert ext.stats.id_ceiling == n0 + n0
    docs = pads.dataset(ext.docs_dir).to_table(columns=["doc_id"])
    ids = docs["doc_id"].to_pylist()
    assert len(ids) == len(set(ids)), "doc id reuse after purge"
    assert ext.stats.num_documents == 2 * n0 - len(DELETED)
    # the re-added copy of a deleted sonnet is findable at its NEW id
    s = LocalSearcher(ext)
    hits = s.match("same")
    assert (hits >= n0).any()


def test_positional_searcher_excludes_deleted(ray_session,
                                              tmp_path_factory):
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.pipelines.positional import (
        PositionalSearcher, build_positional_index)

    docs = ["order fast order", "order fast", "fast order fast", "solo"]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "content": pa.array(docs, type=pa.string())}))
    root = str(tmp_path_factory.mktemp("posdel") / "idx")
    idx = build_positional_index(corpus, root, num_term_buckets=2,
                                 doc_part_bits=2)
    s = PositionalSearcher(idx)
    assert s.phrase("order fast").tolist() == [0, 1, 2]
    delete_docs(root, [1])
    s2 = PositionalSearcher(idx)  # reload picks up tombstones
    assert s2.phrase("order fast").tolist() == [0, 2]
    assert s2.proximity("order", "fast", 1).tolist() == [0, 2]


def test_upsert_docs_lifecycle(ray_session, tmp_path_factory):
    """upsert = tombstone old ids + extend under fresh ids: the old
    content disappears immediately, the replacement is findable at its
    new id, old ids are never reused, and compaction afterwards equals
    an oracle over survivors + replacements."""
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.pipelines.build import upsert_docs

    docs = ["alpha beta", "gamma delta", "alpha gamma", "epsilon zeta"]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "content": pa.array(docs, type=pa.string())}))
    root = str(tmp_path_factory.mktemp("upsert") / "idx")
    idx = build_index(corpus, root, doc_part_bits=3, num_term_buckets=4)
    n0 = idx.stats.num_documents

    # replace docs 1 and 2 with updated contents
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "content": pa.array(["gamma delta UPDATED", "alpha omega"],
                            type=pa.string())}))
    upserted = upsert_docs(root, [1, 2], new)
    s = LocalSearcher(upserted)
    # old ids invisible, replacements visible at ids n0, n0+1
    assert s.match("gamma").tolist() == [n0]
    assert s.match("alpha").tolist() == [0, n0 + 1]
    assert s.match("omega").tolist() == [n0 + 1]
    assert s.match("updated").tolist() == [n0]

    # compaction → equals an oracle over survivors + replacements
    compacted = compact_index(root)
    live = [(0, docs[0]), (3, docs[3]),
            (n0, "gamma delta UPDATED"), (n0 + 1, "alpha omega")]
    oracle = build_oracle([d for d, _ in live], [c for _, c in live])
    s2 = LocalSearcher(compacted)
    for q in ("alpha", "gamma", "omega", "updated", "epsilon", "beta"):
        assert s2.match(q).tolist() == oracle.match(q), q
        assert s2.bm25(q, k=5) == oracle.bm25(q, k=5), q


def test_export_postings_honors_tombstones(deleted_index):
    """The interchange dump equals the index's query-visible contents:
    tombstoned docs never appear, every surviving (doc, term) does,
    with the exact per-doc tf."""
    from collections import Counter

    from ts_type_filter_ray.pipelines.build import export_postings
    from ts_type_filter_ray.text.porter2 import stem

    idx, contents = deleted_index
    df = export_postings(idx.root).to_pandas()
    assert not set(df.doc_id) & set(DELETED)
    want = {}
    for d, text in enumerate(contents):
        if d in DELETED:
            continue
        for t, c in Counter(stem(w) for w in text.split()).items():
            want[(t, d)] = c
    got = {(r.term, r.doc_id): r.tf for r in df.itertuples()}
    assert got == want
