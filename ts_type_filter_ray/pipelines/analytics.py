"""Search-analytics surfaces over the built index: significant-terms
aggregation, numeric histogram facets, and function-score ranking.

All three run over the IDENTITY-STEMMER index so every output sits on
the driver's value-exact DuckDB gate (the nostem trick,
``flagship.build_documents_index_nostem``). Distributed shapes:

- ``significant_terms_table`` — the Elasticsearch significant-terms
  aggregation: terms over-represented in a query's match set
  (foreground) relative to the whole corpus (background). One corpus
  pass computes per-batch partial (query, term, fg_df) counts against
  broadcast match sets (the ``related_terms_table`` kernel); background
  df comes from the per-bucket ``_df.parquet`` tables the build
  persists (``serve.load_global_df``), broadcast ONCE via ``ray.put``
  (same small-side contract as the serve pool — one plasma copy per
  node, vocab-sized Arrow, never a Python dict). The corpus never
  shuffles; only the vocabulary-bounded partial table does.
- ``numeric_histogram_table`` — fixed-width histogram facets of a
  numeric doc-values field over each query's match set: posting-list
  match -> pruned doc-values gather -> vectorized bucket fold. The
  facet counts are O(buckets) per query; the documents table is never
  scanned.
- ``function_score_table`` — BM25 relevance multiplied by a numeric
  doc-values boost (``score * (1 + n_chars/1000)``), the
  Elasticsearch function_score / Lucene FunctionScoreQuery shape. The
  rescore window is the FULL match set (every matching doc is scored
  and boosted), so ranking is exact, not a top-k rescore
  approximation; both factors use the identical float64 expression
  shapes as the SQL oracle, so ranks match bit-for-bit, ties included.

Reference parity: the reference engine (`ts_type_filter`) has no
analytics layer — these extend the index the way its
``inverted_index.py`` match/statistics surfaces would compose at
warehouse scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .flagship import (BM25_NOSTEM_K, BM25_NOSTEM_QUERY_SET,
                       build_documents_index_nostem, identity_stemmer,
                       numeric_index_for)
from .query import LocalSearcher, query_stems

# Foreground query set: hot single terms and a multi-term disjunction,
# so match sets range from narrow to broad
SIGTERMS_QUERY_SET: list[str] = ["spark", "window stream", "hash join"]
SIGTERMS_K = 10
SIGTERMS_MIN_FG = 3  # terms must appear in >= this many foreground docs

HISTOGRAM_QUERY_SET: list[str] = ["spark", "batch value", "table"]
HISTOGRAM_WIDTH = 100  # n_chars bucket width

FUNCSCORE_BOOST_DIVISOR = 1000.0  # boost = 1 + n_chars/1000


def significant_terms_table(sf_dir: str,
                            queries: list[str] | None = None,
                            k: int = SIGTERMS_K,
                            min_fg: int = SIGTERMS_MIN_FG) -> pa.Table:
    """(query_idx, rank, term, fg_df, bg_df, lift) — top-k terms most
    over-represented in each query's match set vs the corpus.

    ``lift = (fg_df * N) / (bg_df * n_fg)`` — the foreground/background
    relative-frequency ratio — computed as ONE int64 product per side
    converted to float64 then divided (exact products, one correctly
    rounded division), the identical expression the SQL oracle uses, so
    the float column itself crosses the value-exact gate. Rank order
    (lift desc, fg_df desc, term asc); query terms excluded; terms with
    fg_df < min_fg excluded (the noise floor every significant-terms
    implementation applies).
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.textstats import _tokens
    from .serve import load_global_df

    idx = build_documents_index_nostem(sf_dir)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    qset = queries or SIGTERMS_QUERY_SET
    n_total = int(idx.stats.num_documents)
    matches = [(i, np.asarray(searcher.match(q), dtype=np.int64))
               for i, q in enumerate(qset)]
    n_fg = {i: int(ids.size) for i, ids in matches}
    stems = {i: set(query_stems(q, stemmer=identity_stemmer))
             for i, q in enumerate(qset)}
    match_ref = ray.put(matches)
    # background df: the per-term global df the build already persisted
    # (one tiny `_df.parquet` per bucket) — vocab-sized Arrow, broadcast
    # once; tasks binary-search it zero-copy (serve-pool contract)
    df_tbl = load_global_df(idx)
    df_ref = ray.put(df_tbl)

    def fg_partial(batch: pa.Table) -> pa.Table:
        # per-batch partial (query_idx, term, fg_df) counts — the
        # related_terms kernel: one dictionary-encode per batch, match
        # membership via merge-scan into the broadcast sorted id arrays
        pairs = ray.get(match_ref)
        _n, flat, parents = _tokens(batch)
        out_q: list[int] = []
        out_t: list[str] = []
        out_d: list[int] = []
        if len(flat):
            flat = pc.utf8_lower(flat)
            enc = pc.dictionary_encode(flat).combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            vocab = enc.dictionary.to_pylist()
            par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
            docs = batch["doc_id"].to_numpy(zero_copy_only=False)
            pardoc = docs[par]
            key = par * len(vocab) + codes  # distinct (doc, term) key
            for i, ids in pairs:
                if ids.size == 0:
                    continue
                pos = np.searchsorted(ids, pardoc)
                hit = ((pos < ids.size)
                       & (ids[np.minimum(pos, ids.size - 1)] == pardoc))
                if not hit.any():
                    continue
                uniq = np.unique(key[hit])
                term_idx = (uniq % len(vocab)).astype(np.int64)
                cnt = np.bincount(term_idx, minlength=len(vocab))
                nz = np.flatnonzero(cnt)
                out_q.extend([i] * nz.size)
                out_t.extend(vocab[j] for j in nz.tolist())
                out_d.extend(cnt[nz].tolist())
        return pa.table({
            "query_idx": pa.array(out_q, type=pa.int64()),
            "term": pa.array(out_t, type=pa.string()),
            "fg_df": pa.array(out_d, type=pa.int64()),
        })

    def attach_bg(batch: pa.Table) -> pa.Table:
        # broadcast join: bg_df via Arrow index_in against the global df
        # table (vocab-sized, ONE plasma copy per node, zero-copy here —
        # materializing the term column to Python objects per batch
        # cost tens of MB of allocation per worker per batch)
        bg = ray.get(df_ref)
        dfs = bg["df"].to_numpy(zero_copy_only=False)
        pos = pc.index_in(batch["term"],
                          value_set=bg["term"].combine_chunks()
                          if isinstance(bg["term"], pa.ChunkedArray)
                          else bg["term"])
        # every foreground term occurs in >=1 doc, so it MUST be in the
        # global vocabulary — a miss is an index/corpus mismatch
        if pos.null_count:
            raise KeyError("foreground term missing from index df table")
        idx = pos.to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "bg_df", pa.array(dfs[idx], type=pa.int64()))

    def topk(group: pa.Table) -> pa.Table:
        i = int(group["query_idx"][0].as_py())
        own = pa.array(sorted(stems[i]), type=pa.string())
        keep = pc.and_(
            pc.invert(pc.is_in(group["term"], value_set=own)),
            pc.greater_equal(group["fg_df"], min_fg))
        g = group.filter(keep)
        fg = g["fg_df"].to_numpy(zero_copy_only=False).astype(np.int64)
        bg = g["bg_df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # exact int64 products, one rounded division — the oracle's
        # (fg_df * n)::DOUBLE / (bg_df * n_fg)::DOUBLE expression
        lift = (fg * n_total).astype(np.float64) / \
            (bg * np.int64(n_fg[i])).astype(np.float64)
        g = g.append_column("lift", pa.array(lift))
        order = pc.sort_indices(
            g, sort_keys=[("lift", "descending"),
                          ("fg_df", "descending"),
                          ("term", "ascending")])[:k]
        g = g.take(order)
        g = g.append_column(
            "rank", pa.array(np.arange(1, g.num_rows + 1,
                                       dtype=np.int64)))
        return g.select(["query_idx", "rank", "term", "fg_df",
                         "bg_df", "lift"])

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    agg = (ds.map_batches(fg_partial, batch_format="pyarrow")
             .groupby(["query_idx", "term"]).aggregate(Sum("fg_df"))
             .rename_columns(["query_idx", "term", "fg_df"])
             .map_batches(attach_bg, batch_format="pyarrow")
             .groupby("query_idx").map_groups(topk,
                                              batch_format="pyarrow"))
    batches = [b for b in agg.iter_batches(batch_format="pyarrow")
               if b.num_rows]
    if not batches:  # all groups filtered to nothing (e.g. min_fg high)
        return pa.table({
            "query_idx": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "fg_df": pa.array([], type=pa.int64()),
            "bg_df": pa.array([], type=pa.int64()),
            "lift": pa.array([], type=pa.float64()),
        })
    tbl = pa.concat_tables(batches)
    return pa.table({
        "query_idx": tbl["query_idx"].cast(pa.int64()),
        "rank": tbl["rank"].cast(pa.int64()),
        "term": tbl["term"].cast(pa.string()),
        "fg_df": tbl["fg_df"].cast(pa.int64()),
        "bg_df": tbl["bg_df"].cast(pa.int64()),
        "lift": tbl["lift"].cast(pa.float64()),
    })


def numeric_histogram_table(sf_dir: str,
                            queries: list[str] | None = None,
                            width: int = HISTOGRAM_WIDTH) -> pa.Table:
    """(query_idx, bucket_lo, n_docs) — fixed-width histogram facets of
    ``n_chars`` over each query's match set (empty buckets omitted,
    bucket_lo = floor(value/width)*width). Match via posting lists,
    values via the pruned doc-values gather — O(matches) work, no
    documents scan."""
    idx = build_documents_index_nostem(sf_dir)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    ni = numeric_index_for(sf_dir)
    qi, lo, nd = [], [], []
    for i, q in enumerate(queries or HISTOGRAM_QUERY_SET):
        ids = searcher.match(q)
        if ids.size == 0:
            continue
        vals = ni.gather("n_chars", ids)
        # int64-valued field carried as float64: exact below 2^53
        buckets = (np.floor_divide(vals, width) * width).astype(np.int64)
        uniq, cnt = np.unique(buckets, return_counts=True)
        qi.extend([i] * uniq.size)
        lo.extend(uniq.tolist())
        nd.extend(cnt.tolist())
    return pa.table({
        "query_idx": pa.array(qi, type=pa.int64()),
        "bucket_lo": pa.array(lo, type=pa.int64()),
        "n_docs": pa.array(nd, type=pa.int64()),
    })


def function_score_table(sf_dir: str,
                         queries: list[str] | None = None,
                         k: int = BM25_NOSTEM_K) -> pa.Table:
    """(query_idx, rank, doc_id) RANK-ONLY function-score top-k:
    ``score = bm25(q, d) * (1.0 + n_chars(d)/1000.0)``.

    Exactness: the rescore window is the whole match set —
    ``bm25(q, k=|match|)`` returns every matching doc's bit-identical
    left-fold score (the bm25_topk_nostem contract), the boost factor
    uses one exact int64→float64 conversion + one rounded division +
    one rounded multiply, the same float64 expression shape as the SQL
    oracle — so the (score desc, doc_id asc) rank order matches the
    oracle exactly, ties included."""
    idx = build_documents_index_nostem(sf_dir)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    ni = numeric_index_for(sf_dir)
    qi, rk, di = [], [], []
    for i, q in enumerate(queries or BM25_NOSTEM_QUERY_SET):
        n_match = int(searcher.match(q).size)
        if n_match == 0:
            continue
        ranked = searcher.bm25(q, k=n_match)  # full-window rescore
        ids = np.array([d for d, _ in ranked], dtype=np.int64)
        scores = np.array([s for _, s in ranked], dtype=np.float64)
        boost = 1.0 + ni.gather("n_chars", ids) / FUNCSCORE_BOOST_DIVISOR
        final = scores * boost
        sel = np.lexsort((ids, -final))[:k]
        for r, j in enumerate(sel.tolist(), start=1):
            qi.append(i)
            rk.append(r)
            di.append(int(ids[j]))
    return pa.table({
        "query_idx": pa.array(qi, type=pa.int64()),
        "rank": pa.array(rk, type=pa.int64()),
        "doc_id": pa.array(di, type=pa.int64()),
    })


# Proximity-boost pairs: hot pairs with real co-occurrence spread, an
# adjacent pair (mindist 1), and a pair that rarely co-occurs.
PROX_BOOST_PAIRS: list[tuple[str, str]] = [
    ("hash", "join"),
    ("spark", "window"),
    ("order", "fast"),
    ("merge", "part"),
]
PROX_BOOST_K = 10


def proximity_boost_table(sf_dir: str,
                          pairs: list[tuple[str, str]] | None = None,
                          k: int = PROX_BOOST_K) -> pa.Table:
    """(query_idx, rank, doc_id) RANK-ONLY proximity-boosted top-k for
    two-term queries: ``score = bm25("a b", d) * (1 + 1/(1 + mindist))``
    where ``mindist`` is the minimum |pos_a − pos_b| in the doc — the
    classic second-stage ranker (Lucene sloppy-phrase boost / Indri
    term-dependence shape): lexical relevance from the inverted index,
    a term-dependence feature from the positional index.

    Exactness: candidates are the docs containing BOTH terms
    (``PositionalSearcher.min_pair_distance``), ranked by
    ``bm25(..., allowed=candidates, k=|candidates|)`` — bit-identical
    full-window scores (the bm25_topk_nostem contract) — then one
    int64→float64 conversion, one add, one division, one add, one
    multiply: the same float64 expression shape as the SQL oracle, so
    ranks match ties included."""
    from .flagship import phrase_index_for
    from .positional import PositionalSearcher

    idx = build_documents_index_nostem(sf_dir)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    pos = PositionalSearcher(phrase_index_for(sf_dir))
    qi, rk, di = [], [], []
    for i, (a, b) in enumerate(pairs or PROX_BOOST_PAIRS):
        docs, mind = pos.min_pair_distance(a, b)
        if docs.size == 0:
            continue
        ranked = searcher.bm25(f"{a} {b}", k=docs.size, allowed=docs)
        ids = np.array([d for d, _ in ranked], dtype=np.int64)
        scores = np.array([s for _, s in ranked], dtype=np.float64)
        # every allowed doc contains both terms, so |ranked| == |docs|
        md = mind[np.searchsorted(docs, ids)].astype(np.float64)
        final = scores * (1.0 + 1.0 / (1.0 + md))
        sel = np.lexsort((ids, -final))[:k]
        for r, j in enumerate(sel.tolist(), start=1):
            qi.append(i)
            rk.append(r)
            di.append(int(ids[j]))
    return pa.table({
        "query_idx": pa.array(qi, type=pa.int64()),
        "rank": pa.array(rk, type=pa.int64()),
        "doc_id": pa.array(di, type=pa.int64()),
    })
