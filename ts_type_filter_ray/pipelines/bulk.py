"""Bulk (set-at-a-time) query execution: stream a QUERY TABLE through a
searcher actor pool.

The reference answers one query per ``Index.match()`` call on a single
process (``inverted_index.py:71-101``); its flagship consumer loops a
suite of cases over one shared in-process index (``menu.py:126-135``).
At engine scale the analogous workload is a *table* of queries — an
evaluation suite, a query log replay, a decontamination probe list —
executed against one built index. That is a Dataset problem, not a
driver-loop problem: queries become rows, the index becomes per-actor
state, and the match/top-k work streams through
``map_batches(BulkSearcher, concurrency=N)`` with backpressure, exactly
the "stateful stages are actor pools" shape (SURVEY.md §2.3 A3).

Parallelism axes, and when to pick which:

- **Query-partitioned** (this module): every actor holds the whole
  index (or its warm subset), queries shard across actors. Right when
  the index fits a node and query throughput is the bottleneck.
- **Doc-partitioned** (``pipelines/serve.py``): one query fans out to
  actors holding disjoint doc partitions. Right when the index itself
  outgrows a node.
- At 100 TB both compose: shard queries across REPLICA GROUPS, each
  group a doc-partitioned pool. The per-actor state here is
  ``LocalSearcher`` either way, so the composition is wiring, not new
  machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .build import BuiltIndex
from .query import LocalSearcher


class BulkSearcher:
    """``map_batches`` actor: a warm :class:`LocalSearcher` built ONCE in
    ``__init__`` (index open + ingest is the expensive part — never per
    batch), then each ``__call__`` answers one Arrow batch of queries.

    The per-row loop here iterates *queries* (each row IS one query);
    the per-query work — posting decode, set union, scoring — is the
    vectorized numpy machinery inside ``LocalSearcher``. ``mode``:

    - ``"match"``  → (query_idx, doc_id) boolean-match rows
    - ``"bm25"``   → (query_idx, rank, doc_id) rank-only top-k rows
    """

    def __init__(self, index_root: str, *, mode: str = "match",
                 k: int = 10, stemmer=None, breaker=None,
                 buckets: list[int] | None = None):
        if mode not in ("match", "bm25"):
            raise ValueError(f"unknown bulk mode {mode!r}")
        self._searcher = LocalSearcher(BuiltIndex.load(index_root),
                                       buckets=buckets, stemmer=stemmer,
                                       breaker=breaker)
        self._mode = mode
        self._k = int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qidx = batch["query_idx"].to_numpy(zero_copy_only=False)
        queries = batch["query"].to_pylist()
        if self._mode == "match":
            ids = [self._searcher.match(q) for q in queries]
            reps = np.array([a.size for a in ids], dtype=np.int64)
            return pa.table({
                "query_idx": pa.array(np.repeat(qidx, reps),
                                      type=pa.int64()),
                "doc_id": pa.array(
                    np.concatenate(ids) if ids
                    else np.empty(0, dtype=np.int64), type=pa.int64()),
            })
        qi_out, rank_out, doc_out = [], [], []
        for qi, q in zip(qidx.tolist(), queries):
            hits = self._searcher.bm25(q, k=self._k)
            for rank, (doc_id, _score) in enumerate(hits, start=1):
                qi_out.append(qi)
                rank_out.append(rank)
                doc_out.append(doc_id)
        return pa.table({
            "query_idx": pa.array(qi_out, type=pa.int64()),
            "rank": pa.array(rank_out, type=pa.int64()),
            "doc_id": pa.array(doc_out, type=pa.int64()),
        })


def _as_query_dataset(queries, concurrency: int = 2) -> Dataset:
    """A list of query strings → (query_idx, query) Dataset, split into
    enough blocks that every actor in a pool of *concurrency* receives
    work (a fixed small block count would idle actors above it)."""
    import ray.data

    tbl = pa.table({
        "query_idx": pa.array(range(len(queries)), type=pa.int64()),
        "query": pa.array([q if isinstance(q, str) else " ".join(q)
                           for q in queries], type=pa.string()),
    })
    cap = max(8, 2 * max(1, concurrency))
    return ray.data.from_arrow(tbl).repartition(
        max(2, min(cap, len(queries) // 8)))


def bulk_match(index_root: str, queries: Dataset | list, *,
               stemmer=None, breaker=None, concurrency: int = 2,
               batch_size: int = 64) -> Dataset:
    """Boolean-match every query row against the index at *index_root*:
    (query_idx, query) rows in → (query_idx, doc_id) match rows out,
    executed by a :class:`BulkSearcher` actor pool. Pass a ``Dataset``
    (e.g. ``read_parquet`` over a query log) or a plain list."""
    ds = (queries if isinstance(queries, Dataset)
          else _as_query_dataset(queries, concurrency))
    return ds.map_batches(
        BulkSearcher,
        fn_constructor_kwargs={"index_root": index_root, "mode": "match",
                               "stemmer": stemmer, "breaker": breaker},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def bulk_bm25(index_root: str, queries: Dataset | list, *, k: int = 10,
              stemmer=None, breaker=None, concurrency: int = 2,
              batch_size: int = 64) -> Dataset:
    """BM25 top-*k* for every query row: (query_idx, query) in →
    (query_idx, rank, doc_id) rank-only rows out (scores are pure
    functions of (tf, df, N, avgdl) — identical across actors, so
    rank-only output keeps the result schema hash-stable)."""
    ds = (queries if isinstance(queries, Dataset)
          else _as_query_dataset(queries, concurrency))
    return ds.map_batches(
        BulkSearcher,
        fn_constructor_kwargs={"index_root": index_root, "mode": "bm25",
                               "k": k, "stemmer": stemmer,
                               "breaker": breaker},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
