"""Federated search: query INDEPENDENTLY BUILT indexes as one corpus.

The shard-merge lifecycle (``pipelines/shard_merge.py``) combines
indexes physically; federation combines them at QUERY TIME — the shape
a multi-tenant / rolling-ingest deployment actually runs, where index
shards are built by different jobs on different nodes and never
co-reside. The classic correctness trap is shard-local statistics: a
term rare in shard A but common in shard B gets a huge idf from A's
local df and A's docs outrank B's for the wrong reason (Elasticsearch's
``dfs_query_then_fetch`` exists precisely to fix this).

This module is the DFS phase done right:

1. **Stats merge (once per federation, not per query)** — global
   ``N = Σ num_documents``, ``total_doc_len = Σ total_doc_len`` (⇒ the
   global avgdl), and the merged (term, df) table summed from each
   index's persisted per-bucket ``_df.parquet`` files (tiny,
   column-pruned reads — never a postings scan).
2. **Every shard scores with the global stats** —
   :meth:`LocalSearcher.set_global_stats` overrides N/avgdl/df and
   re-validates the shard's block-max bounds under the global avgdl
   via ``impact_correction`` (bounds frozen at the shard's own build
   avgdl stay exact upper bounds), so WAND pruning keeps working.
3. **Top-k merge** — each shard returns its local top-k; the
   coordinator merges by the single-index contract
   (score desc, doc_id asc, shard asc).

Exactness: per-doc BM25 scores are **bit-identical** to one merged
index over the union corpus — both sides run the same float64
expressions with the same (N, df, avgdl, k1, b) and the same
ascending-term left fold; federation only changes WHERE a doc's
postings live, never its (tf, dl) or the constants (pytest-pinned,
including shards that were themselves LSM-extended).

Scale: the DFS phase moves O(vocab) bytes once (the df tables);
queries fan out k-sized results only — O(shards · k) coordinator
work per query, no posting ever crosses shards.
"""

from __future__ import annotations

import pyarrow as pa

from .build import BuiltIndex
from .query import LocalSearcher
from .serve import load_global_df

__all__ = ["FederatedSearcher", "merged_global_df"]


def merged_global_df(indexes: list[BuiltIndex]) -> pa.Table:
    """Merged term-ascending (term, df) over *indexes* — per-index
    global df tables concatenated and summed (a term may live in any
    subset of the shards)."""
    parts = [load_global_df(ix) for ix in indexes]
    merged = pa.concat_tables(parts)
    return (merged.group_by("term").aggregate([("df", "sum")])
            .rename_columns(["term", "df"]).sort_by("term"))


class FederatedSearcher:
    """Query a list of independently built indexes as one corpus.

    ``doc_id``\\ s should be globally unique across the shards (the
    builder's contract for corpora split by doc range); results carry
    the shard index anyway, so collisions are representable — they
    just make the (score desc, doc_id asc) tie-break fall through to
    shard order."""

    def __init__(self, indexes, *, stemmer=None, breaker=None,
                 warm_top_terms: int = 0):
        self.indexes = [ix if isinstance(ix, BuiltIndex)
                        else BuiltIndex.load(ix) for ix in indexes]
        if not self.indexes:
            raise ValueError("federation needs at least one index")
        # warm AFTER the stats override: set_global_stats clears the
        # decoded cache (tf-factors bake avgdl), so warming at
        # construction would be thrown away
        self.searchers = [
            LocalSearcher(ix, stemmer=stemmer, breaker=breaker,
                          warm_top_terms=0)
            for ix in self.indexes]
        # DFS phase: one stats merge for the federation's lifetime
        n = sum(ix.stats.num_documents for ix in self.indexes)
        total_len = sum(ix.stats.total_doc_len for ix in self.indexes)
        df = merged_global_df(self.indexes)
        for s in self.searchers:
            s.set_global_stats(n, total_len, df)
            if warm_top_terms:
                s._init_cache(warm_top_terms)
        self.num_documents = n
        self.total_doc_len = total_len

    def match(self, query) -> list[tuple[int, int]]:
        """Boolean DISJUNCTIVE (any-term OR — ``LocalSearcher.match``
        semantics) match across every shard → (shard, doc_id) pairs,
        ordered (doc_id asc, shard asc)."""
        out = [(int(d), shard)
               for shard, s in enumerate(self.searchers)
               for d in s.match(query)]
        return [(shard, d) for d, shard in sorted(out)]

    def bm25(self, query, k: int = 10,
             boosts: dict[str, float] | None = None
             ) -> list[tuple[int, int, float]]:
        """Global top-k (shard, doc_id, score) — each shard's local
        top-k under the GLOBAL statistics, merged by
        (score desc, doc_id asc, shard asc). Exact: a shard's local
        top-k under global stats contains every global-top-k doc that
        lives in it."""
        rows = [(score, d, shard)
                for shard, s in enumerate(self.searchers)
                for d, score in s.bm25(query, k, boosts=boosts)]
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        return [(shard, d, score) for score, d, shard in rows[:k]]
