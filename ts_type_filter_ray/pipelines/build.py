"""Distributed index build: corpus Dataset → compressed postings + docs
table + global stats, all Parquet under one index root.

Ray-Data-first shape (SURVEY.md §3.1 "Ray shape", §7):

  corpus ──map_batches(prep_docs)──────────► docs/   (doc_id, sha256, doc_len, …)
         └─map_batches(TokenizePartials)──► partial posting rows
               groupby(["term","part"]) ──► merged rows     (the ONE shuffle)
               map_batches(PostingCompressor, actor pool) ─► postings/
  docs ── Count/Sum aggregates ───────────► stats.json  (N, avgdl → BM25)
  postings ─ groupby("term").sum(df) ─────► df/ (term → global df)

The per-batch partial aggregation inside ``TokenizePartials`` is the
combiner that bounds the shuffle; ``part = doc_id >> doc_part_bits``
bounds every merge group (hot-term skew, SURVEY.md §4). Postings are
written partitioned by ``bucket = hash(term) % num_term_buckets`` so a
query routes to its buckets' files only.

Index root layout (all Parquet + one JSON):
  root/docs/*.parquet       root/postings/bucket=*/*.parquet
  root/df/*.parquet         root/stats.json
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..oracle.index import BM25_B, BM25_K1
from ..stages.tokenizer import (DEFAULT_DOC_PART_BITS, TokenizePartials,
                                make_bucket_merger, prep_docs)
from ..state.postings import term_bucket  # noqa: F401  (re-export for query)

DEFAULT_TERM_BUCKETS = 32


@dataclass
class IndexStats:
    num_documents: int
    total_doc_len: int
    num_unique_terms: int
    num_postings: int
    k1: float
    b: float
    doc_part_bits: int
    num_term_buckets: int

    @property
    def avgdl(self) -> float:
        # int-sum / int-count: bit-identical to the oracle's
        # sum(self._doc_len) / n (oracle/index.py).
        return self.total_doc_len / self.num_documents


@dataclass
class BuiltIndex:
    root: str
    stats: IndexStats

    @property
    def docs_dir(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def postings_dir(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def df_dir(self) -> str:
        return os.path.join(self.root, "df")

    @classmethod
    def load(cls, root: str) -> "BuiltIndex":
        with open(os.path.join(root, "stats.json")) as f:
            return cls(root=root, stats=IndexStats(**json.load(f)))


def build_index(corpus: Dataset, out_dir: str, *,
                doc_part_bits: int = DEFAULT_DOC_PART_BITS,
                num_term_buckets: int = DEFAULT_TERM_BUCKETS,
                tokenize_batch_size: int = 256,
                tokenize_concurrency: int | tuple[int, int] | None = None,
                breaker=None, stemmer=None,
                k1: float = BM25_K1, b: float = BM25_B) -> BuiltIndex:
    """Build the full index under *out_dir* and return its handle.

    *corpus* must have columns ``doc_id:int64, content:(large_)string``
    (plus any metadata columns, carried into ``docs/``).
    """
    os.makedirs(out_dir, exist_ok=True)

    import ray.data as rd

    # Pass A — docs table + global doc stats (content never leaves the
    # tasks). The aggregate reads the written docs table back, pruned to
    # doc_len, instead of re-executing prep.
    docs = corpus.map_batches(prep_docs, batch_format="pyarrow")
    docs.write_parquet(os.path.join(out_dir, "docs"))
    agg = rd.read_parquet(os.path.join(out_dir, "docs"),
                          columns=["doc_len"]).aggregate(
        Count(alias_name="n"), Sum("doc_len", alias_name="total_dl"))
    n_docs = int(agg["n"])
    if n_docs == 0:
        raise ValueError("cannot build an index over an empty corpus")
    total_dl = int(agg["total_dl"])
    avgdl = total_dl / n_docs

    # Pass B — tokenize → partial postings → bucket shuffle → vectorized
    # merge+compress per bucket (the ONE wide shuffle; keyed by term
    # bucket so group count is small and the merge is vectorized).
    partials = corpus.select_columns(["doc_id", "content"]).map_batches(
        TokenizePartials,
        fn_constructor_args=(doc_part_bits, num_term_buckets,
                             breaker, stemmer),
        batch_format="pyarrow",
        batch_size=tokenize_batch_size,
        concurrency=tokenize_concurrency or (1, 16))
    compressed = partials.groupby("bucket").map_groups(
        make_bucket_merger(avgdl, k1, b), batch_format="pyarrow")
    compressed.write_parquet(os.path.join(out_dir, "postings"),
                             partition_cols=["bucket"])

    # Small global df table (term → df across parts) for idf + stats.
    post_meta = rd.read_parquet(os.path.join(out_dir, "postings"),
                                columns=["term", "df"])
    df_tbl = post_meta.groupby("term").aggregate(Sum("df", alias_name="df"))
    df_tbl.write_parquet(os.path.join(out_dir, "df"))
    df_agg = rd.read_parquet(os.path.join(out_dir, "df")).aggregate(
        Count(alias_name="n_terms"), Sum("df", alias_name="n_postings"))

    stats = IndexStats(
        num_documents=n_docs,
        total_doc_len=total_dl,
        num_unique_terms=int(df_agg["n_terms"]),
        num_postings=int(df_agg["n_postings"]),
        k1=k1, b=b,
        doc_part_bits=doc_part_bits,
        num_term_buckets=num_term_buckets,
    )
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats.__dict__, f, indent=1)
    return BuiltIndex(root=out_dir, stats=stats)
