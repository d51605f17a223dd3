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
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..oracle.index import BM25_B, BM25_K1
from ..stages.tokenizer import (DEFAULT_DOC_PART_BITS, TokenizePartials,
                                merge_partials, prep_docs)
from ..state import postings as plib

DEFAULT_TERM_BUCKETS = 32


def term_bucket(term: str, num_buckets: int) -> int:
    """Stable cross-process term → bucket hash (zlib.crc32, not hash())."""
    return zlib.crc32(term.encode("utf-8")) % num_buckets


class PostingCompressor:
    """Stateful actor-pool stage: merged rows → delta/varint-compressed
    posting rows with block-max metadata (north-star mandated layout).
    avgdl/k1/b are fixed per build → constructor state, once per actor."""

    def __init__(self, avgdl: float, k1: float, b: float, num_buckets: int):
        self._avgdl = avgdl
        self._k1 = k1
        self._b = b
        self._buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        enc_docs, enc_tfs, enc_dls, impacts, buckets = [], [], [], [], []
        for i in range(batch.num_rows):
            doc_ids = np.asarray(batch["doc_ids"][i].as_py(), dtype=np.int64)
            tfs = np.asarray(batch["tfs"][i].as_py(), dtype=np.int64)
            dls = np.asarray(batch["dls"][i].as_py(), dtype=np.int64)
            enc_docs.append(plib.encode_doc_ids(doc_ids))
            enc_tfs.append(plib.encode_varints(tfs))
            enc_dls.append(plib.encode_varints(dls))
            impacts.append(plib.max_impact(tfs, dls, self._avgdl, self._k1, self._b))
            buckets.append(term_bucket(terms[i], self._buckets))
        return pa.table({
            "term": batch["term"],
            "part": batch["part"],
            "bucket": pa.array(buckets, type=pa.int32()),
            "df": batch["df"],
            "doc_ids_enc": pa.array(enc_docs, type=pa.large_binary()),
            "tfs_enc": pa.array(enc_tfs, type=pa.large_binary()),
            "dls_enc": pa.array(enc_dls, type=pa.large_binary()),
            "max_impact": pa.array(impacts, type=pa.float64()),
        })


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

    # Pass B — tokenize → partial postings → shuffle → merge → compress.
    partials = corpus.select_columns(["doc_id", "content"]).map_batches(
        TokenizePartials,
        fn_constructor_args=(doc_part_bits,),
        batch_format="pyarrow",
        batch_size=tokenize_batch_size,
        concurrency=tokenize_concurrency or (1, 16))
    merged = partials.groupby(["term", "part"]).map_groups(
        merge_partials, batch_format="pyarrow")
    compressed = merged.map_batches(
        PostingCompressor,
        fn_constructor_args=(avgdl, k1, b, num_term_buckets),
        batch_format="pyarrow",
        concurrency=(1, 8))
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
