"""Distributed index build: corpus Dataset → compressed postings + docs
table + global stats, all Parquet under one index root.

Ray-Data-first shape (SURVEY.md §3.1 "Ray shape", §7):

  corpus ─map_batches(TokenizePartials, emit_meta=True) ─ ONE pass:
               partial posting rows + per-doc metadata rows
               write_parquet(partition_cols=["bucket"]) ► partials/bucket=*
               (metadata rows land under bucket=-1)
  bucket=-1 ──map_batches(meta_rows_to_docs)──► docs/  (doc_id, sha256, …)
  docs ── Count/Sum aggregates ───────────► stats.json  (N, avgdl → BM25)
  bucket>=0 ── one merge task per bucket ─► postings/bucket=* (+ counters)

The per-batch partial aggregation inside ``TokenizePartials`` is the
combiner that bounds the exchange; ``part = doc_id >> doc_part_bits``
bounds every posting row (hot-term skew, SURVEY.md §4). The exchange
itself is a **bucket-partitioned Parquet spill** rather than an
object-store groupby shuffle — measured faster and better-scaling here,
and it doubles as the checkpoint artifact (state/manifest.py shares the
layout and the merge). Postings land partitioned by
``bucket = crc32(term) % num_term_buckets`` so a query routes to its
buckets' files only; per-term df stays derivable because each term lives
in exactly one bucket.

Index root layout (all Parquet + one JSON):
  root/docs/*.parquet     root/postings/bucket=*/merged.parquet
  root/stats.json         (root/partials/bucket=* during the build)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..oracle.index import BM25_B, BM25_K1
from ..stages.tokenizer import DEFAULT_DOC_PART_BITS, TokenizePartials
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

    @classmethod
    def load(cls, root: str) -> "BuiltIndex":
        with open(os.path.join(root, "stats.json")) as f:
            return cls(root=root, stats=IndexStats(**json.load(f)))


def build_index(corpus: Dataset, out_dir: str, *,
                doc_part_bits: int = DEFAULT_DOC_PART_BITS,
                num_term_buckets: int = DEFAULT_TERM_BUCKETS,
                tokenize_batch_size: int = 256,
                tokenize_concurrency: int | tuple[int, int] | None = None,
                breaker=None, stemmer=None, keep_partials: bool = False,
                k1: float = BM25_K1, b: float = BM25_B) -> BuiltIndex:
    """Build the full index under *out_dir* and return its handle.

    *corpus* must have columns ``doc_id:int64, content:(large_)string``
    (plus any metadata columns, carried into ``docs/``).
    """
    os.makedirs(out_dir, exist_ok=True)

    import shutil

    import ray.data as rd

    # ONE corpus pass — tokenize emits partial posting rows AND per-doc
    # metadata rows (sha256/doc_len, ``bucket = -1``) in the same stream,
    # spilled to Parquet partitioned by term bucket. This replaces an
    # in-object-store groupby shuffle with a shuffle-free partitioned
    # write: each tokenize task appends its own files under every bucket
    # directory (dictionary-encoded + snappy on disk ≈ 3-4x smaller than
    # the in-memory exchange). The combined stream halves corpus reads vs
    # the r1 two-pass layout and keeps doc_len on the same breaker as the
    # postings.
    partials_dir = os.path.join(out_dir, "partials")
    shutil.rmtree(partials_dir, ignore_errors=True)
    partials = corpus.map_batches(
        TokenizePartials,
        fn_constructor_args=(doc_part_bits, num_term_buckets,
                             breaker, stemmer, True),
        batch_format="pyarrow",
        batch_size=tokenize_batch_size,
        concurrency=tokenize_concurrency or (1, 16))
    partials.write_parquet(partials_dir, partition_cols=["bucket"])

    # docs table + global doc stats from the (small, content-free)
    # metadata partition
    from ..stages.tokenizer import meta_rows_to_docs
    if not os.path.isdir(os.path.join(partials_dir, "bucket=-1")):
        raise ValueError("cannot build an index over an empty corpus")
    docs_dir = os.path.join(out_dir, "docs")
    shutil.rmtree(docs_dir, ignore_errors=True)
    (rd.read_parquet(os.path.join(partials_dir, "bucket=-1"))
       .map_batches(meta_rows_to_docs, batch_format="pyarrow")
       .write_parquet(docs_dir))
    agg = rd.read_parquet(docs_dir, columns=["doc_len"]).aggregate(
        Count(alias_name="n"), Sum("doc_len", alias_name="total_dl"))
    n_docs = int(agg["n"])
    if n_docs == 0:
        raise ValueError("cannot build an index over an empty corpus")
    total_dl = int(agg["total_dl"])
    avgdl = total_dl / n_docs

    # one merge task per bucket directory (shared-nothing: bucket
    # partitioning makes each task independent; idempotent
    # partition-named outputs allow re-runs to skip finished buckets).
    shutil.rmtree(os.path.join(out_dir, "postings"), ignore_errors=True)
    n_terms, n_postings = merge_partial_buckets(
        partials_dir, os.path.join(out_dir, "postings"), avgdl, k1, b)

    if not keep_partials:
        shutil.rmtree(partials_dir, ignore_errors=True)

    stats = IndexStats(
        num_documents=n_docs,
        total_doc_len=total_dl,
        num_unique_terms=n_terms,
        num_postings=n_postings,
        k1=k1, b=b,
        doc_part_bits=doc_part_bits,
        num_term_buckets=num_term_buckets,
    )
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats.__dict__, f, indent=1)
    return BuiltIndex(root=out_dir, stats=stats)


def _merge_one_bucket(bucket_dirs: list[str], out_dir: str, bucket: int,
                      avgdl: float, k1: float, b: float) -> tuple[int, int]:
    """Merge one bucket's partial files into its final postings file.
    Returns (distinct terms, total postings). Idempotent: writes to a
    temp file and renames; a ``_SUCCESS`` marker short-circuits re-runs."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..stages.tokenizer import merge_bucket_table

    dest = os.path.join(out_dir, f"bucket={bucket}")
    marker = os.path.join(dest, "_SUCCESS")
    if os.path.exists(marker):
        tbl = pq.read_table(os.path.join(dest, "merged.parquet"),
                            columns=["term", "df"])
    else:
        files = [os.path.join(d, f)
                 for d in bucket_dirs for f in sorted(os.listdir(d))
                 if f.endswith(".parquet")]
        part_tbl = pads.dataset(files).to_table()
        part_tbl = part_tbl.append_column(
            "bucket", pa.array([bucket] * part_tbl.num_rows, type=pa.int32()))
        merged = merge_bucket_table(part_tbl, avgdl, k1, b)
        merged = merged.drop_columns(["bucket"])  # hive dir carries it
        os.makedirs(dest, exist_ok=True)
        tmp = os.path.join(dest, ".merged.parquet.tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, os.path.join(dest, "merged.parquet"))
        open(marker, "w").close()
        tbl = merged
    import pyarrow.compute as pc
    n_terms = pc.count_distinct(tbl["term"]).as_py()
    n_postings = pc.sum(tbl["df"]).as_py() or 0
    return int(n_terms), int(n_postings)


def merge_partial_buckets(partials_dir: str, postings_dir: str,
                          avgdl: float, k1: float, b: float) -> tuple[int, int]:
    """Launch one Ray task per ``bucket=*`` partial directory and reduce
    their (n_terms, n_postings) counters. Raw ``ray.remote`` tasks by
    design: the data is already partitioned on disk, so this is a
    shared-nothing per-partition job — a Dataset ``groupby`` here would
    re-shuffle data that is already placed (SURVEY.md §7; every term
    lives in exactly one bucket, so per-bucket distinct-term counts sum
    to the global count)."""
    import ray

    os.makedirs(postings_dir, exist_ok=True)
    # discover bucket=<i> dirs (directly under partials_dir, or nested
    # one level down under shard=<s>/ for the checkpointed build)
    by_bucket: dict[int, list[str]] = {}

    def scan(d: str) -> None:
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if not os.path.isdir(p):
                continue
            if name.startswith("bucket="):
                bucket = int(name.split("=", 1)[1])
                if bucket >= 0:
                    by_bucket.setdefault(bucket, []).append(p)
            elif name.startswith("shard="):
                scan(p)

    scan(partials_dir)
    merge_task = ray.remote(_merge_one_bucket)
    refs = [merge_task.remote(dirs, postings_dir, bucket, avgdl, k1, b)
            for bucket, dirs in sorted(by_bucket.items())]
    results = ray.get(refs)
    n_terms = sum(r[0] for r in results)
    n_postings = sum(r[1] for r in results)
    return n_terms, n_postings
