"""Persisted shingle index — incremental decontamination / containment
for recrawls: write a corpus's DISTINCT token-``k``-gram hash set ONCE
(hash-bucketed, sorted Parquet), then screen any later batch of
documents against it WITHOUT re-reading the original corpus. The
incremental counterpart of :mod:`decontam` (whose reference set rides
in the same job): at 100 TB the reference corpus is an artifact you
build once and probe forever, exactly like the inverted index.

Layout: ``<out>/bucket=<b>/*.parquet`` with a single sorted ``shingle``
uint64 column per bucket (``bucket = hash % num_buckets``) plus
``_meta.json`` (shingle_k, num_buckets, n_shingles). Probes group the
new corpus's shingles by the same bucketing, so each probe task reads
ONE reference bucket (≈ n_shingles/num_buckets rows, column-pruned) and
answers membership with one vectorized ``searchsorted`` — reference I/O
is O(index/num_buckets) per task and each bucket is read once per
probe job, not once per batch.

Hashes are the dedup family's order-sensitive Mersenne fold (equal
token sequences ⇒ equal hashes), so results are SQL-oracle checkable.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from .dedup import distinct_shingles_batch


def write_shingle_index(ds: Dataset, out_dir: str, shingle_k: int = 3,
                        num_buckets: int = 64) -> dict:
    """Build the persisted shingle set of *ds* (documents with
    ``doc_id``/``text``). Returns the meta dict. Corpus-wide dedup
    happens inside each bucket group (every occurrence of a hash lands
    in one bucket), so the artifact holds each distinct shingle exactly
    once, sorted within its bucket. Refuses a non-empty ``out_dir``
    (Ray's parquet writer APPENDS beside existing files, which would
    silently merge stale buckets into the artifact and its meta count —
    remove the old artifact first to rebuild)."""
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise FileExistsError(
            f"write_shingle_index: {out_dir!r} is not empty — remove the "
            "stale artifact before rebuilding (parquet writes append)")

    def explode(batch: pa.Table) -> pa.Table:
        _, sh = distinct_shingles_batch(batch, shingle_k)
        return pa.table({
            "bucket": pa.array((sh % num_buckets).astype(np.int32)),
            "shingle": pa.array(sh),
        })

    def dedupe(group: pa.Table) -> pa.Table:
        sh = np.unique(group["shingle"].to_numpy(zero_copy_only=False))
        return pa.table({
            "bucket": group["bucket"].slice(0, 1).combine_chunks().take(
                pa.array(np.zeros(len(sh), dtype=np.int64))),
            "shingle": pa.array(sh),
        })

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("bucket").map_groups(dedupe, batch_format="pyarrow"))
    out.write_parquet(out_dir, partition_cols=["bucket"])
    # count without re-reading data files: per-bucket footer metadata
    import pyarrow.dataset as pads
    n = pads.dataset(out_dir, partitioning="hive").count_rows()
    meta = {"shingle_k": shingle_k, "num_buckets": num_buckets,
            "n_shingles": int(n)}
    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def load_shingle_index_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_meta.json")) as f:
        return json.load(f)


def contaminated_against_index(ds: Dataset, index_dir: str) -> Dataset:
    """(doc_id, n_shingles, n_hits, hit_fraction) for every doc of *ds*
    sharing ≥ 1 distinct ``shingle_k``-gram with the persisted index
    (inner semantics — clean docs emit nothing, O(contaminated)
    output). ``shingle_k`` comes from the index meta, so probe and
    artifact can never disagree on the shingle definition.

    Each probe task owns one index bucket: it loads that bucket's
    sorted shingle column once, then answers membership for ALL of the
    new corpus's shingles in that bucket with one ``searchsorted`` —
    per-batch work never re-reads the reference."""
    meta = load_shingle_index_meta(index_dir)
    shingle_k = int(meta["shingle_k"])
    num_buckets = int(meta["num_buckets"])

    def explode(batch: pa.Table) -> pa.Table:
        did, sh = distinct_shingles_batch(batch, shingle_k)
        if did.size == 0:
            return pa.table({
                "bucket": pa.array([], type=pa.int32()),
                "shingle": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.int64()),
                "nsh": pa.array([], type=pa.int64()),
            })
        uniq, counts = np.unique(did, return_counts=True)
        nsh_of = counts[np.searchsorted(uniq, did)].astype(np.int64)
        return pa.table({
            "bucket": pa.array((sh % num_buckets).astype(np.int32)),
            "shingle": pa.array(sh),
            "doc_id": pa.array(did, type=pa.int64()),
            "nsh": pa.array(nsh_of),
        })

    def probe(group: pa.Table) -> pa.Table:
        b = group["bucket"][0].as_py()
        path = os.path.join(index_dir, f"bucket={b}")
        sh = group["shingle"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        nsh = group["nsh"].to_numpy(zero_copy_only=False)
        if os.path.isdir(path):
            import pyarrow.dataset as pads
            ref = np.unique(pads.dataset(path).to_table(
                columns=["shingle"])["shingle"].to_numpy(
                zero_copy_only=False))
        else:
            ref = np.empty(0, dtype=np.uint64)
        if len(ref):
            pos = np.searchsorted(ref, sh)
            hit = ref[np.minimum(pos, len(ref) - 1)] == sh
        else:
            hit = np.zeros(len(sh), dtype=bool)
        # per-doc partial hit counts within this bucket
        uniq, inv = np.unique(did, return_inverse=True)
        hits = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(hits, inv, hit.astype(np.int64))
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv] = np.arange(len(did))
        return pa.table({
            "doc_id": pa.array(uniq, type=pa.int64()),
            "n_shingles": pa.array(nsh[first]),
            "n_hits": pa.array(hits),
        })

    def finish(batch: pa.Table) -> pa.Table:
        hits = batch["n_hits"].to_numpy(zero_copy_only=False)
        keep = hits >= 1
        sub = batch.filter(pa.array(keep))
        n = sub["n_shingles"].to_numpy(zero_copy_only=False)
        h = sub["n_hits"].to_numpy(zero_copy_only=False)
        return sub.append_column(
            "hit_fraction", pa.array(h / n, type=pa.float64()))

    from ray.data.aggregate import Min
    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("bucket").map_groups(probe, batch_format="pyarrow")
            .groupby("doc_id")
            # every (doc, bucket) row carries the doc's FULL distinct-
            # shingle count, so Min (≡ Max ≡ any) recovers it; only the
            # per-bucket hit counts sum
            .aggregate(Min("n_shingles", alias_name="n_shingles"),
                       Sum("n_hits", alias_name="n_hits"))
            .map_batches(finish, batch_format="pyarrow"))
