"""Benchmark decontamination — find training documents that share
token n-grams with a held-out benchmark set, the standard pre-training
hygiene pass (remove eval-set leakage before training).

Shape (exact, no approximation, SQL-oracle checkable): each document
explodes to its DISTINCT shingle hashes (the same order-sensitive
Mersenne fold as the dedup family — equal token sequences ⇒ equal
hashes), tagged with whether the doc is in the benchmark set; rows
group by a coarse hash partition of the shingle space (every occurrence
of a shingle lands in one partition), and a vectorized segment scan
marks, per contaminated shingle, each training doc that shares it with
ANY benchmark doc; one small ``groupby(doc_id)`` sums the per-doc
contaminated-shingle counts. Shuffle volume is O(total shingles) — the
same partitioning the exact n-gram Jaccard operator relies on
(``dedup.ngram_jaccard_pairs``), with none of its O(df²) pair pass: the
scan emits at most one row per (training doc, shingle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

import ray

from .dedup import _shingle_hashes_batch, distinct_shingles_batch
from .partitioning import auto_num_parts

#: bloom parameters: 2^23 bits = 1 MiB, 4 probes — ~0.2% false-positive
#: rate at 1M bench shingles; false positives only cost verify traffic,
#: never correctness
_BLOOM_BITS_LOG2 = 23
_BLOOM_PROBES = 4


def _bloom_probe_idx(hs: np.ndarray) -> np.ndarray:
    """(len(hs), PROBES) bit indices via double hashing of the 64-bit
    shingle hashes (h1 + i·h2 — Kirsch–Mitzenmacher, public)."""
    h1 = hs
    h2 = (hs >> np.uint64(32)) | np.uint64(1)  # odd → full-period step
    i = np.arange(_BLOOM_PROBES, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            & np.uint64((1 << _BLOOM_BITS_LOG2) - 1))


def _set_bits(bitmap: np.ndarray, idx: np.ndarray) -> None:
    np.bitwise_or.at(bitmap, (idx >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (idx & np.uint64(63)))


def _test_bits(bitmap: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """All-probes-set test per row of idx."""
    words = bitmap[(idx >> np.uint64(6)).astype(np.int64)]
    hit = (words >> (idx & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


_EMPTY_EXPLODED = pa.table({
    "part": pa.array([], type=pa.int32()),
    "shingle": pa.array([], type=pa.uint64()),
    "doc_id": pa.array([], type=pa.int64()),
    "is_bench": pa.array([], type=pa.bool_()),
})


def decontaminate(ds: Dataset, bench_mod: int = 50, shingle_k: int = 3,
                  num_parts: int | None = None) -> Dataset:
    """(doc_id, n_shared_shingles) for every NON-benchmark doc sharing at
    least one distinct token ``shingle_k``-gram with any benchmark doc.

    The benchmark set here is intensional — ``doc_id % bench_mod == 0``
    — so the operator needs no second input and the DuckDB oracle can
    reproduce the membership; a real pipeline passes its eval set as the
    predicate (or unions a tagged benchmark Dataset in). Docs shorter
    than ``shingle_k`` tokens contribute their whole text as one shingle
    (the dedup family's convention). Benchmark docs themselves are not
    reported."""
    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def explode(batch: pa.Table) -> pa.Table:
        did, sh = distinct_shingles_batch(batch, shingle_k)
        if did.size == 0:
            return _EMPTY_EXPLODED
        return pa.table({
            "part": pa.array((sh % num_parts).astype(np.int32)),
            "shingle": pa.array(sh),
            "doc_id": pa.array(did),
            "is_bench": pa.array(did % bench_mod == 0),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_scan_shared, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_shared_shingles",
                           alias_name="n_shared_shingles")))


def _scan_shared(group: pa.Table) -> pa.Table:
    """Segment scan over one shingle partition: per training doc, the
    number of its distinct shingles whose segment contains any
    benchmark row."""
    sh = group["shingle"].to_numpy(zero_copy_only=False)
    did = group["doc_id"].to_numpy(zero_copy_only=False)
    bench = group["is_bench"].to_numpy(zero_copy_only=False)
    order = np.lexsort((did, sh))
    sh, did, bench = sh[order], did[order], bench[order]
    n = len(sh)
    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = sh[1:] != sh[:-1]
    seg_id = np.cumsum(new_seg) - 1
    # a segment is contaminated iff it contains a benchmark row
    seg_has_bench = np.zeros(seg_id[-1] + 1 if n else 0, dtype=bool)
    np.logical_or.at(seg_has_bench, seg_id, bench)
    hit = seg_has_bench[seg_id] & ~bench
    if not hit.any():
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "n_shared_shingles": pa.array(
                             [], type=pa.int64())})
    # shingles are distinct per doc, so each hit row is one distinct
    # shared shingle of that training doc
    hd = did[hit]
    uniq, counts = np.unique(hd, return_counts=True)
    return pa.table({
        "doc_id": pa.array(uniq, type=pa.int64()),
        "n_shared_shingles": pa.array(counts.astype(np.int64)),
    })


def decontaminate_bloom(ds: Dataset, bench_mod: int = 50,
                        shingle_k: int = 3,
                        num_parts: int | None = None) -> Dataset:
    """Same EXACT contract and output as :func:`decontaminate`, with the
    shuffle shrunk for the 100 TB shape (training corpus ≫ benchmark):
    the benchmark side (small by contract) builds a 1 MiB Bloom filter
    of its shingle hashes, broadcast once via ``ray.put``; the training
    pass probes it per batch and only shingles that HIT the filter enter
    the verify shuffle, alongside every benchmark shingle. The exact
    segment scan then counts true shared shingles — Bloom false
    positives land in segments with no benchmark row and die there, so
    the result is byte-equal to the exhaustive operator while the
    shuffle volume drops from O(all shingles) to
    O(benchmark shingles + candidate shingles)."""
    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def bench_bitmap(batch: pa.Table) -> pa.Table:
        is_bench = (batch["doc_id"].to_numpy(zero_copy_only=False)
                    % bench_mod == 0)
        bench_rows = batch.filter(pa.array(is_bench))
        if bench_rows.num_rows == 0:
            # most batches of a 100-TB corpus hold no benchmark rows:
            # emit NOTHING rather than a 1 MiB all-zeros bitmap per
            # batch (driver traffic must scale with the benchmark, not
            # the corpus)
            return pa.table({"bitmap": pa.array([],
                                                type=pa.large_binary())})
        bm = np.zeros(1 << (_BLOOM_BITS_LOG2 - 6), dtype=np.uint64)
        hs, _off = _shingle_hashes_batch(bench_rows["text"], shingle_k)
        if hs.size:  # multiset is fine: set-bits is idempotent
            _set_bits(bm, _bloom_probe_idx(hs))
        return pa.table({"bitmap": pa.array([bm.tobytes()],
                                            type=pa.large_binary())})

    # benchmark side is small by contract → OR the per-batch bitmaps on
    # the driver (≤ #bench-bearing batches × 1 MiB) and broadcast once
    parts = ds.map_batches(bench_bitmap, batch_format="pyarrow").take_all()
    bitmap = np.zeros(1 << (_BLOOM_BITS_LOG2 - 6), dtype=np.uint64)
    for r in parts:
        bitmap |= np.frombuffer(r["bitmap"], dtype=np.uint64)
    bm_ref = ray.put(bitmap)

    def explode(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        did, sh = distinct_shingles_batch(batch, shingle_k)
        if did.size == 0:
            return _EMPTY_EXPLODED
        is_bench = did % bench_mod == 0
        # benchmark rows always enter the verify shuffle; training rows
        # only when their shingle hits the broadcast Bloom filter
        keep = is_bench | _test_bits(bm, _bloom_probe_idx(sh))
        did, sh, is_bench = did[keep], sh[keep], is_bench[keep]
        if did.size == 0:
            return _EMPTY_EXPLODED
        return pa.table({
            "part": pa.array((sh % num_parts).astype(np.int32)),
            "shingle": pa.array(sh),
            "doc_id": pa.array(did),
            "is_bench": pa.array(is_bench),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_scan_shared, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_shared_shingles",
                           alias_name="n_shared_shingles")))
