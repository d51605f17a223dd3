"""Corpus-wide exact line-level deduplication (CCNet / MassiveText).

The line-dedup step of the CCNet (Wenzek et al. 2020) and MassiveText
(Rae et al. 2021 "Gopher") curation recipes: every LINE that occurs more
than once corpus-wide keeps only its FIRST occurrence — ordered by
``(doc_id, line_idx)`` — and every other occurrence is removed from its
document; documents are rebuilt from the surviving lines. This is the
boilerplate-killer (headers, nav bars, license banners repeat across
pages) and is distinct from ExactSubstr span dedup
(:func:`~ts_type_filter_ray.functions.ngrams.strip_dup_spans`): the unit
here is the literal line, membership is exact string equality, and the
removal decision is global-first-wins rather than all-duplicated-spans.

Distributed shape — two linear shuffles, no pair pass, no driver state:

1. explode participating lines ``(hash-part, line, doc_id, idx)`` —
   partitioned by a hash OF THE LINE, so every occurrence of equal
   lines lands in ONE partition and the decision is local and exact
   (equality is decided on the strings, the hash only routes);
2. per-partition scan: sort ``(line, doc_id, idx)``; the first row of
   each equal-line run survives, every later row becomes a removal
   ``(doc-part, doc_id, idx)``;
3. rebuild: union-shuffle zip-join of the corpus with its removal rows
   (the :func:`strip_dup_spans` pattern) — per doc, drop removed line
   indices and rejoin with ``\\n``; one vectorized pass per partition.

Lines shorter than ``min_chars`` characters never participate (CCNet
dedups only "real" lines; blank lines always survive). Shuffle volume is
O(total participating line bytes) then O(removals).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .dedup import join_lists
from .partitioning import auto_num_parts


def _split_lines(texts, delimiter: str = "\n"
                 ) -> tuple[pa.Array, np.ndarray]:
    """``(flat_units, offsets)`` — split a text column on *delimiter*
    (``str.split`` semantics: an empty text is one empty unit)."""
    col = texts if isinstance(texts, pa.ChunkedArray) else (
        pa.chunked_array([texts]))
    # null text ≡ '' (one blank unit) — null counts poison the offsets
    lines = pc.split_pattern(pc.fill_null(col, ""), pattern=delimiter)
    counts = pc.list_value_length(lines).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lines).combine_chunks()
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat, offsets


def _hash_lines(flat: pa.Array) -> np.ndarray:
    """Routing hashes (uint64) for a flat line array — blake2b over
    per-batch UNIQUE lines only (dictionary-encode + gather). Used only
    to partition; equality is decided on the strings themselves."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    hu = np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
            "little") for t in enc.dictionary.to_pylist()),
        dtype=np.uint64, count=len(enc.dictionary))
    return hu[codes]


def dedup_lines(ds: Dataset, min_chars: int = 1,
                num_parts: int | None = None,
                delimiter: str = "\n") -> Dataset:
    """``(doc_id, text, n_lines, n_removed)`` — the corpus with every
    non-first occurrence of each duplicated line removed (first = min
    ``(doc_id, line_idx)`` among ALL occurrences, same-document repeats
    included). ``n_lines`` counts the document's original lines; output
    ``text`` joins the survivors with ``\\n`` (a doc whose every line
    was removed comes back as ``''``). Exact — SQL-oracle checkable
    including the rebuilt strings.

    Lines with fewer than ``min_chars`` characters are exempt: they
    never participate in dedup and always survive.

    ``delimiter`` generalizes the unit: ``"\\n\\n"`` dedups at
    PARAGRAPH granularity (the other CCNet/Dolma convention) with the
    identical machinery — split, hash-route, first-occurrence scan,
    rebuild joined with the same delimiter."""
    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def explode(batch: pa.Table) -> pa.Table:
        flat, off = _split_lines(batch["text"], delimiter)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        counts = np.diff(off)
        doc_of = np.repeat(np.arange(len(did), dtype=np.int64), counts)
        idx = np.arange(len(flat), dtype=np.int64) - off[:-1][doc_of]
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        part_rows = np.flatnonzero(lens >= min_chars)
        lines_kept = flat.take(pa.array(part_rows))
        h = _hash_lines(lines_kept)
        return pa.table({
            "part": pa.array((h % np.uint64(num_parts)).astype(np.int32)),
            "line": lines_kept,
            "doc_id": pa.array(did[doc_of[part_rows]], type=pa.int64()),
            "idx": pa.array(idx[part_rows]),
        })

    def scan(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("line", "ascending"),
                              ("doc_id", "ascending"),
                              ("idx", "ascending")])
        ls = group["line"].take(order).combine_chunks()
        n = len(ls)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = pc.not_equal(
                ls.slice(1), ls.slice(0, n - 1)).to_numpy(
                    zero_copy_only=False)
        later = pa.array(order.to_numpy(zero_copy_only=False)[~first])
        did = group["doc_id"].take(later).to_numpy(zero_copy_only=False)
        return pa.table({
            "dpart": pa.array((did % num_parts).astype(np.int32)),
            "doc_id": pa.array(did, type=pa.int64()),
            "idx": group["idx"].take(later),
        })

    removals = (ds.map_batches(explode, batch_format="pyarrow")
                .groupby("part").map_groups(scan, batch_format="pyarrow")
                .map_batches(lambda b: b.append_column(
                    "text", pa.array([None] * b.num_rows,
                                     type=pa.large_string())),
                    batch_format="pyarrow"))

    def doc_rows(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(did)
        return pa.table({
            "dpart": pa.array((did % num_parts).astype(np.int32)),
            "doc_id": pa.array(did, type=pa.int64()),
            "idx": pa.array(np.full(n, -1, dtype=np.int64)),
            "text": pc.cast(batch["text"], pa.large_string()),
        })

    def rebuild(group: pa.Table) -> pa.Table:
        idx_all = group["idx"].to_numpy(zero_copy_only=False)
        did_all = group["doc_id"].to_numpy(zero_copy_only=False)
        is_doc = idx_all < 0
        doc_order = np.argsort(did_all[is_doc], kind="stable")
        texts = group["text"].combine_chunks().filter(
            pa.array(is_doc)).take(pa.array(doc_order))
        doc_ids = did_all[is_doc][doc_order]
        flat, off = _split_lines(texts, delimiter)
        counts = np.diff(off)
        r_did = did_all[~is_doc]
        r_idx = idx_all[~is_doc]
        di = np.searchsorted(doc_ids, r_did)
        if len(di) and (len(doc_ids) == 0 or not np.array_equal(
                doc_ids[np.minimum(di, len(doc_ids) - 1)], r_did)):
            raise ValueError(
                "dedup_lines: removal rows reference doc_ids absent "
                "from the corpus partition")
        kept = np.ones(off[-1], dtype=bool)
        kept[off[:-1][di] + r_idx] = False
        kept_flat = flat.filter(pa.array(kept))
        removed_per_doc = np.bincount(di, minlength=len(counts)) \
            .astype(np.int64)
        kept_counts = counts - removed_per_doc
        kept_off = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=kept_off[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(kept_off.astype(np.int32), type=pa.int32()),
            kept_flat)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "text": join_lists(lst, delimiter),
            "n_lines": pa.array(counts),
            "n_removed": pa.array(removed_per_doc),
        })

    docs = ds.map_batches(doc_rows, batch_format="pyarrow")
    return docs.union(removals).groupby("dpart").map_groups(
        rebuild, batch_format="pyarrow")
