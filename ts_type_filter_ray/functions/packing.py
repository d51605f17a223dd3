"""Sequence packing: map the corpus token stream onto fixed-length
training sequences (the concat-and-chunk layout LLM pre-training uses —
documents are concatenated in doc_id order and the stream is cut every
``seq_len`` tokens, so sequences are 100% full and a document may
straddle a boundary).

Output: one row per (document × sequence) overlap —
``(doc_id, seq_id, n_tokens)`` where ``n_tokens`` is how many of the
doc's tokens land in that sequence. Empty documents emit nothing. This
is the packing MANIFEST: the actual tensor materialization is a gather
along it (chunking.chunk_documents is the per-doc variant).

Distributed shape (the classic two-pass exclusive scan — only the tiny
counts table ever shuffles, never the content):

1. one content pass → (doc_id, n_tokens) rows (vectorized Arrow split);
2. per-batch PARTIAL sums per ``part = doc_id >> part_bits`` →
   ``groupby(part).aggregate(Sum)`` — the all-to-all moves one row per
   (batch, part);
3. the driver prefix-sums the ≤ 2^(id_bits−part_bits) per-part totals
   (at 10^12 docs and part_bits=20 that is 10^6 rows — broadcast via
   ``ray.put``, never the counts themselves);
4. ``groupby(part).map_groups``: sort the part's rows by doc_id, local
   exclusive cumsum + the part's broadcast base offset = each doc's
   global token offset, then a vectorized ragged expansion emits its
   (seq, overlap) rows — a doc at offset o with n tokens covers
   sequences ⌊o/L⌋ .. ⌊(o+n−1)/L⌋ with overlap
   min((s+1)·L, o+n) − max(s·L, o).

Exactness rides on doc_ids being dense-ish and the per-part sort — the
same range-partition + prefix-sum trick ``sampling.deterministic_shuffle``
uses. SQL-expressible (window cumsum + range unnest), so the operator
sits on the driver's value-exact gate (``pack_sequences``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .textstats import _tokens

__all__ = ["pack_token_spans"]


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def pack_token_spans(ds: Dataset, seq_len: int,
                     part_bits: int = 14) -> Dataset:
    """(doc_id, seq_id, n_tokens) packing manifest for *ds* (documents
    table with ``doc_id, text``) at sequence length *seq_len*. See the
    module docstring for the layout contract and distributed shape."""
    import ray
    from ray.data.aggregate import Sum

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")

    def counts(batch: pa.Table) -> pa.Table:
        n_tok, _flat, _parents = _tokens(batch)
        doc = batch["doc_id"]
        part = pa.array(
            (doc.to_numpy(zero_copy_only=False) >> part_bits)
            .astype(np.int64))
        return pa.table({"doc_id": doc, "part": part, "n": n_tok})

    # materialize: BOTH branches below consume `c`, and a lazy plan would
    # re-run the content scan + tokenize from scratch for each (the
    # docstring's "one content pass" promise). The counts table is three
    # int64 columns per doc — object-store-resident (and spillable) at
    # any corpus size the manifest itself is representable at.
    c = ds.map_batches(counts, batch_format="pyarrow").materialize()

    def part_partials(batch: pa.Table) -> pa.Table:
        part = batch["part"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(part, return_inverse=True)
        sums = np.bincount(inv, weights=n.astype(np.float64))
        return pa.table({
            "part": pa.array(uniq, type=pa.int64()),
            "part_n": pa.array(sums.astype(np.int64), type=pa.int64()),
        })

    totals = (c.map_batches(part_partials, batch_format="pyarrow")
               .groupby("part").aggregate(Sum("part_n"))
               .rename_columns(["part", "part_n"]).take_all())
    totals.sort(key=lambda r: r["part"])
    base: dict[int, int] = {}
    off = 0
    for r in totals:
        base[int(r["part"])] = off
        off += int(r["part_n"])
    base_ref = ray.put(base)

    def spans(group: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        part = int(group["part"][0].as_py())
        order = pc.sort_indices(group["doc_id"])
        n = group["n"].take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc = group["doc_id"].take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        off = bases[part] + np.concatenate(
            ([0], np.cumsum(n)))[:-1]  # exclusive scan + part base
        keep = n > 0
        n, doc, off = n[keep], doc[keep], off[keep]
        if n.size == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "seq_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
            })
        first = off // seq_len
        last = (off + n - 1) // seq_len
        nseq = (last - first + 1).astype(np.int64)
        doc_r = np.repeat(doc, nseq)
        off_r = np.repeat(off, nseq)
        end_r = np.repeat(off + n, nseq)
        seq = np.repeat(first, nseq) + _ragged_arange(nseq)
        take = (np.minimum((seq + 1) * seq_len, end_r)
                - np.maximum(seq * seq_len, off_r))
        return pa.table({
            "doc_id": pa.array(doc_r, type=pa.int64()),
            "seq_id": pa.array(seq, type=pa.int64()),
            "n_tokens": pa.array(take, type=pa.int64()),
        })

    return c.groupby("part").map_groups(spans, batch_format="pyarrow")
