"""Corpus snapshot tooling — the data-ops pair every recurring 100-TB
ingestion needs: an order-insensitive corpus checksum (did anything
change? one number, one streaming pass, no shuffle) and a snapshot diff
(WHAT changed? added / removed / changed doc ids, one coarse shuffle of
64-bit hashes — never the text).

Both are md5-based so the SQL oracle reproduces them exactly
(``md5_number_lower``, the dedup family's shared convention). The
checksum XORs per-row hashes, so it is partition-order- and
block-order-independent by construction — the right invariant for a
streaming engine whose executor does not preserve order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .partitioning import auto_num_parts

_MASK63 = np.uint64((1 << 63) - 1)


def _row_hashes(batch: pa.Table) -> np.ndarray:
    """md5-64 of ``doc_id || ':' || text`` per row — covers both the key
    and the content, ≡ ``md5_number_lower(doc_id::VARCHAR || ':' ||
    text)``."""
    from ..text.hashvec import md5_lower64_strings
    ids = pc.cast(batch["doc_id"], pa.string())
    from .dedup import join_elementwise
    combined = join_elementwise(ids, batch["text"], ":")
    # ':' lands BETWEEN the joined strings (it is the separator); the
    # argument order above yields id:text
    return md5_lower64_strings(combined)


def corpus_checksum(ds: Dataset) -> Dataset:
    """One row (n_docs, checksum) — an order-insensitive corpus
    fingerprint: XOR of per-row md5-64(doc_id:text), masked to 63 bits
    (so the SQL mirror ``bit_xor(md5_number_lower(...) & (2^63-1))``
    stays in BIGINT range). Per-batch partial XORs reduce driver-side
    over ≤ #batches rows; nothing shuffles. Equal corpora ⇒ equal
    checksums regardless of row, block, or partition order; any
    single-row change flips it with probability 1 - 2^-63."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        h = _row_hashes(batch) & _MASK63
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({
            "x": pa.array([int(x)], type=pa.int64()),
            "n": pa.array([batch.num_rows], type=pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = 0
    for r in parts:
        acc ^= r["x"]
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([sum(r["n"] for r in parts)], type=pa.int64()),
        "checksum": pa.array([acc], type=pa.int64()),
    }))


def corpus_diff(ds_a: Dataset, ds_b: Dataset,
                num_parts: int | None = None) -> Dataset:
    """(doc_id, status) for every doc that DIFFERS between snapshot A
    and snapshot B — status ∈ {'added', 'removed', 'changed'} (present
    only in B / only in A / in both with different text). Unchanged
    docs emit nothing, so the output is O(changes), not O(corpus).

    One streaming hash pass per side (64-bit content hashes — the text
    never shuffles), one coarse doc-partition groupby, a vectorized
    per-doc segment compare. Duplicate doc_ids within a side violate
    the corpus contract and raise."""
    if num_parts is None:
        num_parts = max(auto_num_parts(ds_a), auto_num_parts(ds_b))

    def side_rows(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = _row_hashes(batch)
            did = batch["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "part": pa.array((did % num_parts).astype(np.int32)),
                "doc_id": pa.array(did, type=pa.int64()),
                "h": pa.array(h),
                "side": pa.array(np.full(len(did), side, dtype=np.int8)),
            })
        return fn

    def compare(group: pa.Table) -> pa.Table:
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, did))
        did, h, side = did[order], h[order], side[order]
        first = np.ones(len(did), dtype=bool)
        first[1:] = did[1:] != did[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(did)))
        second = np.minimum(starts + 1, len(did) - 1)
        if (lens > 2).any() or np.any(
                (lens == 2) & (side[starts] == side[second])):
            raise ValueError(
                "corpus_diff: duplicate doc_id within one snapshot")
        only = lens == 1
        status = np.empty(len(starts), dtype=object)
        status[only & (side[starts] == 0)] = "removed"
        status[only & (side[starts] == 1)] = "added"
        both = ~only
        bs = starts[both]
        changed = h[bs] != h[bs + 1]
        keep = only.copy()
        keep[both] = changed
        status[both] = "changed"
        return pa.table({
            "doc_id": pa.array(did[starts[keep]], type=pa.int64()),
            "status": pa.array(status[keep].tolist(), type=pa.string()),
        })

    rows = (ds_a.map_batches(side_rows(0), batch_format="pyarrow")
            .union(ds_b.map_batches(side_rows(1), batch_format="pyarrow")))
    return (rows.groupby("part")
            .map_groups(compare, batch_format="pyarrow")
            .sort("doc_id"))
