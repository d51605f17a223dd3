"""Posting-list compression: delta + varint (LEB128) encoding of sorted
doc_id lists, parallel varint tf/doc-length lists, and block-max metadata.

The north star mandates posting lists "merged and delta/varint-compressed
by stateful actor-pool mergers" with "block-max WAND pruning"; there is no
Arrow primitive for this, so it lives here as plain-``bytes`` columns
(SURVEY.md §7.4). The reference itself stores postings as Python lists
(``ts_type_filter/inverted_index.py:44,62-65``); this is the at-scale
re-expression.

Layout per (term, doc_partition) row:
  - ``doc_ids``: varint(delta) of ascending doc_ids (first value absolute)
  - ``tfs``:     varint of term frequencies, parallel to doc_ids
  - ``dls``:     varint of document lengths, parallel to doc_ids
  - ``df``:      posting count in this row
  - ``max_impact``: max over docs of the BM25 tf-factor
    ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` — multiplied by idf at query
    time it upper-bounds this row's score contribution (block-max WAND).
"""

from __future__ import annotations

import zlib

import numpy as np


def term_bucket(term: str, num_buckets: int) -> int:
    """Stable cross-process term → bucket hash (zlib.crc32, never the
    process-seeded builtin ``hash``)."""
    return zlib.crc32(term.encode("utf-8")) % num_buckets


def encode_varints(values: np.ndarray | list[int]) -> bytes:
    """LEB128-encode a sequence of non-negative ints."""
    out = bytearray()
    for v in values:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to an int64 array."""
    out = []
    shift = 0
    cur = 0
    for byte in buf:
        cur |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            out.append(cur)
            cur = 0
            shift = 0
    return np.asarray(out, dtype=np.int64)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta+varint encode an ascending doc_id array."""
    arr = np.asarray(doc_ids, dtype=np.int64)
    if arr.size == 0:
        return b""
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    return encode_varints(deltas)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    deltas = decode_varints(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas)


def max_impact(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
               k1: float, b: float) -> float:
    """Block-max metadata: max BM25 tf-factor over the row's postings."""
    tfs = np.asarray(tfs, dtype=np.float64)
    dls = np.asarray(dls, dtype=np.float64)
    if tfs.size == 0:
        return 0.0
    denom = tfs + k1 * (1.0 - b + b * dls / avgdl)
    return float(np.max(tfs * (k1 + 1.0) / denom))
