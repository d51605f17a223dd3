"""Fixed-length sequence chunking — split each document into consecutive
``chunk_len``-token windows, the context-length preparation step of a
training-data pipeline (every pre-training corpus ends life as
fixed-size sequences).

Entirely per-document ⇒ one ``map_batches`` pass, NO shuffle, and no
Python loop over rows or chunks: chunk boundaries are computed as one
numpy offsets vector over the batch's flattened token array, the chunk
token lists are materialized zero-copy as an Arrow ``ListArray`` over
that SAME flat array (``ListArray.from_arrays`` — offsets only, tokens
are not copied), and the chunk strings come from one vectorized
``pc.binary_join``. Output rows ≈ input tokens / chunk_len, so the
operator SHRINKS the stream — safe at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .dedup import join_lists
from .textstats import _tokens


def chunk_documents(ds: Dataset, chunk_len: int = 128) -> Dataset:
    """(doc_id, chunk_id, n_tokens, chunk_text) — whitespace tokens,
    consecutive windows of ``chunk_len``, last window may be short;
    blank documents produce no chunks. Token order is preserved and
    chunks are joined with a single space (equal to the SQL oracle's
    ``array_to_string(arr[a:b], ' ')``)."""
    if chunk_len < 1:
        raise ValueError("chunk_len must be >= 1")
    L = chunk_len

    def fn(batch: pa.Table) -> pa.Table:
        n_tok, flat, parents = _tokens(batch)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = n_tok.to_numpy(zero_copy_only=False)
        rep = (n + L - 1) // L  # chunks per doc (0 for blank docs)
        total = int(rep.sum())
        if total == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
            })
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        cs = np.cumsum(rep)
        # local chunk index j within each doc, flat across the batch
        j = np.arange(total, dtype=np.int64) - np.repeat(cs - rep, rep)
        doc_start = np.cumsum(n) - n  # position of each doc in `flat`
        chunk_start = np.repeat(doc_start, rep) + j * L
        chunk_end = np.minimum(chunk_start + L, np.repeat(doc_start + n,
                                                          rep))
        # consecutive chunks tile `flat` exactly (a chunk's end is the
        # next chunk's start, across document boundaries too), so the
        # starts plus the final end ARE the list offsets — zero-copy view
        offsets = np.append(chunk_start, len(flat)).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets),
                                              flat)
        return pa.table({
            "doc_id": pa.array(np.repeat(dids, rep), type=pa.int64()),
            "chunk_id": pa.array(j),
            "n_tokens": pa.array(chunk_end - chunk_start),
            "chunk_text": join_lists(lists, " "),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
