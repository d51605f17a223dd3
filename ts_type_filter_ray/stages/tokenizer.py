"""Tokenization stages: corpus batches → per-batch partial posting rows.

This is the engine's re-expression of the reference's ingestion loop
(extract → break → stem, ``ts_type_filter/inverted_index.py:57-65``) as a
stateful ``map_batches`` stage over Arrow batches:

- ``PrepDocs``: per-row sha256 (the `input_hint` per-row invariant) and
  ``doc_len`` (whitespace token count — BM25's dl).
- ``TokenizePartials``: callable class for an actor pool; per batch it
  stems every token (stem cache shared across batches via the module-level
  lru_cache in :mod:`..text.porter2`) and emits **partial postings** —
  one row per (term, doc_partition) present in the batch, with parallel
  ``doc_ids``/``tfs``/``dls`` list columns. This per-batch partial
  aggregation is the combiner that keeps the ``groupby`` shuffle small:
  a hot term like ``import`` ships one row per batch, not one per
  document (SURVEY.md §4 "Skew").

Doc partitioning: ``part = doc_id >> doc_part_bits`` splits every term's
posting list into bounded doc-id ranges, so no single merge group ever
holds more than 2**doc_part_bits postings — the safeguard that makes the
hot-term merge feasible at 10^12 documents.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

from ..text.porter2 import stem

DEFAULT_DOC_PART_BITS = 20  # 1M docs per doc-partition


def prep_docs(batch: pa.Table) -> pa.Table:
    """Doc-metadata projection: sha256(content) + doc_len, content dropped."""
    contents = batch["content"].to_pylist()
    shas = [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in contents]
    dls = [len(c.split()) for c in contents]
    cols = {name: batch[name] for name in batch.column_names if name != "content"}
    cols["sha256"] = pa.array(shas, type=pa.string())
    cols["doc_len"] = pa.array(dls, type=pa.int32())
    return pa.table(cols)


class TokenizePartials:
    """Actor-pool stage: (doc_id, content) batches → partial posting rows.

    Output schema:
      term:string, part:int32, doc_ids:list<int64>, tfs:list<int32>,
      dls:list<int32>
    doc_ids ascending within each row (docs arrive in doc_id order within
    a batch; the merge re-sorts defensively anyway).
    """

    def __init__(self, doc_part_bits: int = DEFAULT_DOC_PART_BITS):
        self._part_bits = doc_part_bits
        self._stem = stem  # module-level lru_cache: hot vocab amortized per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        _stem = self._stem
        part_bits = self._part_bits
        doc_ids = batch["doc_id"].to_pylist()
        contents = batch["content"].to_pylist()

        # per (term, part) → [doc_ids], [tfs], [dls]
        acc: dict[tuple[str, int], tuple[list[int], list[int], list[int]]] = {}
        for doc_id, content in zip(doc_ids, contents):
            words = content.split()
            dl = len(words)
            counts = Counter(map(_stem, words))
            part = doc_id >> part_bits
            for term, tf in counts.items():
                entry = acc.get((term, part))
                if entry is None:
                    entry = acc[(term, part)] = ([], [], [])
                entry[0].append(doc_id)
                entry[1].append(tf)
                entry[2].append(dl)

        terms = []
        parts = []
        l_doc = []
        l_tf = []
        l_dl = []
        for (term, part), (ds_, ts_, ls_) in acc.items():
            terms.append(term)
            parts.append(part)
            l_doc.append(ds_)
            l_tf.append(ts_)
            l_dl.append(ls_)
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "part": pa.array(parts, type=pa.int32()),
            "doc_ids": pa.array(l_doc, type=pa.list_(pa.int64())),
            "tfs": pa.array(l_tf, type=pa.list_(pa.int32())),
            "dls": pa.array(l_dl, type=pa.list_(pa.int32())),
        })


def merge_partials(group: pa.Table) -> pa.Table:
    """Merge one (term, part) group of partial posting rows into a single
    uncompressed merged row. Used via ``groupby(["term","part"]).map_groups``.

    Doc_ids are re-sorted ascending — determinism never depends on task
    completion order (SURVEY.md §7.4).
    """
    term = group["term"][0].as_py()
    part = group["part"][0].as_py()
    doc_ids = np.concatenate([np.asarray(x, dtype=np.int64)
                              for x in group["doc_ids"].to_pylist()])
    tfs = np.concatenate([np.asarray(x, dtype=np.int64)
                          for x in group["tfs"].to_pylist()])
    dls = np.concatenate([np.asarray(x, dtype=np.int64)
                          for x in group["dls"].to_pylist()])
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfs = tfs[order]
    dls = dls[order]
    return pa.table({
        "term": pa.array([term], type=pa.string()),
        "part": pa.array([part], type=pa.int32()),
        "df": pa.array([len(doc_ids)], type=pa.int64()),
        "doc_ids": pa.array([doc_ids], type=pa.list_(pa.int64())),
        "tfs": pa.array([tfs], type=pa.list_(pa.int32())),
        "dls": pa.array([dls], type=pa.list_(pa.int32())),
    })
