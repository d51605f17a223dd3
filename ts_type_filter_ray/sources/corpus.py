"""Corpus sources: deterministic doc_id-assigning Parquet reader and the
adapter from the driver's ``documents.parquet`` shape to the corpus shape.

Doc-id design (SURVEY.md §1.4, §7.4): the reference's "insertion order"
(``ts_type_filter/inverted_index.py:53,99-101``) becomes a dense
``doc_id:int64`` assigned from **(file order, row order)** — a metadata-only
footer pass on the driver computes per-row-group global offsets, then one
Ray task per row-group reads its rows and stamps ``doc_id = offset + i``.
This is deterministic, needs **no shuffle** (unlike sort-based ranking),
and scales: at 10^12 files the footer pass itself becomes a small Ray job
over file manifests, and the per-row-group task model is unchanged.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def corpus_files(path_or_dir: str | list[str]) -> list[str]:
    """Resolve a directory / glob / list into a sorted file list (the
    file order that defines doc_id order)."""
    if isinstance(path_or_dir, list):
        return sorted(path_or_dir)
    if os.path.isdir(path_or_dir):
        return sorted(glob.glob(os.path.join(path_or_dir, "*.parquet")))
    return sorted(glob.glob(path_or_dir))


def _row_group_tasks(files: list[str]) -> list[dict]:
    """Footer-only metadata pass: one task per parquet row-group with its
    global row offset. Cheap (reads footers, not data)."""
    tasks = []
    offset = 0
    for path in files:
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            tasks.append({"path": path, "row_group": rg, "doc_id_offset": offset,
                          "num_rows": n})
            offset += n
    return tasks


class _ReadRowGroup:
    """Reads one row-group per input row and stamps dense doc_ids.

    Runs as ``map_batches(batch_size=1)`` over the task table — each Ray
    task streams exactly one row-group out of storage (column-pruned).
    """

    def __init__(self, columns: list[str] | None):
        self._columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        assert batch.num_rows == 1
        path = batch["path"][0].as_py()
        rg = batch["row_group"][0].as_py()
        offset = batch["doc_id_offset"][0].as_py()
        tbl = pq.ParquetFile(path).read_row_group(rg, columns=self._columns)
        doc_ids = pa.array(range(offset, offset + tbl.num_rows), type=pa.int64())
        return tbl.append_column("doc_id", doc_ids)


def read_corpus(path_or_dir: str | list[str],
                columns: list[str] | None = None) -> Dataset:
    """Read a corpus directory as a Dataset with dense deterministic
    ``doc_id``; ``columns`` prunes at the read (always includes corpus
    columns needed downstream if given)."""
    files = corpus_files(path_or_dir)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path_or_dir!r}")
    tasks = _row_group_tasks(files)
    ds = rd.from_items(tasks, override_num_blocks=len(tasks))
    return ds.map_batches(_ReadRowGroup(columns), batch_size=1,
                          batch_format="pyarrow")


def corpus_from_documents(sf_dir: str) -> Dataset:
    """Adapt the driver's ``documents.parquet``
    (``doc_id,text,lang,source,n_chars`` — TESTDATA.md) into the corpus
    shape mandated by ``BASELINE.json`` ``input_hint``. The existing
    ``doc_id`` is kept as the insertion order."""
    path = os.path.join(sf_dir, "documents.parquet")

    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_ids = batch["doc_id"]
        return pa.table({
            "repo": batch["source"],
            "path": pa.array([f"doc{d}.txt" for d in doc_ids.to_pylist()]),
            "commit": pa.array(["0" * 40] * n),
            "lang": batch["lang"],
            "content": batch["text"].cast(pa.large_string()),
            "doc_id": doc_ids,
        })

    return rd.read_parquet(path).map_batches(adapt, batch_format="pyarrow")
