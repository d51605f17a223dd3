"""End-to-end training-data preparation — the composition a pre-training
pipeline actually runs, built entirely from this engine's operators:

    length-quantile filter  ∩  exact-dedup winners  ∩  not-contaminated
    (and not a benchmark doc)  →  deterministic split  →  per-split report

Composition stays distributed the same way ``pipelines/curation.py``
does: each stage emits small MARKER datasets ((doc_id, flag, n_tokens)
rows), merged through one linear union + ``groupby(doc_id)`` — never a
driver-side id set, never a second full-corpus join. A doc survives iff
its flag sum is exactly +1: present in the keep set (one +1 row) with no
drop rows (each −10⁶) — duplicate-loser AND contaminated docs stay
excluded no matter how many drop rows they accrue. The final split
assignment is the coordination-free md5 hash of
:mod:`..functions.sampling`, so the whole pipeline is value-exact
against one (large) SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..functions.decontam import decontaminate
from ..functions.sampling import (DEFAULT_TRAIN_PCT, DEFAULT_VALID_PCT,
                                  _md5_bucket)
from ..functions.textstats import filter_by_token_quantile
from .curation import exact_dup_losers

_DROP = -1_000_000


def _markers(ds: Dataset, flag: int, with_tokens: bool) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"],
            "flag": pa.array(np.full(n, flag, dtype=np.int64)),
            "n_tokens": (batch["n_tokens"] if with_tokens else
                         pa.array(np.zeros(n, dtype=np.int64))),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def training_prep_report(docs: Dataset, lo: float = 0.05,
                         hi: float = 0.95, bench_mod: int = 50,
                         shingle_k: int = 3,
                         train_pct: int = DEFAULT_TRAIN_PCT,
                         valid_pct: int = DEFAULT_VALID_PCT) -> Dataset:
    """(split, n_docs, n_tokens) of the surviving corpus per split."""
    keep = _markers(filter_by_token_quantile(docs, lo, hi), 1, True)
    losers = _markers(exact_dup_losers(docs), _DROP, False)
    contam = _markers(
        decontaminate(docs, bench_mod, shingle_k)
        .select_columns(["doc_id"]), _DROP, False)
    merged = (keep.union(losers).union(contam)
              .groupby("doc_id")
              .aggregate(Sum("flag", alias_name="flag"),
                         Sum("n_tokens", alias_name="n_tokens")))

    def assign_split(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flags = batch["flag"].to_numpy(zero_copy_only=False)
        kept = (flags == 1) & (ids % bench_mod != 0)
        ids_k = ids[kept]
        bucket = _md5_bucket(ids_k)
        split = np.where(
            bucket < train_pct, "train",
            np.where(bucket < train_pct + valid_pct, "valid", "test"))
        return pa.table({
            "split": pa.array(split.tolist(), type=pa.string()),
            "n_tokens": pa.array(
                batch["n_tokens"].to_numpy(zero_copy_only=False)[kept],
                type=pa.int64()),
        })

    return (merged.map_batches(assign_split, batch_format="pyarrow")
            .groupby("split")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens")))
