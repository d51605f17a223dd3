"""Composed training-data curation pipeline — the end-to-end shape a
100 TB data pipeline runs, built entirely from this engine's operators:

  read → quality features → quality filter → exact dedup (sha256 keep-min)
       → near-dup filter (MinHash-LSH, Jaccard ≥ t verified) → language filter
       → write curated parquet + a one-row summary of what each stage
         dropped (no silent truncation).

Each stage is the corresponding `functions/` operator; the dedup "keep"
sets are broadcast into vectorized filters (semi-join pattern). Streaming
note: at corpus scale the keep-sets become bloom filters / sorted-id
parquet side inputs rather than driver sets — the stage layout is
unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions import dedup, textstats


def curate(docs: Dataset, *,
           min_tokens: int = 5,
           max_stopword_ratio: float = 0.9,
           keep_langs: tuple[str, ...] | None = None,
           jaccard_threshold: float = 0.8,
           out_dir: str | None = None) -> tuple[Dataset, dict]:
    """Return (curated dataset, per-stage drop counts).

    *docs* must have ``doc_id:int64, text:string`` (+ optional ``lang``).
    """
    report: dict[str, int] = {}
    n0 = docs.count()

    # 1. quality filter (vectorized features → predicate)
    q = textstats.quality_scores(docs)
    keep_q = q.filter(
        lambda r: r["n_tokens"] >= min_tokens
        and r["stopword_ratio"] <= max_stopword_ratio)
    quality_ids = {r["doc_id"] for r in keep_q.select_columns(["doc_id"]).take_all()}
    report["dropped_quality"] = n0 - len(quality_ids)

    # 2. exact dedup: keep the min doc_id of every sha256 group
    exact = dedup.exact_dedup_groups(docs).take_all()
    exact_keep = {r["keep_doc_id"] for r in exact}
    report["dropped_exact_dup"] = n0 - len(exact_keep)

    # 3. near-dup: MinHash-LSH candidates verified by exact Jaccard,
    # drop the larger id of each qualifying pair
    pairs = dedup.minhash_dedup_pairs(docs, threshold=jaccard_threshold)
    near_drop = set(pairs["id_b"].to_pylist())
    report["dropped_near_dup"] = len(near_drop)

    keep_ids = (quality_ids & exact_keep) - near_drop
    keep_arr = pa.array(sorted(keep_ids), type=pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=keep_arr))

    curated = docs.map_batches(keep, batch_format="pyarrow")

    # 4. language filter (heuristic language-ID over the survivors)
    if keep_langs is not None:
        lang = textstats.language_id(curated)
        lang_keep = pa.array(sorted(
            r["doc_id"] for r in lang.take_all()
            if r["pred_lang"] in keep_langs), type=pa.int64())
        before = len(keep_ids)
        report["dropped_language"] = before - len(lang_keep)

        def keep_lang(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["doc_id"],
                                         value_set=lang_keep))

        curated = curated.map_batches(keep_lang, batch_format="pyarrow")

    if out_dir:
        curated.write_parquet(out_dir)
    report["kept"] = curated.count()
    report["input"] = n0
    return curated, report


def curation_report_table(sf_dir: str, **kw) -> pa.Table:
    """One-row summary table for the driver contract (rows-only check)."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    _, report = curate(docs, **kw)
    return pa.table({k: pa.array([v], type=pa.int64())
                     for k, v in sorted(report.items())})
