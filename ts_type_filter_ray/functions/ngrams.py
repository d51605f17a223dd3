"""Corpus n-gram operators — the n-gram statistics and containment
passes a training-data pipeline runs beside tokenization: global n-gram
counts (LM frequency tables / boilerplate detection), phrase containment
(exact-match filtering), and the duplicated-n-gram fraction per document
(the intra-corpus near-dup signal of Lee et al. 2022's "Deduplicating
Training Data Makes Language Models Better" — here at n-gram
granularity over the same shingle machinery as the dedup family).

All SQL-oracle checkable (driver gate): tokenization is the shared
lowercased-whitespace contract, shingles the dedup family's
order-sensitive Mersenne fold (equal token sequences ⇒ equal hashes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from .partitioning import auto_num_parts
from .textstats import _tokens


def ngram_counts(ds: Dataset, n: int = 2, k: int = 25) -> Dataset:
    """Top-*k* word *n*-grams by total occurrence count — (ngram, count),
    ordered (count desc, ngram asc).

    Per-batch partial counts are fully vectorized: adjacent-token masks
    from the flattened token array (an n-gram exists where n consecutive
    flat tokens share a parent doc), n-gram strings via one
    ``binary_join_element_wise`` over n shifted slices, counts via
    Arrow's ``value_counts``. Partials pre-aggregate inside the batch,
    so the groupby shuffle carries one row per distinct n-gram per
    batch, never per occurrence; the final sort runs on the merged
    n-gram table (vocabulary-sized, same scale as ``term_df_tf``)."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        empty = pa.table({"ngram": pa.array([], type=pa.string()),
                          "count": pa.array([], type=pa.int64())})
        if len(flat) < n:
            return empty
        flat = pc.utf8_lower(flat)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        par = parents.to_numpy(zero_copy_only=False)
        m = len(flat) - n + 1
        # an n-gram starts at i iff tokens i..i+n-1 are all in one doc
        live = par[:m] == par[n - 1:]
        if not live.any():
            return empty
        pieces = [flat.slice(j, m) for j in range(n)]
        from .dedup import join_elementwise
        grams = join_elementwise(*pieces, " ")
        grams = grams.filter(pa.array(live))
        vc = grams.value_counts()
        return pa.table({"ngram": vc.field("values"),
                         "count": pc.cast(vc.field("counts"), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("ngram")
            .aggregate(Sum("count", alias_name="count"))
            .sort(["count", "ngram"], descending=[True, False])
            .limit(k))


def phrase_match(ds: Dataset, phrases: list[str]) -> Dataset:
    """(phrase_idx, doc_id) for every document whose whitespace token
    sequence contains the phrase's token sequence contiguously — the
    exact-phrase filter (benchmark-prompt search, boilerplate kill
    lists) the boolean index can't answer without positions.

    Vectorized containment: each doc normalizes once to
    ``' ' + lower(tokens joined by ' ') + ' '`` and each phrase becomes
    one ``match_substring`` scan over the batch — no per-row Python, no
    index required; cost is O(docs × phrases) SIMD substring scans."""
    norm_phrases = [" ".join(p.lower().split()) for p in phrases]

    def fn(batch: pa.Table) -> pa.Table:
        hay = pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_trim_whitespace(batch["text"])),
            pattern=r"\s+", replacement=" ")
        from .dedup import join_elementwise
        hay = join_elementwise(" ", hay, " ", "")
        idx_out, ids_out = [], []
        ids = batch["doc_id"]
        for i, p in enumerate(norm_phrases):
            mask = pc.match_substring(hay, f" {p} ")
            hit = ids.filter(mask)
            if len(hit):
                idx_out.append(np.full(len(hit), i, dtype=np.int64))
                ids_out.append(hit)
        if not idx_out:
            return pa.table({"phrase_idx": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        return pa.table({
            "phrase_idx": pa.array(np.concatenate(idx_out)),
            "doc_id": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in ids_out]),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort(
        ["phrase_idx", "doc_id"])


def dup_ngram_fraction(ds: Dataset, shingle_k: int = 3,
                       num_parts: int | None = None) -> Dataset:
    """(doc_id, n_shingles, n_dup_shingles, dup_fraction) — per document,
    how many of its DISTINCT token ``shingle_k``-grams occur in at least
    one OTHER document. The per-doc duplication signal of the dedup
    family (high fraction ⇒ boilerplate / near-copy), exact, with the
    decontamination operator's shuffle shape: explode distinct shingle
    hashes, coarse-partition by shingle (every occurrence of a shingle
    lands in one partition), one vectorized segment scan marks shingles
    whose segment spans ≥ 2 docs, one ``groupby(doc_id)`` sums — shuffle
    volume O(total distinct shingles), no pair pass, no O(df²) term.

    Docs shorter than ``shingle_k`` tokens contribute their whole text
    as one shingle (the dedup family's convention); blank docs have no
    shingles and are not reported (inner semantics — the SQL oracle
    filters identically)."""
    from .dedup import distinct_shingles_batch
    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def explode(batch: pa.Table) -> pa.Table:
        did, sh = distinct_shingles_batch(batch, shingle_k)
        if did.size == 0:
            return pa.table({"part": pa.array([], type=pa.int32()),
                             "shingle": pa.array([], type=pa.uint64()),
                             "doc_id": pa.array([], type=pa.int64())})
        return pa.table({
            "part": pa.array((sh % num_parts).astype(np.int32)),
            "shingle": pa.array(sh),
            "doc_id": pa.array(did),
        })

    def scan(group: pa.Table) -> pa.Table:
        sh = group["shingle"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sh))
        sh, did = sh[order], did[order]
        n = len(sh)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = sh[1:] != sh[:-1]
        # shingles are distinct per doc, so a segment with >= 2 rows
        # spans >= 2 distinct docs — its shingle is duplicated
        seg_id = np.cumsum(new_seg) - 1
        seg_rows = np.bincount(seg_id)
        dup = seg_rows[seg_id] >= 2
        uniq, total = np.unique(did, return_counts=True)
        n_dup = np.zeros(len(uniq), dtype=np.int64)
        if dup.any():
            inv = np.searchsorted(uniq, did[dup])
            np.add.at(n_dup, inv, 1)
        return pa.table({
            "doc_id": pa.array(uniq, type=pa.int64()),
            "n_shingles": pa.array(total.astype(np.int64)),
            "n_dup_shingles": pa.array(n_dup),
        })

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch["n_shingles"].to_numpy(zero_copy_only=False)
        dup = batch["n_dup_shingles"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dup_fraction", pa.array(dup / tot, type=pa.float64()))

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("part")
            .map_groups(scan, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_shingles", alias_name="n_shingles"),
                       Sum("n_dup_shingles", alias_name="n_dup_shingles"))
            .map_batches(finish, batch_format="pyarrow"))


def cooccurrence_counts(ds: Dataset, min_df: int = 2,
                        max_df: int | None = None, min_count: int = 2,
                        k: int = 50,
                        num_parts: int | None = None,
                        max_doc_terms: int | None = None) -> Dataset:
    """Document-level term co-occurrence: (term_a, term_b, pair_count) —
    how many documents contain BOTH terms (distinct-per-doc semantics,
    term_a < term_b lexicographically) — the count table behind PMI /
    collocation / topic-graph corpus analytics. Ordered (pair_count
    desc, term_a, term_b), top *k*, pairs below ``min_count`` dropped.
    Integer-only output so the DuckDB oracle compares value-exactly (PMI
    itself is ``log(N·c_ab/(c_a·c_b))`` — a libm call that is not
    bit-stable across engines, so the oracle-checked surface stays in
    counts; callers derive PMI from this table plus ``term_df_tf``).

    Three bounded Ray Data shapes, no driver state:
    (1) per-batch distinct (doc_id, term) rows (vectorized: dict-encode +
    one ``np.unique``), partitioned by a vectorized md5 of the term;
    (2) per term-partition df filter — a term's rows all land in one
    partition, so the partition-local count IS the global df, and only
    terms inside the ``[min_df, max_df]`` band survive (``max_df`` is the
    stopword guard: per-doc pair work is quadratic in the doc's
    SURVIVING vocabulary, so the band is the scale knob — a term in
    every doc would otherwise pair with everything);
    (3) re-partition by doc hash, one vectorized segment scan emits each
    doc's code pairs (codes from a sorted ``np.unique`` vocabulary, so
    code order ≡ lexicographic term order) pre-aggregated within the
    partition, then a final ``groupby(term_a, term_b) → Sum``. Shuffle
    volume is distinct-(doc,term) rows twice plus one row per distinct
    pair per partition — never one row per co-occurrence.

    ``max_doc_terms`` bounds the per-doc pair emission INDEPENDENTLY of
    the df band (VERDICT r3 #6): a pathological doc whose surviving
    vocabulary is huge would otherwise emit O(V²) pairs in its
    partition. Docs over the cap keep a deterministic pseudo-random
    sample of ``max_doc_terms`` surviving terms — ranked by
    md5(term) ⊕ mix(doc_id), so the sample is stable across runs and
    partitionings and not lexicographically biased — and the drop is
    logged (under-count-only contract, same spirit as
    ``max_shingle_df`` in the Jaccard pass). ``None`` (default) keeps
    the exact semantics the DuckDB oracle checks; a cap ≥ every doc's
    surviving vocabulary is a no-op (pytest-pinned)."""
    from ..text.hashvec import md5_lower64_strings
    from .dedup import _segment_index_pairs

    if num_parts is None:
        num_parts = auto_num_parts(ds.count())
    hi = np.iinfo(np.int64).max if max_df is None else max_df

    def doc_terms(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"tpart": pa.array([], type=pa.int32()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string())})
        flat = pc.utf8_lower(flat)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(par * len(vocab) + codes)  # distinct (doc, term)
        doc_idx = key // len(vocab)
        term_idx = key % len(vocab)
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        terms = vocab.take(pa.array(term_idx))
        tpart = (md5_lower64_strings(terms)
                 & np.uint64(num_parts - 1)).astype(np.int32)
        return pa.table({
            "tpart": pa.array(tpart),
            "doc_id": pa.array(dids[doc_idx], type=pa.int64()),
            "term": terms,
        })

    def df_filter(group: pa.Table) -> pa.Table:
        terms = np.asarray(group["term"].to_pylist())
        dids = group["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(terms, return_inverse=True,
                                   return_counts=True)
        ok = (cnt >= min_df) & (cnt <= hi)
        keep = ok[inv]
        dids, terms = dids[keep], terms[keep]
        return pa.table({
            "dpart": pa.array((dids & (num_parts - 1)).astype(np.int32)),
            "doc_id": pa.array(dids, type=pa.int64()),
            "term": pa.array(terms.tolist(), type=pa.string()),
        })

    def doc_pairs(group: pa.Table) -> pa.Table:
        terms = np.asarray(group["term"].to_pylist())
        dids = group["doc_id"].to_numpy(zero_copy_only=False)
        if len(terms) == 0:
            return pa.table({"term_a": pa.array([], type=pa.string()),
                             "term_b": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        if max_doc_terms is not None:
            # deterministic per-doc sample: rank rows by
            # md5(term) ⊕ splitmix(doc_id) within each doc, keep the
            # max_doc_terms lowest — stable across runs/partitionings
            hv = md5_lower64_strings(group["term"])
            mix = (dids.astype(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15)) ^ hv
            order = np.lexsort((mix, dids))
            d_sorted = dids[order]
            first = np.ones(len(d_sorted), dtype=bool)
            first[1:] = d_sorted[1:] != d_sorted[:-1]
            seg_start = np.repeat(np.flatnonzero(first), np.diff(
                np.append(np.flatnonzero(first), len(d_sorted))))
            rank = np.arange(len(d_sorted), dtype=np.int64) - seg_start
            keep_sorted = rank < max_doc_terms
            dropped = int(len(d_sorted) - np.count_nonzero(keep_sorted))
            if dropped:
                import logging
                logging.getLogger(__name__).warning(
                    "cooccurrence_counts: max_doc_terms=%d dropped %d "
                    "surviving (doc, term) rows — pair counts touching "
                    "capped docs under-count", max_doc_terms, dropped)
            sel = np.sort(order[keep_sorted])  # original row order back
            terms, dids = terms[sel], dids[sel]
        vocab, codes = np.unique(terms, return_inverse=True)
        # sorted-unique vocabulary ⇒ code order ≡ lexicographic order,
        # so pair (code_a < code_b) is exactly (term_a < term_b)
        order, ia, ib = _segment_index_pairs(
            np.zeros(len(codes), dtype=np.int64), dids, codes, None)
        codes = codes[order]
        pkey = codes[ia].astype(np.int64) * len(vocab) + codes[ib]
        uniq, cnt = np.unique(pkey, return_counts=True)
        return pa.table({
            "term_a": pa.array(vocab[uniq // len(vocab)].tolist(),
                               type=pa.string()),
            "term_b": pa.array(vocab[uniq % len(vocab)].tolist(),
                               type=pa.string()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    pairs = (ds.map_batches(doc_terms, batch_format="pyarrow")
             .groupby("tpart").map_groups(df_filter, batch_format="pyarrow")
             .groupby("dpart").map_groups(doc_pairs, batch_format="pyarrow")
             .groupby(["term_a", "term_b"])
             .aggregate(Sum("cnt", alias_name="pair_count")))

    def above_min(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["pair_count"],
                                             pa.scalar(int(min_count))))

    return (pairs.map_batches(above_min, batch_format="pyarrow")
            .sort(["pair_count", "term_a", "term_b"],
                  descending=[True, False, False])
            .limit(k))


def dup_token_spans(ds: Dataset, shingle_k: int = 5,
                    num_parts: int | None = None) -> Dataset:
    """(doc_id, n_tokens, n_dup_tokens, dup_token_fraction,
    n_dup_spans, max_dup_span) — per document, how many of its TOKEN
    POSITIONS are covered by at least one token ``shingle_k``-gram
    that occurs at ≥ 2 positions corpus-wide (same-document repeats
    count — Lee et al. 2022 ExactSubstr semantics at token
    granularity: a position is "duplicated" iff some length-k window
    containing it appears elsewhere), plus the island structure of
    that coverage: the number of maximal duplicated spans and the
    longest one's token length. Exact, SQL-oracle checkable.

    Distributed shape (two linear shuffles, no pair pass): explode
    every positional shingle occurrence (multiset, position + doc token
    count riding along), group by a coarse partition of the shingle
    space — every occurrence of a shingle lands in ONE partition, so a
    vectorized segment scan marks globally-duplicated occurrences —
    then regroup the surviving (doc, start) rows by a coarse partition
    of the doc space and take the per-doc interval union with one
    segmented scan (spans have constant width w = min(k, n_tokens), so
    the union size is w + Σ min(w, Δstart) over position-sorted
    starts). Shuffle volume: O(total tokens) then O(duplicated starts).

    Inner semantics: only documents with ≥ 1 duplicated position are
    reported (blank docs have no shingles; docs shorter than k tokens
    participate as one whole-text shingle covering all their tokens —
    the dedup-family convention)."""
    if num_parts is None:
        num_parts = auto_num_parts(ds)
    starts = _dup_span_starts(ds, shingle_k, num_parts)

    def cover(group: pa.Table) -> pa.Table:
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = group["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, did))
        did, pos, ntok = did[order], pos[order], ntok[order]
        w = np.minimum(shingle_k, ntok)
        first = np.ones(len(did), dtype=bool)
        first[1:] = did[1:] != did[:-1]
        # per-row contribution: first start covers w tokens, each later
        # start adds the non-overlapping suffix min(w, pos_i - pos_{i-1})
        prev = np.empty(len(pos), dtype=np.int64)
        prev[0] = 0
        prev[1:] = pos[:-1]
        contrib = np.where(first, w, np.minimum(w, pos - prev))
        seg_id = np.cumsum(first) - 1
        covered = np.bincount(seg_id, weights=contrib).astype(np.int64)
        # islands (maximal duplicated spans): starts chain while the
        # gap <= w, so a run break is a doc break or pos jump > w; the
        # span length at each row is pos + w - (its run's first pos),
        # maximal at the run's last row — a per-doc max over rows
        run_break = first | ((pos - prev) > w)
        run_id = np.cumsum(run_break) - 1
        run_first_pos = pos[run_break][run_id]
        span_len_at_row = pos + w - run_first_pos
        doc_starts = np.flatnonzero(first)
        max_span = np.maximum.reduceat(span_len_at_row, doc_starts)
        n_spans = np.add.reduceat(run_break.astype(np.int64), doc_starts)
        u_did = did[first]
        u_ntok = ntok[first]
        return pa.table({
            "doc_id": pa.array(u_did, type=pa.int64()),
            "n_tokens": pa.array(u_ntok, type=pa.int64()),
            "n_dup_tokens": pa.array(covered),
            "dup_token_fraction": pa.array(covered / u_ntok,
                                           type=pa.float64()),
            "n_dup_spans": pa.array(n_spans),
            "max_dup_span": pa.array(max_span, type=pa.int64()),
        })

    return starts.groupby("dpart").map_groups(
        cover, batch_format="pyarrow")


def _dup_span_starts(ds: Dataset, shingle_k: int,
                     num_parts: int) -> Dataset:
    """(dpart, doc_id, pos, n_tok) — the start positions of every
    globally-duplicated ``shingle_k``-gram occurrence (total occurrence
    count ≥ 2 corpus-wide, same-doc repeats counting), keyed by a
    coarse doc partition for the downstream per-doc pass. The shared
    first half of :func:`dup_token_spans` / :func:`strip_dup_spans`."""
    from .dedup import positional_shingles_batch

    def explode(batch: pa.Table) -> pa.Table:
        did, sh, pos, ntok = positional_shingles_batch(batch, shingle_k)
        return pa.table({
            "part": pa.array((sh % num_parts).astype(np.int32)),
            "shingle": pa.array(sh),
            "doc_id": pa.array(did, type=pa.int64()),
            "pos": pa.array(pos),
            "n_tok": pa.array(ntok),
        })

    def scan(group: pa.Table) -> pa.Table:
        sh = group["shingle"].to_numpy(zero_copy_only=False)
        order = np.argsort(sh, kind="stable")
        sh = sh[order]
        n = len(sh)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = sh[1:] != sh[:-1]
        seg_id = np.cumsum(new_seg) - 1
        dup = (np.bincount(seg_id) >= 2)[seg_id]
        keep = order[dup]
        did = group["doc_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "dpart": pa.array((did % num_parts).astype(np.int32)),
            "doc_id": pa.array(did, type=pa.int64()),
            "pos": group["pos"].take(pa.array(keep)),
            "n_tok": group["n_tok"].take(pa.array(keep)),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("part").map_groups(scan, batch_format="pyarrow"))


def strip_dup_spans(ds: Dataset, shingle_k: int = 5,
                    num_parts: int | None = None) -> Dataset:
    """(doc_id, text, n_tokens, n_removed) — the corpus with every
    duplicated span REMOVED: tokens covered by any token
    ``shingle_k``-gram occurring at ≥ 2 positions corpus-wide are
    dropped and the survivors re-joined with single spaces (output text
    is whitespace-normalized; every non-blank doc is reported, blank
    docs pass through as empty strings). The transform half of
    :func:`dup_token_spans` — ``n_removed`` there ≡ ``n_dup_tokens``
    here, and the kept-token count is ``n_tokens - n_removed``.

    Distributed shape: the shared duplicated-start pass, then ONE
    doc-partitioned groupby where each doc's text row meets its start
    rows (the union-shuffle zip-join pattern — no driver state); the
    per-partition rebuild is vectorized (one Arrow tokenize, one
    diff-array coverage cumsum over the flat token space, one
    ``binary_join`` for the output strings)."""
    from .dedup import _tokenize_texts_batch
    if num_parts is None:
        num_parts = auto_num_parts(ds)
    starts = _dup_span_starts(ds, shingle_k, num_parts).map_batches(
        lambda b: b.append_column(
            "text", pa.array([None] * b.num_rows,
                             type=pa.large_string())),
        batch_format="pyarrow")

    def doc_rows(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(did)
        return pa.table({
            "dpart": pa.array((did % num_parts).astype(np.int32)),
            "doc_id": pa.array(did, type=pa.int64()),
            "pos": pa.array(np.full(n, -1, dtype=np.int32)),
            "n_tok": pa.array(np.zeros(n, dtype=np.int32)),
            "text": pc.cast(batch["text"], pa.large_string()),
        })

    def rebuild(group: pa.Table) -> pa.Table:
        pos_all = group["pos"].to_numpy(zero_copy_only=False)
        did_all = group["doc_id"].to_numpy(zero_copy_only=False)
        is_doc = pos_all < 0
        doc_order = np.argsort(did_all[is_doc], kind="stable")
        texts = group["text"].combine_chunks().filter(
            pa.array(is_doc)).take(pa.array(doc_order))
        doc_ids = did_all[is_doc][doc_order]
        flat, off = _tokenize_texts_batch(texts)
        counts = np.diff(off)
        # map each duplicated start to its doc's flat token range
        s_did = did_all[~is_doc]
        s_pos = pos_all[~is_doc].astype(np.int64)
        s_ntok = group["n_tok"].to_numpy(
            zero_copy_only=False)[~is_doc].astype(np.int64)
        di = np.searchsorted(doc_ids, s_did)
        if len(di) and (len(doc_ids) == 0 or not np.array_equal(
                doc_ids[np.minimum(di, len(doc_ids) - 1)], s_did)):
            raise ValueError(
                "strip_dup_spans: duplicated-start rows reference "
                "doc_ids absent from the corpus partition")
        w = np.minimum(shingle_k, s_ntok)
        # interval-union via a diff array over the flat token space
        diff = np.zeros(off[-1] + 1, dtype=np.int64)
        np.add.at(diff, off[:-1][di] + s_pos, 1)
        np.add.at(diff, off[:-1][di] + s_pos + w, -1)
        covered = np.cumsum(diff[:-1]) > 0
        kept = ~covered
        kept_flat = flat.filter(pa.array(kept))
        kept_counts = np.zeros(len(counts), dtype=np.int64)
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if kept.any():
            np.add.at(kept_counts, doc_of[kept], 1)
        kept_off = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=kept_off[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(kept_off.astype(np.int32), type=pa.int32()), kept_flat)
        from .dedup import join_lists
        joined = join_lists(lst, " ")
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "text": joined,
            "n_tokens": pa.array(counts.astype(np.int64)),
            "n_removed": pa.array(counts - kept_counts),
        })

    docs = ds.map_batches(doc_rows, batch_format="pyarrow")
    return docs.union(starts).groupby("dpart").map_groups(
        rebuild, batch_format="pyarrow")


def textrank_keywords(ds: Dataset, k: int = 25, iters: int = 3,
                      damping: float = 0.85,
                      num_parts: int | None = None) -> pa.Table:
    """Top-*k* corpus keywords by TextRank (Mihalcea & Tarau 2004,
    "TextRank: Bringing Order into Texts") — ``(term, textrank)``
    ordered (score desc, term asc). The classic unsupervised keyword
    extractor: PageRank over the word co-occurrence graph, here with
    the window-2 convention (an edge per ADJACENT token pair
    occurrence, both directions, self-loops dropped). Occurrences
    collapse to ONE weighted row per distinct ordered pair before the
    iteration — count-weighted TextRank, contribution ``(r/deg)·w``
    with ``deg = Σw`` — so each power-iteration pass scans the
    distinct-pair set, not the occurrence stream (an order of magnitude
    smaller under Zipfian text; measured delta in BASELINE.md).

    Distributed shape: the vocabulary (dense node ids = term-ascending
    rank — the vocab-bounded driver contract shared with
    :func:`~ts_type_filter_ray.functions.graph.pagerank`'s rank
    vector) broadcasts once via ``ray.put``; one ``map_batches`` pass
    emits per-batch weighted pair partials (batch-unique tokens map to
    ids through one ``index_in``), one coarse pair-key groupby merges
    them to distinct weighted edges; then the flat-teleport power
    iteration (initial rank 1, teleport ``1-d``). Float value-exact vs
    an unrolled-iterations SQL oracle — the ordered-fold trick."""
    import ray

    from .bpe import word_count_table
    from .graph import pagerank

    words = word_count_table(ds, num_parts=num_parts)
    terms = words["term"].combine_chunks()
    n_nodes = len(terms)
    if n_nodes == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "textrank": pa.array([], type=pa.float64())})
    vocab_ref = ray.put(terms)   # Arrow array: zero-copy from plasma

    def explode(batch: pa.Table) -> pa.Table:
        from .dedup import _tokenize_texts_batch
        flat, off = _tokenize_texts_batch(batch["text"])
        if len(flat) < 2:
            return pa.table({"epart": pa.array([], type=pa.int32()),
                             "key": pa.array([], type=pa.uint64()),
                             "w": pa.array([], type=pa.int64())})
        flat = pc.utf8_lower(flat)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # vocab is term-ascending, so index_in position == dense node id
        uid_arr = pc.index_in(enc.dictionary,
                              value_set=ray.get(vocab_ref))
        if uid_arr.null_count:
            raise ValueError(
                "textrank_keywords: token absent from the vocabulary "
                "pass — is the input Dataset nondeterministic across "
                "re-executions?")
        uid = uid_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = uid[enc.indices.to_numpy(zero_copy_only=False)]
        counts = np.diff(off)
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64),
                           counts)
        a, b = ids[:-1], ids[1:]
        same_doc = doc_of[:-1] == doc_of[1:]
        keep = same_doc & (a != b)
        a, b = a[keep], b[keep]
        src = np.concatenate([a, b]).astype(np.uint64)
        dst = np.concatenate([b, a]).astype(np.uint64)
        # per-batch weighted partials over the packed pair key
        key = src * np.uint64(n_nodes) + dst
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "epart": pa.array((uniq % np.uint64(16)).astype(np.int32)),
            "key": pa.array(uniq),
            "w": pa.array(cnt.astype(np.int64)),
        })

    if n_nodes >= 1 << 31:
        raise ValueError("textrank_keywords: vocabulary too large for "
                         "the uint64 pair-key pack (n >= 2^31)")

    def merge_edges(group: pa.Table) -> pa.Table:
        # global per-pair weight: every copy of a key is in this group
        k = group["key"].to_numpy(zero_copy_only=False)
        w = group["w"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        tw = np.bincount(inv, weights=w,
                         minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "src": pa.array((uniq // np.uint64(n_nodes))
                            .astype(np.int64)),
            "dst": pa.array((uniq % np.uint64(n_nodes))
                            .astype(np.int64)),
            "w": pa.array(tw),
        })

    # materialize once: pagerank re-scans the edge set every iteration
    # (deg pass + iters contribution passes). One distinct-pair row per
    # edge (weighted), not one per occurrence — fixed-width rows in the
    # object store; the executor spills.
    edges = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("epart")
             .map_groups(merge_edges, batch_format="pyarrow")
             .materialize())
    pr = pagerank(edges, n_nodes, iters=iters, damping=damping,
                  flat_teleport=True, weight_col="w",
                  num_parts=num_parts if num_parts is not None else 16)
    scores = pr["pagerank"].to_numpy(zero_copy_only=False)
    order = np.lexsort((np.arange(n_nodes), -scores))[:k]
    return pa.table({
        "term": terms.take(pa.array(order)),
        "textrank": pa.array(scores[order], type=pa.float64()),
    })


def pmi_collocations(ds: Dataset, min_count: int = 5,
                     k: int | None = None,
                     num_parts: int | None = None) -> Dataset:
    """Bigram collocations by pointwise mutual information (Church &
    Hanks 1990) — ``(w1, w2, c12, pmi)`` for every adjacent lowercased
    bigram occurring at least *min_count* times, where over the bigram
    sample space (T = total bigram occurrences)

        pmi = ln( P(w1,w2) / (P1(w1) * P2(w2)) )
            = ln(c12 * T) - ln(c1 * c2)

    with c1 = occurrences of w1 as a bigram HISTORY and c2 = of w2 as a
    CONTINUATION (the positional marginals, so probabilities normalize
    exactly). Both log arguments are integers — the float pmi column
    itself crosses the value-exact gate (libm ln both sides).

    Scale shape: per-batch pair COUNT PARTIALS (one row per batch-
    unique bigram — never per occurrence), then three exchanges over
    the DISTINCT-pair table, which is vocabulary^2-bounded and in
    practice tiny next to the corpus: (1) pair-hash partitions sum the
    partials into c12; (2) w1-hash partitions hold every pair of each
    history, so c1 is a segment sum of c12 — no second corpus pass;
    (3) w2-hash partitions the same for c2, then filter + pmi. Rows
    are grouped by STRING inside each partition (hashes only route),
    so md5 collisions cannot corrupt counts. T is one tiny tokenize
    pass. ``k``: optional exact top-k by (pmi desc, w1, w2)."""
    from .dedup import join_elementwise
    from .partitioning import auto_num_parts
    from ..text.hashvec import md5_lower64_strings

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def tok_partial(batch: pa.Table) -> pa.Table:
        n_tok, _, _ = _tokens(batch)
        n = n_tok.to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(
            [int(np.maximum(n - 1, 0).sum())], type=pa.int64())})

    t_total = sum(r["n"] for r in ds.map_batches(
        tok_partial, batch_format="pyarrow").take_all())
    if t_total >= (1 << 31):
        # c1 * c2 <= T^2 must stay under 2^63 in the worst case
        raise OverflowError("pmi_collocations: total bigram count too "
                            "large for the int64 log-argument contract "
                            "— shard the corpus")

    def _empty() -> pa.Table:
        return pa.table({
            "w1": pa.array([], type=pa.string()),
            "w2": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
            "ppart": pa.array([], type=pa.int32()),
        })

    def pair_partials(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        if len(flat) < 2:
            return _empty()
        flat = pc.utf8_lower(flat)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        par = parents.to_numpy(zero_copy_only=False)
        live = np.nonzero(par[1:] == par[:-1])[0]
        if live.size == 0:
            return _empty()
        grams = join_elementwise(flat.slice(0, len(flat) - 1),
                                 flat.slice(1), "\x1f")
        grams = grams.take(pa.array(live))
        enc = pc.dictionary_encode(grams)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # unique codes are exactly 0..D-1; first[i] = first occurrence
        # of code i, so everything below is aligned with code order
        first = np.unique(codes, return_index=True)[1]
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        sel = pa.array(live[first])
        w1 = flat.take(sel)
        w2 = flat.take(pc.add(sel, 1))
        ph = md5_lower64_strings(enc.dictionary)
        return pa.table({
            "w1": w1, "w2": w2,
            "cnt": pa.array(cnt.astype(np.int64)),
            "ppart": pa.array((ph % num_parts).astype(np.int32)),
        })

    def sum_pairs(group: pa.Table) -> pa.Table:
        key = join_elementwise(group["w1"], group["w2"], "\x1f")
        enc = pc.dictionary_encode(key)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        first = np.unique(codes, return_index=True)[1]
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        c12 = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(c12, codes, cnt)
        # first[i] = first row of code i — c12 is already in code order
        sel = pa.array(first)
        w1 = group["w1"].take(sel)
        w2 = group["w2"].take(sel)
        h1 = md5_lower64_strings(
            w1.combine_chunks() if isinstance(w1, pa.ChunkedArray) else w1)
        return pa.table({
            "w1": w1, "w2": w2,
            "c12": pa.array(c12),
            "hpart": pa.array((h1 % num_parts).astype(np.int32)),
        })

    def attach_c1(group: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(group["w1"].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        c12 = group["c12"].to_numpy(zero_copy_only=False)
        c1 = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(c1, codes, c12)
        w2 = group["w2"]
        h2 = md5_lower64_strings(
            w2.combine_chunks() if isinstance(w2, pa.ChunkedArray) else w2)
        return pa.table({
            "w1": group["w1"], "w2": group["w2"],
            "c12": group["c12"],
            "c1": pa.array(c1[codes]),
            "cpart": pa.array((h2 % num_parts).astype(np.int32)),
        })

    def attach_c2_emit(group: pa.Table) -> pa.Table:
        from .lm import _log_int
        enc = pc.dictionary_encode(group["w2"].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        c12 = group["c12"].to_numpy(zero_copy_only=False)
        c2 = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(c2, codes, c12)
        c2r = c2[codes]
        c1 = group["c1"].to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(c12 >= min_count)
        kidx = pa.array(keep)
        pmi = (_log_int(c12[keep] * t_total)
               - _log_int(c1[keep] * c2r[keep]))
        return pa.table({
            "w1": group["w1"].take(kidx),
            "w2": group["w2"].take(kidx),
            "c12": group["c12"].take(kidx),
            "pmi": pa.array(pmi),
        })

    out = (ds.map_batches(pair_partials, batch_format="pyarrow")
           .groupby("ppart")
           .map_groups(sum_pairs, batch_format="pyarrow")
           .groupby("hpart")
           .map_groups(attach_c1, batch_format="pyarrow")
           .groupby("cpart")
           .map_groups(attach_c2_emit, batch_format="pyarrow"))
    if k is not None:
        out = out.sort(["pmi", "w1", "w2"],
                       descending=[True, False, False]).limit(k)
    return out
