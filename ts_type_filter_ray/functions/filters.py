"""Heuristic curation filters — the rule-based filter stack of the
classic LLM corpus recipes, complementing the model-based family
(``textstats.classifier_scores``, ``lm.*``): Gopher document-quality
rules (Rae et al. 2021, MassiveText §A1.1), C4 line cleaning (Raffel et
al. 2020 §2.2) and temperature-scaled mixture sampling (the multilingual
rate schedule of Lample & Conneau 2019).

All three are single-pass per-batch maps with **no shuffle** in the rule
evaluation itself (`temperature_sample` needs one tiny bounded
``groupby(group).count()`` — O(#groups) rows — before its shuffle-free
accept pass), so at 100 TB each streams at read bandwidth. Every float
that crosses the driver gate is computed with SQL-identical float64
expression shapes (sum::DOUBLE / greatest(n,1)), and keep verdicts cross
as int64 0/1 (the ``semantic_dedup_exact`` convention).

Reference tie-in: the reference has no curation stack (SURVEY.md §2.12);
these extend the engine's training-data-pipeline surface the way
``functions/linededup.py`` (CCNet line dedup) and ``functions/lm.py``
(CCNet perplexity) do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .dedup import join_lists
from .linededup import _split_lines
from .sampling import _md5_bucket
from .textstats import STOPWORDS, _tokens

# Gopher's "symbol" set: hash marks and ellipses (Rae et al. 2021 list
# "#" and "..." — we add the unicode ellipsis). A token counts as a
# symbol token if it CONTAINS any of these (substring semantics, so the
# SQL mirror is position()>0).
SYMBOL_SUBSTRINGS = ("#", "...", "…")

# C4's terminal-punctuation rule: a line survives only if it ends in
# one of these (Raffel et al. 2020 keep ".", "!", "?", '"').
TERMINAL_PUNCT_RE = r'[.!?"]$'


def gopher_rules(ds: Dataset,
                 min_words: int = 50,
                 max_words: int = 100_000,
                 min_mean_len: float = 3.0,
                 max_mean_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_ratio: float = 0.8,
                 min_stop_distinct: int = 2,
                 stopwords: tuple[str, ...] = STOPWORDS) -> Dataset:
    """Gopher repetition-free quality rules, one row per document:
    ``(doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
    n_stop_distinct, keep)`` with ``keep`` = 1 iff ALL rules pass:

    - ``min_words <= n_words <= max_words``;
    - ``min_mean_len <= mean_word_len <= max_mean_len``;
    - ``symbol_ratio <= max_symbol_ratio`` (fraction of words containing
      a :data:`SYMBOL_SUBSTRINGS` member);
    - ``alpha_ratio >= min_alpha_ratio`` (fraction of words containing
      at least one ``[A-Za-z]``);
    - at least ``min_stop_distinct`` DISTINCT members of ``stopwords``
      appear (lowercased membership).

    Pure per-batch map, fully vectorized (Arrow split/regex kernels +
    bincount); a document with zero words fails the word-count rule and
    reports 0.0 ratios (``greatest(n,1)`` denominators, mirrored by the
    SQL oracle)."""
    stop_arr = pa.array(list(stopwords))
    n_stop_words = len(stopwords)

    def fn(batch: pa.Table) -> pa.Table:
        n_tok_arr, flat, parents = _tokens(batch)
        n = batch.num_rows
        n_tok = n_tok_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        par = parents.to_numpy(zero_copy_only=False)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        has_alpha = pc.match_substring_regex(flat, "[A-Za-z]") \
            .to_numpy(zero_copy_only=False)
        is_sym = np.zeros(len(flat), dtype=bool)
        for s in SYMBOL_SUBSTRINGS:
            is_sym |= pc.match_substring(flat, s).to_numpy(
                zero_copy_only=False)
        len_sum = np.bincount(par, weights=tok_len,
                              minlength=n).astype(np.int64)
        n_alpha = np.bincount(par, weights=has_alpha,
                              minlength=n).astype(np.int64)
        n_sym = np.bincount(par, weights=is_sym,
                            minlength=n).astype(np.int64)
        # distinct stopwords per doc: stopword code per token (null if
        # not a stopword), unique (doc, code) pairs, count per doc
        codes = pc.fill_null(
            pc.index_in(pc.utf8_lower(flat), value_set=stop_arr), -1)
        cv = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        hit = cv >= 0
        keys = par[hit] * n_stop_words + cv[hit]
        uniq = np.unique(keys)
        n_stop = np.bincount(uniq // n_stop_words,
                             minlength=n).astype(np.int64)
        safe = np.maximum(n_tok, 1).astype(np.float64)
        mean_len = len_sum / safe
        sym_ratio = n_sym / safe
        alpha_ratio = n_alpha / safe
        keep = ((n_tok >= min_words) & (n_tok <= max_words)
                & (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
                & (sym_ratio <= max_symbol_ratio)
                & (alpha_ratio >= min_alpha_ratio)
                & (n_stop >= min_stop_distinct))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_tok),
            "mean_word_len": pa.array(mean_len, type=pa.float64()),
            "symbol_ratio": pa.array(sym_ratio, type=pa.float64()),
            "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
            "n_stop_distinct": pa.array(n_stop),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def c4_clean(ds: Dataset,
             min_line_words: int = 3,
             require_terminal_punct: bool = True,
             bad_line_terms: tuple[str, ...] = ("javascript",),
             bad_doc_terms: tuple[str, ...] = ("lorem ipsum", "{"),
             min_kept_lines: int = 1) -> Dataset:
    """C4 line-level cleaning: ``(doc_id, n_lines, n_kept, text)`` for
    every SURVIVING document, with ``text`` rebuilt from the kept lines
    (``\\n``-joined, original line order).

    Line rules (a line is kept iff all pass):
    - ends in terminal punctuation (:data:`TERMINAL_PUNCT_RE`), when
      ``require_terminal_punct``;
    - has at least ``min_line_words`` whitespace words;
    - contains no ``bad_line_terms`` member (lowercased substring).

    Document rules (the row is dropped entirely when violated):
    - the full text contains no ``bad_doc_terms`` member (lowercased
      substring — C4's "lorem ipsum" / curly-brace page drops);
    - at least ``min_kept_lines`` lines survive.

    Pure per-batch map — no shuffle, no state; exact and SQL-oracle
    checkable including the rebuilt strings (the ``line_dedup``
    precedent)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lower_doc = pc.utf8_lower(pc.fill_null(
            pc.cast(batch["text"], pa.large_string()), ""))
        bad_doc = np.zeros(n, dtype=bool)
        for t in bad_doc_terms:
            bad_doc |= pc.match_substring(lower_doc, t).to_numpy(
                zero_copy_only=False)
        flat, off = _split_lines(batch["text"])
        counts = np.diff(off)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        words = pc.count_substring_regex(flat, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep_line = words >= min_line_words
        if require_terminal_punct:
            keep_line &= pc.match_substring_regex(
                flat, TERMINAL_PUNCT_RE).to_numpy(zero_copy_only=False)
        lower_flat = pc.utf8_lower(flat)
        for t in bad_line_terms:
            keep_line &= ~pc.match_substring(lower_flat, t).to_numpy(
                zero_copy_only=False)
        n_kept = np.bincount(doc_of, weights=keep_line,
                             minlength=n).astype(np.int64)
        keep_doc = (~bad_doc) & (n_kept >= min_kept_lines)
        # rebuild: drop lines of dropped docs too, then reassemble only
        # surviving docs' offsets
        keep_line &= keep_doc[doc_of]
        kept_flat = flat.filter(pa.array(keep_line))
        kept_counts = n_kept[keep_doc]
        kept_off = np.zeros(len(kept_counts) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=kept_off[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(kept_off.astype(np.int32), type=pa.int32()),
            kept_flat)
        km = pa.array(keep_doc)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().filter(km),
            "n_lines": pa.array(counts[keep_doc].astype(np.int64)),
            "n_kept": pa.array(n_kept[keep_doc]),
            "text": join_lists(lst, "\n"),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _gram_layout(n_tok: np.ndarray, off: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """(window count per doc, global window start indices) for token
    ``k``-grams over a flat token array with per-doc ``off``sets —
    windows never cross a document boundary."""
    wc = np.maximum(n_tok - k + 1, 0)
    within = np.arange(wc.sum(), dtype=np.int64) - np.repeat(
        np.cumsum(wc) - wc, wc)
    starts = np.repeat(off[:-1], wc) + within
    return wc, starts


def _doc_gram_stats(flat: pa.Array, n_tok: np.ndarray, off: np.ndarray,
                    k: int, n_docs: int):
    """Per-document k-gram statistics in one vectorized pass:
    ``(top_gram strings, top_count, top_chars, dup_chars)`` arrays of
    length ``n_docs``. ``top_*`` describe each doc's most frequent
    k-gram (ties broken lexicographically smallest — byte order, which
    DuckDB's binary collation mirrors); ``dup_chars`` sums
    ``count * len(gram)`` over grams occurring >= 2 times in the doc.
    Docs with fewer than ``k`` tokens report ('' , 0, 0, 0)."""
    wc, starts = _gram_layout(n_tok, off, k)
    total = int(wc.sum())
    top_gram = np.full(n_docs, "", dtype=object)
    top_count = np.zeros(n_docs, dtype=np.int64)
    top_chars = np.zeros(n_docs, dtype=np.int64)
    dup_chars = np.zeros(n_docs, dtype=np.int64)
    if total == 0:
        return top_gram, top_count, top_chars, dup_chars
    idx = (starts[:, None] + np.arange(k, dtype=np.int64)).ravel()
    vals = flat.take(pa.array(idx))
    lst = pa.ListArray.from_arrays(
        pa.array(np.arange(0, total * k + 1, k, dtype=np.int64)
                 .astype(np.int32), type=pa.int32()), vals)
    grams = join_lists(lst, " ")
    enc = pc.dictionary_encode(grams)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = enc.dictionary
    v = len(dic)
    # lexicographic rank of each dictionary entry (byte order)
    sorted_pos = pc.sort_indices(dic).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rank = np.empty(v, dtype=np.int64)
    rank[sorted_pos] = np.arange(v, dtype=np.int64)
    dlen = pc.utf8_length(dic).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    len_of_rank = dlen[sorted_pos]
    gdoc = np.repeat(np.arange(n_docs, dtype=np.int64), wc)
    key = gdoc * v + rank[codes]
    uniq, counts = np.unique(key, return_counts=True)
    docidx = uniq // v
    grank = uniq % v
    glen = len_of_rank[grank]
    # duplicated-gram char mass: count * len over grams with count >= 2
    dmask = counts >= 2
    dup_chars = np.bincount(docidx[dmask],
                            weights=counts[dmask] * glen[dmask],
                            minlength=n_docs).astype(np.int64)
    # per-doc argmax(count, tie -> min rank): score is unique per row
    seg = np.ones(len(uniq), dtype=bool)
    seg[1:] = docidx[1:] != docidx[:-1]
    starts_u = np.flatnonzero(seg)
    score = counts * np.int64(v + 1) - grank
    smax = np.maximum.reduceat(score, starts_u)
    seg_of = np.cumsum(seg) - 1
    pick = np.flatnonzero(score == smax[seg_of])
    # one winner per segment by construction (scores unique within doc)
    top_count[docidx[pick]] = counts[pick]
    top_chars[docidx[pick]] = counts[pick] * glen[pick]
    winners = dic.take(pa.array(sorted_pos[grank[pick]]))
    top_gram[docidx[pick]] = np.asarray(winners.to_pylist(),
                                        dtype=object)
    return top_gram, top_count, top_chars, dup_chars


def gopher_repetition(ds: Dataset, top_n: int = 2,
                      dup_n: int = 5) -> Dataset:
    """Gopher's WITHIN-document repetition signals (Rae et al. 2021
    §A1.1 — distinct from the corpus-wide ``dup_ngram_fraction``):
    ``(doc_id, n_tokens, top_gram, top_gram_count, top_gram_frac,
    dup_gram_frac)`` where

    - ``top_gram`` is the doc's most frequent token ``top_n``-gram
      (ties: lexicographically smallest), and ``top_gram_frac`` the
      fraction of the doc's characters its occurrences cover
      (``count * len(gram) / total_chars``, chars of the
      whitespace-normalized text);
    - ``dup_gram_frac`` is the character fraction covered by ALL
      ``dup_n``-grams occurring >= 2 times within the doc
      (overlap-naive ``sum(count * len)``, the cheap upper-bound
      convention).

    Pure per-batch map, no shuffle; every float is one int64/int64
    division in float64 (SQL-identical shapes)."""

    def fn(batch: pa.Table) -> pa.Table:
        n_tok_arr, flat, parents = _tokens(batch)
        n = batch.num_rows
        n_tok = n_tok_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        par = parents.to_numpy(zero_copy_only=False)
        flat = flat.combine_chunks() if isinstance(
            flat, pa.ChunkedArray) else flat
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_tok, out=off[1:])
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        total_chars = (np.bincount(par, weights=tok_len, minlength=n)
                       .astype(np.int64)
                       + np.maximum(n_tok - 1, 0))
        top_gram, top_count, top_chars, _ = _doc_gram_stats(
            flat, n_tok, off, top_n, n)
        _, _, _, dup_chars = _doc_gram_stats(flat, n_tok, off, dup_n, n)
        safe = np.maximum(total_chars, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "top_gram": pa.array(list(top_gram), type=pa.string()),
            "top_gram_count": pa.array(top_count),
            "top_gram_frac": pa.array(top_chars / safe,
                                      type=pa.float64()),
            "dup_gram_frac": pa.array(dup_chars / safe,
                                      type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def temperature_sample(ds: Dataset, alpha: float = 0.5,
                       group_col: str = "lang",
                       id_col: str = "doc_id",
                       mod: int = 10_000) -> Dataset:
    """Temperature-scaled mixture sampling (the multilingual rate
    schedule): each group's keep rate is ``(n_g / n_min) ** (alpha-1)``
    — the SMALLEST group keeps everything, larger groups are
    downsampled toward balance as ``alpha`` drops below 1 (``alpha=1``
    keeps everything, ``alpha=0`` equalizes expected counts). Returns
    ``(id, group, bucket)`` of the kept rows.

    Rates are DERIVED from the data: one tiny ``groupby(group).count()``
    (bounded: one row per group value — the only driver-side state) sets
    the per-group cutoff ``floor(rate * mod)``; the accept pass is the
    coordination-free deterministic hash of :func:`stratified_sample`
    (``md5(id) % mod < cut``), so verdicts are reproducible across
    reruns and engines with no RNG state and no shuffle."""
    counts = {r[group_col]: r["count()"]
              for r in ds.groupby(group_col).count().take_all()}
    if not counts:
        raise ValueError("temperature_sample: empty input")
    n_min = min(counts.values())
    cut = {g: int(np.floor(
               (float(c) / float(n_min)) ** (alpha - 1.0) * mod))
           for g, c in counts.items()}

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bucket = _md5_bucket(ids, mod=mod)
        enc = pc.dictionary_encode(batch[group_col].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq_cuts = np.fromiter(
            (cut.get(g, 0) for g in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        codes = enc.indices.to_numpy(zero_copy_only=False)
        keep = bucket < uniq_cuts[codes]
        km = pa.array(keep)
        return pa.table({
            id_col: batch[id_col].combine_chunks().filter(km),
            group_col: batch[group_col].combine_chunks().filter(km),
            "bucket": pa.array(bucket[keep], type=pa.int64()),
        })

    return ds.select_columns([id_col, group_col]).map_batches(
        fn, batch_format="pyarrow")
