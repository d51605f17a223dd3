"""Text-analysis operators over a documents Dataset — the "large-scale
training-data pipeline" extensions: token counting, df tables, quality
scoring, language-ID, fingerprinting.

All hot paths are vectorized Arrow (`pyarrow.compute` split/flatten/
parent-indices kernels + numpy bincount) — no per-row Python in the
token-counting/df paths. Input shape: the driver's ``documents`` table
(``doc_id:int64, text:string, lang:string, source:string, n_chars:int64``).
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Sum

# fixed stopword list shared with the SQL oracles
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")

# BPE-ish pretokenizer: letter runs, digit runs, punctuation runs.
# RE2- and re-compatible (no backrefs/lookaround) so the DuckDB oracle can
# run the identical pattern.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def _tokens(batch: pa.Table):
    """(n_tokens int64 array, flat tokens, parent doc indices) — zero-copy.

    Arrow's ``utf8_split_whitespace`` returns ``['']`` (length 1) for
    blank/whitespace-only text; the reference breaker
    (``inverted_index.py:33``, ``''.strip().split() == []``) and the SQL
    oracles treat blank docs as 0 tokens, so mask those rows out here.
    """
    # null text ≡ blank (SQL's trim(NULL) <> '' filters it the same
    # way); without the fill, list_value_length(null) poisons offsets
    trimmed = pc.utf8_trim_whitespace(
        pc.fill_null(batch["text"], ""))
    toks = pc.utf8_split_whitespace(trimmed)
    n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    empty = pc.equal(trimmed, "")
    if pc.any(empty).as_py():
        n_tok = pc.if_else(empty, pa.scalar(0, pa.int64()), n_tok)
        # only blank docs yield '' tokens (runs of whitespace are one
        # separator), so this removes exactly their phantom token
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parents = parents.filter(keep)
    return n_tok, flat, parents


def token_counts(ds: Dataset) -> Dataset:
    """(doc_id, n_tokens) — whitespace tokenization, reference breaker
    semantics (``ts_type_filter/inverted_index.py:26-33``)."""

    def fn(batch: pa.Table) -> pa.Table:
        n_tok, _, _ = _tokens(batch)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": n_tok,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_stats_by_lang(ds: Dataset) -> Dataset:
    """(lang, n_docs, total_tokens, avg_tokens, total_chars) — the G2-style
    global aggregates, pre-aggregated per batch implicitly by the small
    groupby after a vectorized count."""

    def fn(batch: pa.Table) -> pa.Table:
        n_tok, _, _ = _tokens(batch)
        return pa.table({
            "lang": batch["lang"],
            "n_tokens": n_tok,
            "n_chars": batch["n_chars"],
        })

    return ds.map_batches(fn, batch_format="pyarrow").groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
        Mean("n_tokens", alias_name="avg_tokens"),
        Sum("n_chars", alias_name="total_chars"),
    )


def term_df_tf(ds: Dataset) -> Dataset:
    """(term, df, tf) over lowercased whitespace tokens: df = docs
    containing the term (set semantics, ``inverted_index.py:61``), tf =
    total occurrences. Partial aggregation per batch before the groupby
    shuffle (SURVEY.md G1/G3)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64()),
                             "tf": pa.array([], type=pa.int64())})
        flat = pc.utf8_lower(flat)
        # encode terms to ints within the batch for a vectorized 2-key count
        enc = pc.dictionary_encode(flat)
        codes = enc.combine_chunks().indices.to_numpy(zero_copy_only=False)
        vocab = enc.combine_chunks().dictionary.to_pylist()
        par = parents.to_numpy(zero_copy_only=False)
        key = par.astype(np.int64) * len(vocab) + codes
        uniq, counts = np.unique(key, return_counts=True)
        term_idx = (uniq % len(vocab)).astype(np.int64)
        # per-batch partial: tf summed, df = distinct docs per term
        tf = np.bincount(term_idx, weights=counts, minlength=len(vocab))
        df = np.bincount(term_idx, minlength=len(vocab))
        return pa.table({
            "term": pa.array(vocab, type=pa.string()),
            "df": pa.array(df, type=pa.int64()),
            "tf": pa.array(tf.astype(np.int64), type=pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"), Sum("tf", alias_name="tf")))


def top_terms(ds: Dataset, k: int = 25) -> Dataset:
    """Top-k terms by (df desc, term asc) — the reference's word-frequency
    table (``inverted_index.py:148-153``) with the tie made deterministic."""
    return term_df_tf(ds).sort(["df", "term"], descending=[True, False]).limit(k)


def df_histogram(ds: Dataset) -> Dataset:
    """(df, n_terms) — the document-frequency distribution of the
    vocabulary (the Zipf curve a corpus-health check reads: how many
    terms appear in exactly N docs). Rides the :func:`term_df_tf`
    partial-aggregate shuffle, then collapses the vocabulary-sized
    table to O(distinct df values) rows with one more tiny groupby —
    nothing new materializes."""
    return (term_df_tf(ds)
            .groupby("df")
            .aggregate(Count(alias_name="n_terms")))


def top_terms_by_lang(ds: Dataset, k: int = 5) -> Dataset:
    """Grouped top-k: per language, the k terms with highest df
    (tie-break term asc) — (lang, rank, term, df). Same combiner shape
    as :func:`term_df_tf` with ``lang`` joining the key, then one
    vectorized per-lang selection (languages are few; the heavy lifting
    is the per-batch partial aggregation, not the final scan)."""

    def partial(batch: pa.Table) -> pa.Table:
        n_tok, flat, parents = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "term": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        flat = pc.utf8_lower(flat)
        langs = np.asarray(batch["lang"].to_pylist())
        lang_u, lang_codes = np.unique(langs, return_inverse=True)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = enc.dictionary.to_pylist()
        par = parents.to_numpy(zero_copy_only=False)
        # distinct (lang, term, doc) → df partial per (lang, term)
        key = (lang_codes[par].astype(np.int64) * len(vocab) + codes
               ) * len(langs) + par
        uniq = np.unique(key)
        lt = uniq // len(langs)
        lt_u, df = np.unique(lt, return_counts=True)
        return pa.table({
            "lang": pa.array(lang_u[(lt_u // len(vocab))].tolist(),
                             type=pa.string()),
            "term": pa.array([vocab[c] for c in
                              (lt_u % len(vocab)).tolist()],
                             type=pa.string()),
            "df": pa.array(df.astype(np.int64)),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["lang", "term"])
              .aggregate(Sum("df", alias_name="df")))

    def topk(group: pa.Table) -> pa.Table:
        terms = np.asarray(group["term"].to_pylist())
        df = group["df"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -df))[:k]
        n = len(order)
        return pa.table({
            "lang": pa.array([group["lang"][0].as_py()] * n,
                             type=pa.string()),
            "rank": pa.array(np.arange(1, n + 1), type=pa.int64()),
            "term": pa.array(terms[order].tolist(), type=pa.string()),
            "df": pa.array(df[order]),
        })

    return merged.groupby("lang").map_groups(topk, batch_format="pyarrow")


def repetition_scores(ds: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_distinct, max_tf, distinct_ratio,
    max_tf_ratio) — per-document repetition features, the standard
    boilerplate/spam signal in training-data curation (a doc whose most
    frequent token dominates, or whose distinct ratio collapses, is
    machine-generated or degenerate). Entirely per-doc ⇒ one vectorized
    ``map_batches`` pass, NO shuffle: the per-(doc, term) counts come
    from the same fused-key ``np.unique`` trick as :func:`term_df_tf`,
    then per-doc reduceat/bincount. Ratios are one IEEE float64 division
    each, bit-identical to the DuckDB oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        n_tok, flat, parents = _tokens(batch)
        n_docs = batch.num_rows
        n_tok_np = n_tok.to_numpy(zero_copy_only=False)
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        max_tf = np.zeros(n_docs, dtype=np.int64)
        if len(flat) > 0:
            flat = pc.utf8_lower(flat)
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            par = parents.to_numpy(zero_copy_only=False)
            n_vocab = len(enc.dictionary)
            key = par.astype(np.int64) * n_vocab + codes  # doc-major
            uniq, counts = np.unique(key, return_counts=True)
            docidx = (uniq // n_vocab).astype(np.int64)
            n_distinct = np.bincount(docidx, minlength=n_docs).astype(
                np.int64)
            change = np.ones(len(uniq), dtype=bool)
            change[1:] = docidx[1:] != docidx[:-1]
            starts = np.flatnonzero(change)
            max_tf[docidx[starts]] = np.maximum.reduceat(counts, starts)
        safe_n = np.where(n_tok_np > 0, n_tok_np, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok_np, type=pa.int64()),
            "n_distinct": pa.array(n_distinct),
            "max_tf": pa.array(max_tf),
            "distinct_ratio": pa.array(
                np.where(n_tok_np > 0, n_distinct / safe_n, 0.0)),
            "max_tf_ratio": pa.array(
                np.where(n_tok_np > 0, max_tf / safe_n, 0.0)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _explode_term_tf(batch: pa.Table) -> pa.Table:
    """(term, doc_id, tf) rows for one batch — lowercased whitespace
    terms, per-(doc, term) counts via one fused-key ``np.unique``. A
    document is one input row, so these rows are globally final straight
    out of the batch (no (term, doc) merge shuffle needed)."""
    _, flat, parents = _tokens(batch)
    if len(flat) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "doc_id": pa.array([], type=pa.int64()),
                         "tf": pa.array([], type=pa.int64())})
    flat = pc.utf8_lower(flat)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    vocab = enc.dictionary
    par = parents.to_numpy(zero_copy_only=False)
    dids = batch["doc_id"].to_numpy(zero_copy_only=False)
    key = codes.astype(np.int64) * batch.num_rows + par  # term-major
    uniq, tf = np.unique(key, return_counts=True)
    return pa.table({
        "term": vocab.take(pa.array(uniq // batch.num_rows)),
        "doc_id": pa.array(dids[uniq % batch.num_rows], type=pa.int64()),
        "tf": pa.array(tf.astype(np.int64)),
    })


def _term_part_appender(num_parts: int):
    """Batch fn appending a coarse term-hash ``part`` column — every
    occurrence of a term lands in ONE partition, so per-partition term
    aggregates are globally correct. Hashes each UNIQUE term once per
    batch and gathers (the tokenizer's trick)."""

    def add_term_part(batch: pa.Table) -> pa.Table:
        from .dedup import _stable_hash64
        enc = pc.dictionary_encode(batch["term"].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        hv = np.array([_stable_hash64(t) % num_parts
                       for t in enc.dictionary.to_pylist()],
                      dtype=np.int32)
        return batch.append_column("part", pa.array(hv[codes]))

    return add_term_part


def doc_top_terms(ds: Dataset, k: int = 3,
                  num_parts: int | None = None) -> Dataset:
    """Per-document top-k keywords by term specificity — (doc_id, rank,
    term, tf, df, score), score = tf/df (tf·idf with a rational idf so
    both engines IEEE-divide instead of calling a libm ``ln`` whose
    rounding may differ), tie-break (score desc, term asc).

    Distributed tf-idf shape, two O(postings) shuffles and never a
    driver-side vocabulary: (1) per-batch (term, doc_id, tf) partials
    group by term to finalize tf and count df (one groupby); (2) the
    rows re-shuffle on a coarse doc_id partition and a vectorized
    segment scan picks each document's top-k. df is NOT broadcast —
    at 100 TB the vocabulary is itself huge, so it rides the term
    shuffle as a per-term aggregate instead (the same reasoning as the
    index build's bucket spill)."""
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)

    explode = _explode_term_tf
    add_term_part = _term_part_appender(num_parts)

    def attach_df(group: pa.Table) -> pa.Table:
        # rows for one coarse term partition: per-term df by run length
        terms = group["term"].combine_chunks()
        enc = pc.dictionary_encode(terms)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        df = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            "doc_id": group["doc_id"],
            "term": terms,
            "tf": group["tf"],
            "df": pa.array(df[codes].astype(np.int64)),
        })

    def topk_per_doc(group: pa.Table) -> pa.Table:
        dids = group["doc_id"].to_numpy(zero_copy_only=False)
        tf = group["tf"].to_numpy(zero_copy_only=False)
        df = group["df"].to_numpy(zero_copy_only=False)
        terms = group["term"].combine_chunks()
        # lexicographic tie-break WITHOUT materializing Python strings:
        # rank each unique term once via Arrow's sort, gather per row
        enc = pc.dictionary_encode(terms)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        sort_idx = pc.array_sort_indices(enc.dictionary).to_numpy(
            zero_copy_only=False)
        lexrank = np.empty(len(enc.dictionary), dtype=np.int64)
        lexrank[sort_idx] = np.arange(len(enc.dictionary))
        score = tf.astype(np.float64) / df.astype(np.float64)
        order = np.lexsort((lexrank[codes], -score, dids))
        dids, tf, df, score = (dids[order], tf[order], df[order],
                               score[order])
        change = np.ones(len(dids), dtype=bool)
        change[1:] = dids[1:] != dids[:-1]
        rank = np.arange(len(dids)) - np.maximum.accumulate(
            np.where(change, np.arange(len(dids)), 0)) + 1
        keep = rank <= k
        keep_idx = pa.array(order[keep])
        return pa.table({
            "doc_id": pa.array(dids[keep], type=pa.int64()),
            "rank": pa.array(rank[keep], type=pa.int64()),
            "term": terms.take(keep_idx),
            "tf": pa.array(tf[keep], type=pa.int64()),
            "df": pa.array(df[keep], type=pa.int64()),
            "score": pa.array(score[keep], type=pa.float64()),
        })

    # a document is one input row, so its (term, doc_id, tf) rows are
    # final straight out of the batch — no (term, doc) merge shuffle
    rows = ds.map_batches(explode, batch_format="pyarrow")
    with_df = (rows.map_batches(add_term_part, batch_format="pyarrow")
               .groupby("part")
               .map_groups(attach_df, batch_format="pyarrow"))
    return (with_df
            .map_batches(lambda b: b.append_column(
                "part", pc.cast(pc.bit_wise_and(b["doc_id"], num_parts - 1),
                                pa.int32())), batch_format="pyarrow")
            .groupby("part")
            .map_groups(topk_per_doc, batch_format="pyarrow"))


def filter_by_token_quantile(ds: Dataset, lo: float = 0.1,
                             hi: float = 0.9) -> Dataset:
    """(doc_id, n_tokens) of documents whose token count lies within the
    corpus's [lo, hi] length quantiles — the standard "drop the shortest
    and longest tails" curation filter, with the cutoffs computed
    EXACTLY and distributed (``percentile_disc`` semantics, 1-based
    index ⌈p·n⌉): pass 1 reduces per-batch length histograms through one
    small groupby (shuffle O(distinct lengths), never O(rows)) and the
    driver scans the tiny merged histogram for the two cutoffs; pass 2
    re-reads and filters. Two corpus reads, zero full-data shuffles, no
    quantile sketch approximation."""

    def partial(batch: pa.Table) -> pa.Table:
        n_tok, _, _ = _tokens(batch)
        uniq, n = np.unique(n_tok.to_numpy(zero_copy_only=False),
                            return_counts=True)
        return pa.table({"n_tokens": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("n_tokens").aggregate(Sum("n", alias_name="n"))
            .take_all())  # ≤ distinct-lengths rows — small by contract
    hist.sort(key=lambda r: r["n_tokens"])
    lens = np.array([r["n_tokens"] for r in hist], dtype=np.int64)
    cum = np.cumsum([r["n"] for r in hist])
    total = int(cum[-1])
    lo_cut = int(lens[np.searchsorted(cum, max(1, int(np.ceil(lo * total))),
                                      side="left")])
    hi_cut = int(lens[np.searchsorted(cum, max(1, int(np.ceil(hi * total))),
                                      side="left")])

    def keep(batch: pa.Table) -> pa.Table:
        n_tok, _, _ = _tokens(batch)
        n = n_tok.to_numpy(zero_copy_only=False)
        mask = pa.array((n >= lo_cut) & (n <= hi_cut))
        return pa.table({
            "doc_id": batch["doc_id"].filter(mask),
            "n_tokens": pa.array(n[(n >= lo_cut) & (n <= hi_cut)],
                                 type=pa.int64()),
        })

    return ds.map_batches(keep, batch_format="pyarrow")


def commonness_scores(ds: Dataset,
                      num_parts: int | None = None) -> Dataset:
    """(doc_id, sum_tfg, n_tokens, commonness) for every non-blank doc —
    a unigram-LM commonness score with EXACT cross-engine arithmetic:
    sum_tfg = Σ over token occurrences of the token's GLOBAL corpus
    frequency (all-integer, order-free), and
    commonness = sum_tfg / (n_tokens · total_tokens) — the mean corpus
    probability of the doc's tokens, ONE IEEE division at the end (a
    log-perplexity variant would call libm ``ln`` whose rounding differs
    across engines). Low commonness ⇒ rare/garbled text; high ⇒
    boilerplate — the cheap LM-quality signal of curation pipelines.

    Distributed shape: (term, doc_id, tf) explode → coarse term-hash
    groupby attaches each term's global tf (vocabulary never leaves the
    cluster, same reasoning as :func:`doc_top_terms`) → per-doc integer
    Sum. ``total_tokens`` is one tiny column-pruned aggregate pass."""
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)
    total = int(token_counts(ds).sum("n_tokens"))

    def attach_tfg(group: pa.Table) -> pa.Table:
        # one coarse term partition: per-term global tf by segment sum
        terms = group["term"].combine_chunks()
        enc = pc.dictionary_encode(terms)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        tf = group["tf"].to_numpy(zero_copy_only=False)
        tfg = np.bincount(codes, weights=tf,
                          minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({
            "doc_id": group["doc_id"],
            "wsum": pa.array(tf * tfg[codes]),
            "n": pa.array(tf),
        })

    agg = (ds.map_batches(_explode_term_tf, batch_format="pyarrow")
           .map_batches(_term_part_appender(num_parts),
                        batch_format="pyarrow")
           .groupby("part")
           .map_groups(attach_tfg, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("wsum", alias_name="sum_tfg"),
                      Sum("n", alias_name="n_tokens")))

    def score(batch: pa.Table) -> pa.Table:
        s = batch["sum_tfg"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        # float64 product, NOT int64: n*total overflows int64 once the
        # corpus passes ~2^63 token-pairs (n ~1e6 doc tokens x total
        # ~2e13 corpus tokens at 100 TB); for operands < 2^53 the
        # correctly-rounded float product equals float(int product), so
        # the oracle (same ::DOUBLE * ::DOUBLE shape) stays bit-exact.
        # (The int64 NUMERATOR sum_tfg caps the operator at ~9e18
        # weighted pairs — documented contract, DuckDB errors likewise.)
        return batch.append_column(
            "commonness",
            pa.array(s / (n.astype(np.float64) * np.float64(total))))

    return agg.map_batches(score, batch_format="pyarrow")


def quality_scores(ds: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_stopwords, stopword_ratio, mean_token_len) —
    simple quality-scoring features, fully vectorized."""

    def fn(batch: pa.Table) -> pa.Table:
        n_tok_arr, flat, parents = _tokens(batch)
        n = batch.num_rows
        n_tok = n_tok_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        par = parents.to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(pc.utf8_lower(flat),
                           value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(par, weights=is_stop, minlength=n).astype(np.int64)
        len_sum = np.bincount(par, weights=tok_len, minlength=n).astype(np.int64)
        safe = np.maximum(n_tok, 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_stopwords": pa.array(n_stop),
            "stopword_ratio": pa.array(n_stop / safe, type=pa.float64()),
            "mean_token_len": pa.array(len_sum / safe, type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def unigram_entropy(ds: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_distinct, entropy) — Shannon entropy (nats)
    of each document's unigram distribution, the information-density
    quality signal (degenerate/spam docs collapse toward 0):
    ``H = ln(n) - (Σ c·ln c) / n`` over per-doc lowercased token counts.

    The Σ is a strict left fold over terms in ascending term order
    (byte order), so the float is bit-identical to the SQL oracle's
    ``list_aggregate(list(c*ln(c) order by term), 'sum')`` — the LM
    family's ordered-fold convention. One shuffle-free vectorized pass;
    blank docs report 0.0."""

    def fn(batch: pa.Table) -> pa.Table:
        n_tok_arr, flat, parents = _tokens(batch)
        n_docs = batch.num_rows
        n_tok = n_tok_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        entropy = np.zeros(n_docs, dtype=np.float64)
        if len(flat) > 0:
            enc = pc.dictionary_encode(pc.utf8_lower(flat))
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dic = enc.dictionary
            v = len(dic)
            sorted_pos = pc.sort_indices(dic).to_numpy(
                zero_copy_only=False).astype(np.int64)
            rank = np.empty(v, dtype=np.int64)
            rank[sorted_pos] = np.arange(v, dtype=np.int64)
            par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, counts = np.unique(par * v + rank[codes],
                                     return_counts=True)
            docidx = (uniq // v).astype(np.int64)
            n_distinct = np.bincount(docidx, minlength=n_docs) \
                .astype(np.int64)
            # scalar-libm logs on the distinct ints — numpy's SIMD log
            # is not bit-identical to DuckDB's ln (the lm.py gotcha)
            from .lm import _log_int
            contrib = counts.astype(np.float64) * _log_int(counts)
            log_n = _log_int(n_tok[docidx])
            bounds = np.flatnonzero(docidx[1:] != docidx[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(docidx)]))
            for s, e in zip(starts, ends):
                d = docidx[s]
                # strict left fold == DuckDB list sum-in-list-order
                total = np.add.accumulate(contrib[s:e])[-1]
                entropy[d] = log_n[s] - total / float(n_tok[d])
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_distinct": pa.array(n_distinct),
            "entropy": pa.array(entropy, type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def bpe_token_counts(ds: Dataset) -> Dataset:
    """(doc_id, n_bpe_tokens) under the BPE-ish regex pretokenizer — the
    M12 token-counting analog without tiktoken (unavailable offline)."""

    def fn(batch: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(batch["text"], BPE_PATTERN)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pc.cast(counts, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprints(ds: Dataset) -> Dataset:
    """(doc_id, fp) — md5 of the whitespace-normalized lowercased text, a
    cheap canonical document fingerprint."""
    ws = re.compile(r"\s+")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        fps = [hashlib.md5(ws.sub(" ", t.strip()).lower().encode("utf-8")).hexdigest()
               for t in texts]
        return pa.table({"doc_id": batch["doc_id"],
                         "fp": pa.array(fps, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def _md5_modp_unique(vocab) -> np.ndarray:
    """md5_number_lower(token) mod (2^61-1) for a batch's UNIQUE tokens
    (an Arrow string array or list) — one vectorized single-block md5
    pass (``text/hashvec.py``), no per-token Python."""
    from ..text.hashvec import md5_lower64_strings
    P = np.uint64((1 << 61) - 1)
    return md5_lower64_strings(vocab) % P


def _window_hashes(hs: np.ndarray, window: int) -> np.ndarray:
    """Polynomial rolling hashes of all ``min(window, len)``-token
    windows: acc_i = Σ_j h_{i+j}·B^{w-1-j} mod (2^61-1), computed as w
    vectorized modular passes over the doc's token-hash array."""
    from .dedup import _mulmod_mersenne61
    B = 1000003
    P = (1 << 61) - 1
    w = min(window, len(hs))
    n_win = len(hs) - w + 1
    acc = np.zeros(n_win, dtype=np.uint64)
    power = 1
    # exponent w-1-j grows as j falls
    for j in range(w - 1, -1, -1):
        acc += _mulmod_mersenne61(np.uint64(power), hs[j:j + n_win])
        acc = (acc & np.uint64(P)) + (acc >> np.uint64(61))
        power = (power * B) % P
    return np.where(acc >= P, acc - np.uint64(P), acc)


def winnow_fingerprint_sets(ds: Dataset, window: int = 16,
                            guarantee: int = 4) -> Dataset:
    """(doc_id, fp64) exploded — the full winnowing fingerprint SET of
    each non-blank document (Schleimer et al., "Winnowing: Local
    Algorithms for Document Fingerprinting", SIGMOD 2003 — public
    algorithm): over the doc's rolling ``window``-token hashes, the
    distinct minima of every ``guarantee``-length window of consecutive
    hashes. Any shared token run of length ≥ window+guarantee-1 between
    two docs is GUARANTEED to share a fingerprint — the local-match
    detection property a plagiarism/near-dup index needs, where
    :func:`rolling_fingerprints`'s single global min only supports
    whole-doc comparison. Same exact mod-(2^61-1) arithmetic as
    rolling_fingerprints ⇒ SQL-oracle value-exact. Output is ≈
    tokens/guarantee rows per doc (the winnowing density bound 2/(g+1)
    keeps the explosion bounded); docs shorter than one window emit
    their single whole-prefix hash."""

    def fn(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        dids_out, fps_out = [], []
        if len(flat):
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            hs_all = _md5_modp_unique(enc.dictionary)[codes]
            par = parents.to_numpy(zero_copy_only=False)
            dids = batch["doc_id"].to_numpy(zero_copy_only=False)
            doc_starts = np.flatnonzero(np.diff(par, prepend=-1))
            doc_ends = np.append(doc_starts[1:], len(par))
            for s, e in zip(doc_starts.tolist(), doc_ends.tolist()):
                acc = _window_hashes(hs_all[s:e], window)
                g = min(guarantee, len(acc))
                mins = np.lib.stride_tricks.sliding_window_view(
                    acc, g).min(axis=1)
                fps = np.unique(mins)
                dids_out.append(np.full(len(fps), dids[par[s]],
                                        dtype=np.int64))
                fps_out.append(fps)
        if not dids_out:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "fp64": pa.array([], type=pa.uint64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(dids_out)),
            "fp64": pa.array(np.concatenate(fps_out), type=pa.uint64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def rolling_fingerprints(ds: Dataset, window: int = 16) -> Dataset:
    """(doc_id, fp64) — polynomial rolling-hash fingerprint: min of the
    rolling hashes of token windows (a winnowing-style document sketch).

    Window hash of tokens t_i..t_{i+w-1} is
    ``Σ_j h(t_{i+j})·B^{w-1-j} mod (2^61-1)`` with the md5-based token
    hash shared with DuckDB (``md5_number_lower``) — exact modular
    arithmetic on both sides, so the SQL oracle value-checks this.

    Tokens are hashed once per batch-unique token (process-level cache,
    :func:`_md5_modp_unique`); only the per-doc window fold — w ≤ 16
    vectorized passes — remains per-document work."""
    from .dedup import _mulmod_mersenne61
    B = 1000003
    P = (1 << 61) - 1

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = np.zeros(n, dtype=np.uint64)
        _, flat, parents = _tokens(batch)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            hs_all = _md5_modp_unique(enc.dictionary)[codes]
            par = parents.to_numpy(zero_copy_only=False)
            doc_starts = np.flatnonzero(np.diff(par, prepend=-1))
            doc_ends = np.append(doc_starts[1:], len(par))
            for s, e in zip(doc_starts.tolist(), doc_ends.tolist()):
                acc = _window_hashes(hs_all[s:e], window)
                out[par[s]] = acc.min()
        return pa.table({"doc_id": batch["doc_id"],
                         "fp64": pa.array(out, type=pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow")


_FENCE_RE = re.compile(r"^\s*```(?:json)?\s*\n?(.*?)\n?\s*```\s*$",
                       re.DOTALL)


def extract_fenced_json(text: str):
    """Strip an optional ```` ```json ```` fence and parse — the
    reference's extract stage (``samples/menu/menu.py:274-284``, M11)."""
    import json as _json
    m = _FENCE_RE.match(text)
    return _json.loads(m.group(1) if m else text)


# -- language ID (n-gram/stopword heuristic) ----------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por", "con"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
}


class LangIdStage:
    """Actor-pool language-ID stage: marker value-sets built once per
    actor (``__init__``), per batch one vectorized ``pc.is_in`` per
    language over the flattened lowercased tokens + a ``bincount`` per
    doc — no per-token Python (r2's loop was the slowest per-byte
    heuristic stage).

    Heuristic: argmax over per-language marker hits, ties to the
    alphabetically-first language (``np.argmax`` first-max ≡ the old
    strictly-greater loop over sorted langs); ``und`` when no marker
    hits. Value-checked against a marker-count SQL oracle.
    """

    def __init__(self):
        self._langs = sorted(_LANG_MARKERS)
        self._value_sets = [pa.array(sorted(_LANG_MARKERS[lang]))
                            for lang in self._langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_tok_arr, flat, parents = _tokens(batch)
        n_tok = n_tok_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        flat_l = pc.utf8_lower(flat)
        par = parents.to_numpy(zero_copy_only=False)
        hits = np.zeros((n, len(self._langs)), dtype=np.int64)
        if len(flat_l):
            for li, vs in enumerate(self._value_sets):
                mask = pc.is_in(flat_l, value_set=vs).to_numpy(
                    zero_copy_only=False)
                hits[:, li] = np.bincount(par, weights=mask, minlength=n)
        best = hits.max(axis=1)
        arg = hits.argmax(axis=1)
        langs = np.asarray(self._langs)
        preds = np.where(best > 0, langs[arg], "und")
        confs = best / np.maximum(n_tok, 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds.tolist(), type=pa.string()),
            "confidence": pa.array(confs, type=pa.float64()),
        })


def language_id(ds: Dataset, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          concurrency=concurrency)


def top_vocabulary(ds: Dataset, v: int) -> list[str]:
    """The *v* most frequent lowercase tokens of the corpus (total
    occurrences; tie (count desc, term asc)) — per-batch PARTIAL counts
    (dictionary-encode + bincount, no per-token Python) pre-aggregate
    before the vocabulary-sized ``groupby(term).sum`` shuffle; the
    distributed ``sort().limit(v)`` brings only v rows to the driver
    (never the vocabulary)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        enc = pc.dictionary_encode(pc.utf8_lower(flat))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary,
                         "c": pa.array(cnt.astype(np.int64))})

    top = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("c", alias_name="c"))
             .sort(["c", "term"], descending=[True, False])
             .limit(v)
             .take_all())  # bounded: exactly v rows
    return [r["term"] for r in top]


def oov_rate(ds: Dataset, top_v: int = 16) -> Dataset:
    """(doc_id, n_tokens, n_oov, oov_ratio) — fraction of each doc's
    tokens OUTSIDE the corpus's top-``top_v`` vocabulary (the
    out-of-vocabulary rate quality signal: high OOV ⇒ garbled /
    non-natural text relative to the corpus's dominant register).
    The reference vocabulary is broadcast as a tiny set (v terms);
    oov_ratio is ONE IEEE division of two exact integers, so the score
    is value-exact across engines (same contract as
    :func:`commonness_scores` — no libm in the hot formula)."""
    vocab = set(top_vocabulary(ds, top_v))
    vocab_arr = pa.array(sorted(vocab), type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        n_tok_arr, flat, parents = _tokens(batch)
        n = batch.num_rows
        n_tok = n_tok_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat):
            in_v = pc.is_in(pc.utf8_lower(flat), value_set=vocab_arr)
            par = parents.to_numpy(zero_copy_only=False)
            oov = ~in_v.to_numpy(zero_copy_only=False)
            n_oov = np.bincount(par, weights=oov,
                                minlength=n).astype(np.int64)
        else:
            n_oov = np.zeros(n, dtype=np.int64)
        safe = np.maximum(n_tok, 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_oov": pa.array(n_oov),
            "oov_ratio": pa.array(n_oov / safe, type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def hashed_features(ds: Dataset, dim_bits: int = 18) -> Dataset:
    """(doc_id, feature_idx, tf) — sparse hashed bag-of-words features,
    the Weinberger et al. (ICML'09) hashing trick: every lowercased
    token maps to ``md5_64(token) mod 2^dim_bits``, colliding terms'
    counts merge. The fixed-dimension featurizer in front of linear
    models / embeddings-from-scratch at 100 TB: a pure per-batch
    map (NO shuffle — each doc's features are emitted where its text
    lives), vocabulary never materializes anywhere.

    md5-based hashing is the dedup family's oracle-shared convention
    (≡ DuckDB ``md5_number_lower % dim``), so the feature indices
    themselves are SQL-checkable — integer-only output, value-exact
    gate. Blank docs emit no rows (inner semantics)."""
    from ..text.hashvec import md5_lower64_strings
    dim = np.uint64(1 << dim_bits)

    def fn(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        flat = pc.utf8_lower(flat)
        if len(flat) == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "feature_idx": z, "tf": z})
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        fidx_u = (md5_lower64_strings(enc.dictionary) % dim).astype(np.int64)
        fidx = fidx_u[codes]
        par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((fidx, par))
        f_s, p_s = fidx[order], par[order]
        new = np.ones(len(f_s), dtype=bool)
        new[1:] = (f_s[1:] != f_s[:-1]) | (p_s[1:] != p_s[:-1])
        seg = np.cumsum(new) - 1
        tf = np.bincount(seg).astype(np.int64)
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(dids[p_s[new]], type=pa.int64()),
            "feature_idx": pa.array(f_s[new]),
            "tf": pa.array(tf),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def hashed_weights(dim_bits: int, seed: str = "w1") -> np.ndarray:
    """Deterministic integer weight vector for the linear classifier:
    ``w_j = (md5_64(f"{seed}:{j}") % 17) - 8`` — small signed integers
    so the per-doc dot product is ALL-INTEGER (order-free, value-exact
    vs the same md5 formula in SQL). An honest stand-in for trained
    fastText-style weights (no model ships in this sandbox); swapping
    in a real weight table changes nothing about the plumbing."""
    from ..text.hashvec import md5_lower64_strings
    idx = pc.cast(pa.array(np.arange(1 << dim_bits, dtype=np.int64)),
                  pa.string())
    keys = pc.binary_join_element_wise(
        pa.scalar(f"{seed}:"), idx, pa.scalar(""))
    h = md5_lower64_strings(keys)
    return (h % np.uint64(17)).astype(np.int64) - 8


class _ClassifierStage:
    """Actor-pool scorer: the 2^dim_bits weight vector is built once per
    actor in ``__init__``, batches are scored fully vectorized."""

    def __init__(self, dim_bits: int, seed: str, scale: int):
        self.dim = np.uint64(1 << dim_bits)
        self.scale = float(scale)
        self.w = hashed_weights(dim_bits, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..text.hashvec import md5_lower64_strings
        n_tok_arr, flat, parents = _tokens(batch)
        n = batch.num_rows
        n_tok = n_tok_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            tokw = np.zeros(0, dtype=np.int64)
            par = np.zeros(0, dtype=np.int64)
        else:
            low = pc.utf8_lower(flat)
            enc = pc.dictionary_encode(low)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            fidx = (md5_lower64_strings(enc.dictionary)
                    % self.dim).astype(np.int64)
            tokw = self.w[fidx][codes]
            par = parents.to_numpy(zero_copy_only=False)
        # int64 dot via float64 bincount — exact below 2^53 (same
        # contract as commonness_scores; a doc would need ~10^15
        # weighted tokens to break it)
        dot = np.bincount(par, weights=tokw,
                          minlength=n).astype(np.int64)
        keep = n_tok > 0
        z = dot[keep] / self.scale  # scale is a power of two: exact
        # libm exp via math.exp (numpy's SIMD exp is NOT bit-identical
        # to DuckDB's std::exp); O(docs) python ops, not O(tokens).
        # math.exp raises OverflowError where C's exp returns +inf
        # (|arg| > ~709.78) — map that back to inf so extreme negative
        # dots score 0.0 exactly like the SQL oracle instead of
        # crashing the actor.
        def _sig(x: float) -> float:
            try:
                e = math.exp(-x)
            except OverflowError:
                e = math.inf
            return 1.0 / (1.0 + e)

        score = np.array([_sig(x) for x in z.tolist()], dtype=np.float64)
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "doc_id": pa.array(dids, type=pa.int64()),
            "n_tokens": pa.array(n_tok[keep]),
            "dot": pa.array(dot[keep]),
            "score": pa.array(score),
        })


def classifier_scores(ds: Dataset, dim_bits: int = 18, seed: str = "w1",
                      scale: int = 64, concurrency=(1, 4)) -> Dataset:
    """(doc_id, n_tokens, dot, score) — fastText-style linear quality
    classifier over hashed bag-of-words features (the standard
    model-based filter of LLM curation stacks, e.g. the GPT-3/LLaMA
    CommonCrawl quality classifiers): ``score = sigmoid((Σ_occurrences
    w[md5_64(token) % 2^dim_bits]) / scale)``.

    Weights are the deterministic :func:`hashed_weights` stand-in
    (documented there); they are built ONCE PER ACTOR — the broadcast-
    small-side pattern: at 2^18 dims the table is 2 MB, shipped via the
    actor class, never per batch. Value-exact: integer dot product +
    one exact power-of-two division + libm sigmoid, mirrored in SQL.
    Blank docs emit no row (no features ⇒ no classification)."""
    return ds.map_batches(
        _ClassifierStage, batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"dim_bits": dim_bits, "seed": seed,
                               "scale": scale})


# ---------------------------------------------------------------------------
# Corpus-law fits — Zipf (rank-frequency) and Heaps (vocabulary growth).
# Both are least-squares lines in log-log space whose inputs are INTEGER
# ranks/counts, so with the ordered-fold sum convention the float slope
# and intercept themselves cross the value-exact gate: every ln argument
# is an integer (libm both sides), the four regression sums are strict
# ascending left folds, and the closing slope/intercept expressions use
# identical float64 shapes to the SQL mirror.
# ---------------------------------------------------------------------------


def _loglog_fit(x_int: np.ndarray, y_int: np.ndarray
                ) -> tuple[float, float]:
    """(slope, intercept) of the least-squares line through
    (ln x_i, ln y_i), folded in the given order. Shapes mirror the SQL:
    sums via strict left folds, then
    slope = (n*sxy - sx*sy) / (n*sxx - sx*sx),
    intercept = (sy - slope*sx) / n."""
    if len(x_int) < 2:
        raise ValueError("log-log fit needs at least 2 points")
    x = np.array([math.log(int(v)) for v in x_int], dtype=np.float64)
    y = np.array([math.log(int(v)) for v in y_int], dtype=np.float64)
    n = len(x)
    sx = np.add.accumulate(x)[-1]
    sy = np.add.accumulate(y)[-1]
    sxx = np.add.accumulate(x * x)[-1]
    sxy = np.add.accumulate(x * y)[-1]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return float(slope), float(intercept)


def zipf_fit(ds: Dataset, top_n: int = 1000) -> pa.Table:
    """One-row table ``(n_terms, slope, intercept)``: the log-log
    least-squares fit of total term frequency against frequency rank
    over the *top_n* most frequent terms — Zipf's law says slope ≈ -1;
    a corpus whose slope drifts far from it is boilerplate-heavy (too
    flat) or degenerate (too steep). Ranking is (tf desc, term asc),
    rank r = 1.. — both ints, so every ln argument is an integer.

    Scale: rides the :func:`term_df_tf` partial-aggregate shuffle; only
    the sort's top_n rows (bounded by contract) reach the driver."""
    ranked = (term_df_tf(ds)
              .sort(["tf", "term"], descending=[True, False])
              .limit(top_n)
              .take_all())                       # <= top_n rows
    tf = np.array([r["tf"] for r in ranked], dtype=np.int64)
    ranks = np.arange(1, len(tf) + 1, dtype=np.int64)
    slope, intercept = _loglog_fit(ranks, tf)
    return pa.table({
        "n_terms": pa.array([len(tf)], type=pa.int64()),
        "slope": pa.array([slope], type=pa.float64()),
        "intercept": pa.array([intercept], type=pa.float64()),
    })


def vocab_growth(ds: Dataset, checkpoints: list[int],
                 num_parts: int = 64) -> pa.Table:
    """``(n_docs, vocab)`` — EXACT distinct-vocabulary size among
    documents with ``doc_id <= c`` for each checkpoint, ALL checkpoints
    from ONE corpus pass: a term first "appears" at its minimum doc_id,
    so per-batch (term, min doc_id) partials -> one coarse term-hash
    exchange keeping the global min per term (grouped by STRING inside
    the partition; hashes only route) -> a histogram of first-
    appearance ids over the checkpoint grid -> cumulative sum. Driver
    state is O(checkpoints); the shuffle ships batch-unique terms."""
    cps = sorted(set(int(c) for c in checkpoints))
    if not cps:
        raise ValueError("need at least one checkpoint")

    def partials(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "first": pa.array([], type=pa.int64()),
                             "tpart": pa.array([], type=pa.int32())})
        flat = pc.utf8_lower(flat)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        par = parents.to_numpy(zero_copy_only=False)
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        first = np.full(len(enc.dictionary), np.iinfo(np.int64).max,
                        dtype=np.int64)
        np.minimum.at(first, codes, dids[par])
        from ..text.hashvec import md5_lower64_strings
        h = md5_lower64_strings(enc.dictionary)
        return pa.table({
            "term": enc.dictionary,
            "first": pa.array(first),
            "tpart": pa.array((h % num_parts).astype(np.int32)),
        })

    def keep_min(group: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(group["term"].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        first = group["first"].to_numpy(zero_copy_only=False)
        gmin = np.full(len(enc.dictionary), np.iinfo(np.int64).max,
                       dtype=np.int64)
        np.minimum.at(gmin, codes, first)
        # histogram of first appearances over the checkpoint grid:
        # index i counts terms first seen in (cps[i-1], cps[i]]
        edges = np.searchsorted(np.array(cps, dtype=np.int64), gmin,
                                side="left")
        cnt = np.bincount(edges, minlength=len(cps) + 1)[:len(cps)]
        return pa.table({
            "ci": pa.array(np.arange(len(cps), dtype=np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    from ray.data.aggregate import Sum as _Sum
    rows = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("tpart")
            .map_groups(keep_min, batch_format="pyarrow")
            .groupby("ci")
            .aggregate(_Sum("n", alias_name="n"))
            .take_all())                        # <= len(cps) rows
    per_bucket = np.zeros(len(cps), dtype=np.int64)
    for r in rows:
        per_bucket[r["ci"]] = r["n"]
    vocab = np.cumsum(per_bucket)
    return pa.table({
        "n_docs": pa.array(cps, type=pa.int64()),
        "vocab": pa.array(vocab, type=pa.int64()),
    })


def heaps_fit(ds: Dataset, checkpoints: list[int],
              num_parts: int = 64) -> pa.Table:
    """One-row table ``(n_points, slope, intercept)``: Heaps' law
    V(N) ~ K * N^beta fitted log-log over :func:`vocab_growth`
    checkpoints (slope = beta, typically 0.4-0.6 for natural text;
    exp(intercept) = K). Same integer-log + ordered-fold contract as
    :func:`zipf_fit` — checkpoints are doc-id cutoffs, vocab sizes are
    exact ints, so the float fit crosses the value-exact gate."""
    growth = vocab_growth(ds, checkpoints, num_parts=num_parts)
    n_docs = growth["n_docs"].to_numpy(zero_copy_only=False)
    vocab = growth["vocab"].to_numpy(zero_copy_only=False)
    # both lns need positive integer arguments
    keep = (vocab > 0) & (n_docs >= 1)
    slope, intercept = _loglog_fit(n_docs[keep], vocab[keep])
    return pa.table({
        "n_points": pa.array([int(keep.sum())], type=pa.int64()),
        "slope": pa.array([slope], type=pa.float64()),
        "intercept": pa.array([intercept], type=pa.float64()),
    })


def phrase_counts(ds: Dataset,
                  phrases: tuple[str, ...]) -> Dataset:
    """Multi-phrase dictionary counting — per (doc_id, phrase)
    NON-OVERLAPPING substring occurrence counts, rows only where the
    count is positive (the dictionary-tagging / brand-safety scan
    shape). One vectorized ``pc.count_substring`` sweep per phrase per
    batch, phrases closure-captured (dozens of patterns → the sweep is
    the right shape; 10^5+ patterns want an Aho-Corasick automaton
    actor doing a single pass per character — the documented scale
    path, same broadcast-compiled-state plumbing as percolate's rule
    engine). Non-overlap semantics match both Arrow's kernel and the
    SQL ``(len - len(replace))/len`` mirror — verified on the
    'aaa' / 'aa' → 1 case."""
    if not phrases:
        raise ValueError("phrase_counts needs at least one phrase")
    if any(not p for p in phrases):
        raise ValueError("empty phrase is not countable")
    phrase_list = list(phrases)

    def sweep(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"]
        text = batch["text"]
        ids, phs, ns = [], [], []
        for p in phrase_list:
            n = pc.count_substring(text, p)
            mask = pc.greater(n, 0)
            sub = doc.filter(mask)
            ids.append(sub.to_numpy(zero_copy_only=False))
            ns.append(n.filter(mask).to_numpy(zero_copy_only=False)
                      .astype(np.int64))
            phs.extend([p] * len(sub))
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids)
                               if ids else np.zeros(0, np.int64),
                               type=pa.int64()),
            "phrase": pa.array(phs, type=pa.string()),
            "n": pa.array(np.concatenate(ns)
                          if ns else np.zeros(0, np.int64)),
        })

    return ds.map_batches(sweep, batch_format="pyarrow")


def phrase_counts_sql(phrases: tuple[str, ...]) -> str:
    """DuckDB mirror of :func:`phrase_counts` (non-overlapping counts
    via the replace-length identity), one union branch per phrase."""
    branches = []
    for p in phrases:
        esc = p.replace("'", "''")
        branches.append(f"""
        select doc_id, '{esc}' as phrase,
               ((length(text) - length(replace(text, '{esc}', '')))
                   // length('{esc}'))::BIGINT as n
        from documents
        where length(text) - length(replace(text, '{esc}', '')) > 0""")
    return "\nunion all\n".join(branches)
