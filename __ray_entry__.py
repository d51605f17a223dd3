"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25 query
set) on sf0.001. ``queries()``/``oracle_sql()`` expose one entry per
implemented operator family from SURVEY.md §2 plus the training-data
extensions; SQL-expressible ones are checked value-exactly against DuckDB,
stemmed/approximate ones get the rows-only check (full fidelity for those
is covered by the pytest oracle suite, tests/test_engine_build_query.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10
NEAR_DUP_THRESHOLD = 0.35
NGRAM_JACCARD_T = 0.5
TOP_TERMS_K = 25
DUP_SPAN_K = 3
TF_COSINE_T = 0.8
# sf documents draw from a ~31-term vocabulary (every term is
# stopword-like), so a binding df cap empties the result — gate the
# uncapped exactness contract; pytest covers the cap semantics
TF_COSINE_MAX_DF = None
#: dictionary for the phrase_dictionary gate — includes a
#: self-overlapping phrase ('batch batch') so the non-overlap counting
#: contract is genuinely exercised
PHRASE_DICT = ("batch batch", "merge line", "the fast",
               "window window", "data")


def _docs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def _emb(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _events(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/events.parquet")


def _events_mod():
    from ts_type_filter_ray.functions import events
    return events


CMS_JOIN_DEPTH = 4
CMS_JOIN_WIDTH = 16
HLL_P = 8


def _cms_join_size(sf_dir: str):
    import ray.data as rd

    from ts_type_filter_ray.functions.sketches import cms_join_size
    return rd.from_arrow(cms_join_size(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id"]), "user_id",
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey"]), "o_custkey",
        depth=CMS_JOIN_DEPTH, width=CMS_JOIN_WIDTH))


def _sketches_mod():
    from ts_type_filter_ray.functions import sketches
    return sketches


def _textstats_mod():
    from ts_type_filter_ray.functions import textstats
    return textstats


def _rel_mod():
    from ts_type_filter_ray.functions import relational
    return relational


def _analytics():
    from ts_type_filter_ray.pipelines import analytics
    return analytics


def _export_postings(sf_dir: str):
    from ts_type_filter_ray.pipelines.build import export_postings
    from ts_type_filter_ray.pipelines.flagship import \
        build_documents_index_nostem
    return export_postings(build_documents_index_nostem(sf_dir).root)


def _packing():
    from ts_type_filter_ray.functions import packing
    return packing



def _strip_dup_spans(sf_dir: str):
    from ts_type_filter_ray.functions.ngrams import strip_dup_spans
    return strip_dup_spans(_docs(sf_dir), shingle_k=DUP_SPAN_K)


def _tf_cosine_pairs(sf_dir: str):
    from ts_type_filter_ray.functions.dedup import tf_cosine_pairs
    return tf_cosine_pairs(_docs(sf_dir), threshold=TF_COSINE_T,
                           max_term_df=TF_COSINE_MAX_DF)


def _kll(sf_dir: str, k: int):
    from ts_type_filter_ray.functions.sketches import kll_quantiles
    return kll_quantiles(_events(sf_dir), k=k)


BPE_N_MERGES = 20


def _bpe_top_pairs(sf_dir: str):
    from ts_type_filter_ray.functions.bpe import pair_counts
    return pair_counts(_docs(sf_dir))


def _bpe_first_merge(sf_dir: str):
    # one training iteration ≡ argmax of the pair table — puts the
    # trainer's selection + tie-break on the value-exact gate
    from ts_type_filter_ray.functions.bpe import train_bpe
    return train_bpe(_docs(sf_dir), 1)


def _bpe_merges(sf_dir: str):
    from ts_type_filter_ray.functions.bpe import train_bpe
    return train_bpe(_docs(sf_dir), BPE_N_MERGES)


def _bpe_encode_zero(sf_dir: str):
    # zero merges ⇒ n_bpe = Σ(len(token)+1): the whole encode path
    # (actor pool, unique-token cache, per-doc reduction) value-exact
    from ts_type_filter_ray.functions.bpe import encode_token_counts
    return encode_token_counts(_docs(sf_dir), [])


def _bpe_encode_trained(sf_dir: str):
    from ts_type_filter_ray.functions.bpe import (encode_token_counts,
                                                  train_bpe)
    return encode_token_counts(_docs(sf_dir),
                               train_bpe(_docs(sf_dir), BPE_N_MERGES))


LINE_TOKENS = 4


def _docs_multiline(sf_dir: str):
    """Derived multi-line corpus for the line-dedup gate: each
    non-empty doc's whitespace tokens regrouped into lines of
    ``LINE_TOKENS`` tokens joined with ``\\n`` (the sf documents are
    single-line; the oracle re-derives the same corpus in SQL — the
    ``corpus_diff`` variant-B precedent)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ts_type_filter_ray.functions.dedup import _tokenize_texts_batch

    def to_lines(batch: pa.Table) -> pa.Table:
        flat, off = _tokenize_texts_batch(batch["text"])
        counts = np.diff(off)
        keep = counts > 0
        lc = -(-counts // LINE_TOKENS)          # lines per doc (ceil)
        within = np.arange(lc.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(lc) - lc, lc)
        starts = np.repeat(off[:-1], lc) + within * LINE_TOKENS
        line_off = np.append(starts, off[-1]).astype(np.int32)
        lines = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(line_off, type=pa.int32()),
                                     flat), " ")
        doc_off = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(lc, out=doc_off[1:])
        texts = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(doc_off.astype(np.int32), type=pa.int32()),
                lines), "\n")
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().filter(
                pa.array(keep)),
            "text": texts.filter(pa.array(keep)),
        })

    return _docs(sf_dir).map_batches(to_lines, batch_format="pyarrow")


TEXTRANK_K = 25
TEXTRANK_ITERS = 3
TEXTRANK_DAMPING = 0.85


def _textrank(sf_dir: str):
    from ts_type_filter_ray.functions.ngrams import textrank_keywords
    return textrank_keywords(_docs(sf_dir), k=TEXTRANK_K,
                             iters=TEXTRANK_ITERS,
                             damping=TEXTRANK_DAMPING, num_parts=16)


CMS_DEPTH = 3
CMS_WIDTH = 16   # far below the sf vocabulary: collisions guaranteed,
                 # so the min-over-rows estimate logic genuinely bites


def _cms_counts(sf_dir: str):
    from ts_type_filter_ray.functions.sketches import cms_term_counts
    return cms_term_counts(_docs(sf_dir), depth=CMS_DEPTH,
                           width=CMS_WIDTH)


def _line_dedup(sf_dir: str):
    from ts_type_filter_ray.functions.linededup import dedup_lines
    return dedup_lines(_docs_multiline(sf_dir), min_chars=1,
                       num_parts=16)


# Gopher-rule thresholds chosen so every SQL-expressible rule computes
# over the sf corpora and the word-count / mean-length / stopword rules
# genuinely split them (sf0.001: n_words 10-99, mean len 3.69-5.08,
# 321/145/34 docs with >=2/1/0 distinct stopwords); the symbol/alpha
# rules are inert there (no punctuation in the vocabulary) and are
# pytest-covered on handcrafted docs.
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 4.6
GOPHER_MAX_SYMBOL = 0.1
GOPHER_MIN_ALPHA = 0.8
GOPHER_MIN_STOP = 2


def _gopher_rules(sf_dir: str):
    from ts_type_filter_ray.functions.filters import gopher_rules
    return gopher_rules(
        _docs(sf_dir), min_words=GOPHER_MIN_WORDS,
        max_words=GOPHER_MAX_WORDS, min_mean_len=GOPHER_MIN_MEAN_LEN,
        max_mean_len=GOPHER_MAX_MEAN_LEN,
        max_symbol_ratio=GOPHER_MAX_SYMBOL,
        min_alpha_ratio=GOPHER_MIN_ALPHA,
        min_stop_distinct=GOPHER_MIN_STOP)


def _docs_c4(sf_dir: str):
    """Punctuation-injected variant of the multi-line corpus for the C4
    gate: line ``li`` of doc ``d`` gets a trailing ``'.'`` iff
    ``(d + li) % 2 == 0`` (the sf vocabulary has no punctuation, so the
    terminal-punctuation rule would otherwise drop everything — the
    ``corpus_diff`` variant-B precedent; the oracle re-derives the same
    corpus in SQL)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ts_type_filter_ray.functions.dedup import join_lists
    from ts_type_filter_ray.functions.linededup import _split_lines

    def punct(batch: pa.Table) -> pa.Table:
        flat, off = _split_lines(batch["text"])
        counts = np.diff(off)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(did), dtype=np.int64), counts)
        li = np.arange(len(flat), dtype=np.int64) - off[:-1][doc_of]
        dot = (did[doc_of] + li) % 2 == 0
        suffix = pa.array(np.where(dot, ".", ""), type=flat.type)
        lines = pc.binary_join_element_wise(
            flat, suffix, pa.scalar("", type=flat.type))
        lst = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), type=pa.int32()), lines)
        return pa.table({"doc_id": batch["doc_id"],
                         "text": join_lists(lst, "\n")})

    return _docs_multiline(sf_dir).map_batches(
        punct, batch_format="pyarrow")


def _c4_clean(sf_dir: str):
    from ts_type_filter_ray.functions.filters import c4_clean
    # default rules: terminal punct + >=3 words + no 'javascript' line,
    # no 'lorem ipsum'/'{' doc (the bad-term rules are inert on the sf
    # vocabulary and pytest-covered; punct + word count genuinely bite)
    return c4_clean(_docs_c4(sf_dir))


TEMP_ALPHA = 0.5
TEMP_MOD = 10_000

# per-lang character budget: selects the longest ~100 docs per lang at
# sf0.001 and a genuine top slice at sf0.01 — both the ranking and the
# budget boundary bite at gate scale
SELECT_BUDGET = 30_000


def _select_budget(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import select_until_budget
    return select_until_budget(_docs(sf_dir), budget=SELECT_BUDGET,
                               weight_col="n_chars", group_col="lang",
                               part_bits=4)


# gate n-grams: bigrams for both stats — with a ~31-token vocabulary and
# ~56-token docs, within-doc bigram repeats are common (birthday bound),
# so both the argmax tie-break and the dup mass genuinely bite at sf;
# distinct top_n/dup_n is pytest-covered
GOPHER_REP_N = 2


def _gopher_repetition(sf_dir: str):
    from ts_type_filter_ray.functions.filters import gopher_repetition
    return gopher_repetition(_docs(sf_dir), top_n=GOPHER_REP_N,
                             dup_n=GOPHER_REP_N)


def _temperature_sample(sf_dir: str):
    from ts_type_filter_ray.functions.filters import temperature_sample
    return temperature_sample(_docs(sf_dir), alpha=TEMP_ALPHA,
                              mod=TEMP_MOD)


FEATURE_DIM_BITS = 18
CLASSIFIER_DIM_BITS = 18
CLASSIFIER_SCALE = 64


def _classifier_scores(sf_dir: str):
    from ts_type_filter_ray.functions.textstats import classifier_scores
    return classifier_scores(_docs(sf_dir), dim_bits=CLASSIFIER_DIM_BITS,
                             scale=CLASSIFIER_SCALE)


def _bigram_perplexity(sf_dir: str):
    from ts_type_filter_ray.functions.lm import bigram_logprob_scores
    return bigram_logprob_scores(_docs(sf_dir), alpha=1)


def _kneser_ney(sf_dir: str):
    from ts_type_filter_ray.functions.lm import kneser_ney_scores
    return kneser_ney_scores(_docs(sf_dir))


# noisy-channel "did you mean" phrase correction: one substitution, one
# deletion, one insertion, an OOV that must survive verbatim, a
# two-typo 3-token lattice, and 'sow' — within dist 1 of BOTH 'slow'
# and 'row', so the bigram LM (not the channel) decides.  max_dist=1
# keeps per-position candidate sets honest at the sf vocabulary;
# pen=16 (ln 16 per edit) is well under the ~ln 950 unigram gain at
# gate scale, so corrections genuinely fire.
DYM_QUERY_SET = [
    "hach join",
    "merg sort",
    "quary filter",
    "zzzqqq scan",
    "fst column",
    "bg tble scan",
    "sow scan",
]
DYM_MAX_DIST = 1
DYM_PEN = 16


def _did_you_mean(sf_dir: str):
    from ts_type_filter_ray.functions.didyoumean import did_you_mean
    return did_you_mean(_docs(sf_dir), DYM_QUERY_SET,
                        max_dist=DYM_MAX_DIST, pen=DYM_PEN)


# distributed suffix array (prefix doubling): the sf corpora plant
# near-duplicate docs sharing up to ~552-char spans, so doubling needs
# k=1024 to separate all suffixes — max_compare=1024 is both the
# engine's convergence budget and the oracle's suffix-truncation
# window (sound because the engine raises if any repeat reaches it).
# stride 8 keeps the gate output ~19k rows; min_len=40 sits between
# the token-5-gram scale (~27 chars) and whole-doc spans, so coverage
# fractions genuinely vary per doc.
SA_STRIDE = 8
SA_MAX_COMPARE = 1024
SA_DUP_LEN = 40


# the four suffix-family queries share ONE doubling per sf_dir: the
# SuffixArray handle retains the per-level rank tables (materialized,
# object-store-resident) for the life of the driver process
_SA_HANDLES: dict = {}


def _sa_handle(sf_dir: str):
    sa = _SA_HANDLES.get(sf_dir)
    if sa is None:
        from ts_type_filter_ray.functions.suffix import SuffixArray
        sa = SuffixArray(_docs(sf_dir), max_compare=SA_MAX_COMPARE)
        _SA_HANDLES[sf_dir] = sa
    return sa


def _suffix_ranks(sf_dir: str):
    return _sa_handle(sf_dir).suffix_ranks(stride=SA_STRIDE)


def _sa_dup_coverage(sf_dir: str):
    return _sa_handle(sf_dir).dup_coverage(SA_DUP_LEN)


def _suffix_lcp(sf_dir: str):
    return _sa_handle(sf_dir).lcp(stride=SA_STRIDE)


def _longest_repeat(sf_dir: str):
    return _sa_handle(sf_dir).longest_repeat()


def _distinct_substrings(sf_dir: str):
    from ts_type_filter_ray.functions.suffix import distinct_substrings
    return distinct_substrings(_docs(sf_dir), sa=_sa_handle(sf_dir))


def _cross_common(sf_dir: str):
    """Longest common substring BETWEEN the en and non-en corpora (the
    train/test contamination-length measure): adjacent generalized-SA
    pairs with different corpus ownership, descended over the shared
    full-corpus handle's retained doubling levels."""
    from ts_type_filter_ray.functions.suffix import cross_longest_common
    docs = _docs(sf_dir)
    return cross_longest_common(_lang_slice(docs, True),
                                _lang_slice(docs, False),
                                sa=_sa_handle(sf_dir))


# with the sf corpora's ~31-token vocabulary most bigrams repeat, so the
# count floor genuinely prunes at gate scale
PMI_MIN_COUNT = 5
# sorted-neighborhood blocking: first-8-chars normalized-prefix key,
# rank window 3
NGRAM_CONTAIN_T = 0.8
SNB_KEY_CHARS = 8
SNB_WINDOW = 3
# hashed-Gram power iteration: 2 all-integer iterations (the int64
# bound guard allows exactly 2 at sf corpus magnitudes), 2^10 dims
GAPFILL_WINDOW_SEC = 3600
HITS_ITERS = 2
SPECTRAL_DIM_BITS = 10
SPECTRAL_ITERS = 2
SPECTRAL_TOP_K = 32
# max_dist for the cross-lang bigram edit join: 2 keeps the result set
# non-trivial (shared vocab ⇒ dist-0 rows, one-term edits ⇒ 1-2) without
# the oracle's cross join exploding
EDIT_JOIN_DIST = 2

# corpus-law fits: top_n below the sf vocabulary so the rank cut bites;
# the sf corpora draw from a ~31-term vocabulary that saturates within
# the first few docs, so the growth checkpoints start at doc 1 (where
# vocab genuinely rises) and extend past the last doc id (cutoffs
# beyond the corpus are well-defined — they include every doc)
ZIPF_TOP_N = 24
HEAPS_CHECKPOINTS = [1, 2, 8, 50, 400]


def _zipf_fit(sf_dir: str):
    from ts_type_filter_ray.functions.textstats import zipf_fit
    return zipf_fit(_docs(sf_dir), top_n=ZIPF_TOP_N)


def _heaps_fit(sf_dir: str):
    from ts_type_filter_ray.functions.textstats import heaps_fit
    return heaps_fit(_docs(sf_dir), HEAPS_CHECKPOINTS)


def _pmi_collocations(sf_dir: str):
    from ts_type_filter_ray.functions.ngrams import pmi_collocations
    return pmi_collocations(_docs(sf_dir), min_count=PMI_MIN_COUNT)


def _sorted_neighborhood(sf_dir: str):
    import pyarrow as _pa
    import pyarrow.compute as _pc
    from ts_type_filter_ray.functions.blocking import (
        sorted_neighborhood_pairs)

    def addkey(b):
        key = _pc.utf8_slice_codeunits(_pc.utf8_lower(
            _pc.utf8_trim_whitespace(_pc.fill_null(b["text"], ""))),
            0, SNB_KEY_CHARS)
        return _pa.table({"doc_id": b["doc_id"], "bkey": key})

    keyed = _docs(sf_dir).map_batches(addkey, batch_format="pyarrow")
    return sorted_neighborhood_pairs(keyed, "bkey", window=SNB_WINDOW)


def _spectral_doc_proj(sf_dir: str):
    from ts_type_filter_ray.functions.spectral import doc_projections
    return doc_projections(_docs(sf_dir), dim_bits=SPECTRAL_DIM_BITS,
                           iters=SPECTRAL_ITERS)


def _spectral_direction(sf_dir: str):
    from ts_type_filter_ray.functions.spectral import dominant_direction
    return dominant_direction(_docs(sf_dir), dim_bits=SPECTRAL_DIM_BITS,
                              iters=SPECTRAL_ITERS, top_k=SPECTRAL_TOP_K)


def _edit_join(sf_dir: str):
    from ts_type_filter_ray.functions.edjoin import (
        distinct_token_bigrams, edit_similarity_join)
    docs = _docs(sf_dir)
    left = distinct_token_bigrams(_lang_slice(docs, True))
    right = distinct_token_bigrams(_lang_slice(docs, False))
    return edit_similarity_join(left, right, max_dist=EDIT_JOIN_DIST,
                                q=2, num_parts=32)


def _lang_slice(ds, want_en: bool):
    import pyarrow.compute as _pc

    def f(batch):
        m = _pc.equal(batch["lang"], "en")
        return batch.filter(m if want_en else _pc.invert(m))

    return ds.map_batches(f, batch_format="pyarrow")


def _cross_perplexity(sf_dir: str):
    from ts_type_filter_ray.functions.lm import bigram_logprob_scores
    from ts_type_filter_ray.functions.partitioning import auto_num_parts
    docs = _docs(sf_dir)
    # size partitions from the base parquet read (metadata-only count);
    # auto-sizing from the derived filter pipeline would execute it
    # once extra just to count
    return bigram_logprob_scores(_lang_slice(docs, False), alpha=1,
                                 train=_lang_slice(docs, True),
                                 num_parts=auto_num_parts(docs))


def _stupid_backoff(sf_dir: str):
    from ts_type_filter_ray.functions.lm import stupid_backoff_scores
    from ts_type_filter_ray.functions.partitioning import auto_num_parts
    docs = _docs(sf_dir)
    return stupid_backoff_scores(_lang_slice(docs, False), backoff=0.4,
                                 train=_lang_slice(docs, True),
                                 num_parts=auto_num_parts(docs))


def _dsir_select(sf_dir: str):
    from ts_type_filter_ray.functions.lm import dsir_select
    docs = _docs(sf_dir)
    return dsir_select(docs, _lang_slice(docs, True), k=SAMPLE_K,
                       dim_bits=DSIR_DIM_BITS)


def _perplexity_buckets(sf_dir: str):
    from ts_type_filter_ray.functions.lm import perplexity_buckets
    return perplexity_buckets(_docs(sf_dir), alpha=1)


def _dsir_weights(sf_dir: str):
    from ts_type_filter_ray.functions.lm import dsir_importance_weights
    docs = _docs(sf_dir)
    return dsir_importance_weights(docs, _lang_slice(docs, True),
                                   dim_bits=DSIR_DIM_BITS)


DSIR_DIM_BITS = 16


def _semantic_dedup_exact(sf_dir: str):
    from ts_type_filter_ray.functions.ann import semantic_dedup
    return semantic_dedup(_emb(sf_dir), NEAR_DUP_THRESHOLD, n_clusters=1)



def _hashed_features(sf_dir: str):
    from ts_type_filter_ray.functions.textstats import hashed_features
    return hashed_features(_docs(sf_dir), dim_bits=FEATURE_DIM_BITS)


def _triangle_count_knn(sf_dir: str):
    from ts_type_filter_ray.functions import ann
    from ts_type_filter_ray.functions.graph import triangle_count
    from ts_type_filter_ray.functions.partitioning import auto_num_parts
    emb = _emb(sf_dir)
    n = emb.count()  # metadata-only (plain parquet read)
    edges = ann.knn_join(emb, k=PAGERANK_KNN_K)
    # pass the edge count (n·k) explicitly: auto_num_parts(edges) would
    # .count() the derived kNN pipeline and execute the join twice
    return triangle_count(edges, src_col="vec_id", dst_col="neighbor_id",
                          num_parts=auto_num_parts(n * PAGERANK_KNN_K))


def _distinct_terms_by_lang(sf_dir: str):
    from ts_type_filter_ray.functions.sketches import distinct_terms_by_group
    return distinct_terms_by_group(_docs(sf_dir), group_col="lang")


def _corpus_checksum(sf_dir: str):
    from ts_type_filter_ray.functions.snapshot import corpus_checksum
    return corpus_checksum(_docs(sf_dir))


def _mmr(sf_dir: str, lam: float):
    from ts_type_filter_ray.functions.ann import mmr_topk
    return mmr_topk(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K,
                    pool=3 * ANN_K, lam=lam)


def _variant_b(docs):
    """Deterministically derived snapshot B of the documents table:
    doc_id % 7 == 0 → text edited, % 13 == 5 → removed, % 11 == 3 →
    a new doc added under id + 10_000_000. The SQL oracles re-derive
    the same B, so operators probed against it stay value-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _mod(arr, m):
        return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))

    def variant(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"]
        keep = pc.not_equal(_mod(did, 13), 5)
        t = pc.if_else(
            pc.equal(_mod(did, 7), 0),
            pc.binary_join_element_wise(
                batch["text"], pa.scalar("__r4__"), " "),
            batch["text"])
        out = pa.table({"doc_id": did, "text": t})
        return out.filter(keep)

    def added(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"]
        sel = pc.equal(_mod(did, 11), 3)
        sub = batch.filter(sel)
        return pa.table({
            "doc_id": pc.add(sub["doc_id"], 10_000_000),
            "text": pc.binary_join_element_wise(
                pa.scalar("added:"), pc.cast(sub["doc_id"], pa.string()),
                ""),
        })

    return (docs.map_batches(variant, batch_format="pyarrow")
            .union(docs.map_batches(added, batch_format="pyarrow")))


def _corpus_diff(sf_dir: str):
    from ts_type_filter_ray.functions.snapshot import corpus_diff
    docs = _docs(sf_dir)
    return corpus_diff(docs, _variant_b(docs))


def _decontam_indexed(sf_dir: str):
    """Persisted-shingle-index decontamination: build the documents
    table's shingle index once, probe the derived snapshot B against it
    — the incremental-recrawl shape (reference corpus never re-read at
    probe time)."""
    import os
    import shutil
    import tempfile

    from ts_type_filter_ray.functions.shingleidx import (
        contaminated_against_index, write_shingle_index)
    docs = _docs(sf_dir)
    out = os.path.join(
        tempfile.gettempdir(),
        f"graft_shingle_idx_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    write_shingle_index(docs, out, shingle_k=3, num_buckets=16)
    return contaminated_against_index(_variant_b(docs), out)


PAGERANK_ITERS = 3
PAGERANK_DAMPING = 0.85
PAGERANK_KNN_K = 5


def _gap_filled(sf_dir: str):
    import ray.data as rd
    from ts_type_filter_ray.functions.events import gap_filled_windows
    return gap_filled_windows(
        rd.read_parquet(f"{sf_dir}/events.parquet"),
        window_sec=GAPFILL_WINDOW_SEC)


def _hits_knn(sf_dir: str):
    """HITS over the exact kNN cosine graph — the directional
    complement of pagerank_knn; all-integer iterates, both score
    columns value-exact."""
    from ts_type_filter_ray.functions import ann
    from ts_type_filter_ray.functions.graph import hits
    import ray.data as rd
    emb = _emb(sf_dir)
    n = emb.count()
    edges = ann.knn_join(emb, k=PAGERANK_KNN_K).materialize()
    return rd.from_arrow(hits(edges, n, iters=HITS_ITERS,
                              src_col="vec_id", dst_col="neighbor_id"))


BFS_SEED = 0
BFS_MAX_HOPS = 6
LPA_ITERS = 2
SP_DIST_CAP = 24
KCORE_K = 7
KCORE_ROUNDS = 8


def _kcore_knn(sf_dir: str):
    """k-core membership of the exact kNN cosine graph (undirected
    multigraph degree): iterative peel, engine max_rounds pinned to the
    oracle's unroll depth so a deeper-than-expected cascade fails
    loudly instead of silently diverging (peeling is monotone — once
    stable, extra unrolled oracle rounds are no-ops)."""
    import ray.data as rd

    from ts_type_filter_ray.functions import ann
    from ts_type_filter_ray.functions.graph import kcore
    emb = _emb(sf_dir)
    n = emb.count()
    edges = ann.knn_join(emb, k=PAGERANK_KNN_K).materialize()
    t = kcore(edges, n, k=KCORE_K, src_col="vec_id",
              dst_col="neighbor_id", max_rounds=KCORE_ROUNDS)
    return rd.from_arrow(t.rename_columns(["vec_id"]))


def _shortest_paths_knn(sf_dir: str):
    """Bellman-Ford weighted shortest paths over the exact kNN cosine
    graph, weight = neighbor rank (1..k): integer distances value-exact
    vs a recursive-CTE oracle. Both sides cap at dist <
    :data:`SP_DIST_CAP` — sound because every prefix of an optimal
    path costs strictly less than its final distance, so bounded
    exploration finds every under-cap optimum."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ts_type_filter_ray.functions import ann
    from ts_type_filter_ray.functions.graph import shortest_paths
    emb = _emb(sf_dir)
    n = emb.count()
    edges = ann.knn_join(emb, k=PAGERANK_KNN_K).materialize()
    t = shortest_paths(edges, n, sources=(BFS_SEED,), rounds=64,
                       weight_col="rank", directed=False,
                       src_col="vec_id", dst_col="neighbor_id")
    t = t.filter(pc.less(t["dist"], SP_DIST_CAP))
    return rd.from_arrow(t.rename_columns(["vec_id", "dist"]))


def _label_prop_knn(sf_dir: str):
    """Label-propagation communities over the exact kNN cosine graph
    (undirected multigraph — every directed knn edge votes both ways):
    deterministic (count desc, label asc) argmax per round, labels
    value-exact vs an unrolled SQL oracle."""
    import ray.data as rd

    from ts_type_filter_ray.functions import ann
    from ts_type_filter_ray.functions.graph import label_propagation
    emb = _emb(sf_dir)
    n = emb.count()
    edges = ann.knn_join(emb, k=PAGERANK_KNN_K).materialize()
    t = label_propagation(edges, n, iters=LPA_ITERS, directed=False,
                          src_col="vec_id", dst_col="neighbor_id")
    return rd.from_arrow(t.rename_columns(["vec_id", "label"]))


def _bfs_hops_knn(sf_dir: str):
    """Multi-source BFS hop distances over the exact kNN cosine graph
    (undirected): the reachability/distance primitive next to
    pagerank_knn's mass and triangle_count_knn's closure — hop counts
    are exact integers, value-exact vs a recursive-CTE oracle."""
    import ray.data as rd

    from ts_type_filter_ray.functions import ann
    from ts_type_filter_ray.functions.graph import bfs_hops
    emb = _emb(sf_dir)
    n = emb.count()
    edges = ann.knn_join(emb, k=PAGERANK_KNN_K).materialize()
    t = bfs_hops(edges, n, sources=(BFS_SEED,), max_hops=BFS_MAX_HOPS,
                 directed=False, src_col="vec_id",
                 dst_col="neighbor_id")
    return rd.from_arrow(t.rename_columns(["vec_id", "hops"]))


def _pagerank_knn(sf_dir: str):
    """PageRank over the exact kNN cosine graph (the knn_join edge set):
    authority ranking in the similarity graph — representative-document
    selection for curation. The float rank column itself crosses the
    value-exact gate (identical float64 expression shapes + ordered
    per-dst folds on both sides)."""
    from ts_type_filter_ray.functions import ann
    from ts_type_filter_ray.functions.graph import pagerank
    emb = _emb(sf_dir)
    n = emb.count()
    edges = ann.knn_join(emb, k=PAGERANK_KNN_K).materialize()
    return pagerank(edges, n, iters=PAGERANK_ITERS,
                    damping=PAGERANK_DAMPING,
                    src_col="vec_id", dst_col="neighbor_id")


def entry() -> Any:
    """Flagship: build the distributed inverted index over the sf0.001
    documents corpus and answer the fixed BM25 query set."""
    from ts_type_filter_ray.pipelines.flagship import bm25_topk_table
    return bm25_topk_table("/root/testdata/sf0.001")


# The driver's correctness gate samples the LEADING ~50 entries of the
# queries() dict. With 140+ entries not everything fits in one round,
# so this list ranks one representative of every distinct machinery
# family (new/never-sampled operators first, then near-duplicate
# variants of already-ranked machinery — e.g. the five ranked scorers
# share the index/decode path, the wildcard family shares the vocab
# sweeps). Entries absent from this list keep their construction order
# AFTER the ranked head; nothing is removed.
_GATE_PRIORITY = [
    # r5 head (VERDICT r4 "next round" #1): the driver samples the
    # LEADING ~50 entries, and 117 queries already carry green rows
    # from r1-r4 — so the head is now ENTIRELY never-sampled
    # oracle-bearing entries, one per distinct machinery family,
    # burning the never-checked backlog from 80 to 30. Families with a
    # green sibling defer to the tail (annotated there).
    # -- suffix-array LCP descent family --
    "suffix_lcp", "longest_repeat", "sa_dup_coverage",
    "distinct_substrings",
    # -- sketch algebra (value-exact configurations) --
    "hll_distinct_by_lang", "hll_set_ops_lang",
    "cms_counts", "cms_join_size", "kll_quantiles_exact",
    # -- graph/rank machinery never sampled --
    "textrank_keywords", "hits_knn",
    # -- events/relational stragglers --
    "event_sequences", "revenue_rollup", "pack_sequences",
    # -- BPE trainer/encoder trio --
    "bpe_top_pairs", "bpe_first_merge", "bpe_encode_zero",
    # -- LM family beyond the green bigram/KN rows --
    "stupid_backoff", "cross_perplexity", "perplexity_buckets",
    # -- retrieval: fusion, query language, fuzzy, pagination --
    "hybrid_rrf", "boolean_expr_match",
    "fuzzy_match_nostem", "fuzzy_match_indexed",
    "bm25_page2_nostem", "bm25_filtered_nostem", "tfidf_topk_nostem",
    # -- sampling family's two never-checked exact modes --
    "weighted_sample_k", "sample_per_stratum",
    # -- feature hashing + corpus integrity --
    "hashed_features", "corpus_checksum",
    # -- the reference AST family, value-exact for the first time
    #    (r5: golden-output oracles cited to the reference tests) --
    "prune_types", "validate_carts", "normalize_carts",
    # -- ranked scorers / query expansion never sampled --
    "ql_topk_nostem", "mlt_topk_nostem",
    "spell_correct", "related_terms", "synonym_match",
    # -- metadata / secondary-index match paths --
    "field_filter_match", "regex_match_trigram", "suffix_match_indexed",
    "minshould_match", "deleted_match_nostem",
    "collapsed_topk_nostem", "bm25f_topk_nostem",
    # -- ANN exactness-configuration gates (the identity trick) --
    "ann_ivf_exhaustive", "pq_exhaustive_refine",
    "knn_join_probed_exhaustive", "graph_search_exhaustive",
    # ---- tail: the 30 remaining never-checked entries, every one
    # machinery-covered by a green (or head-50) sibling — r6 head
    # candidates in this order ----
    # rrf_fusion ⊂ hybrid_rrf's fold; term_routed ⊂ green
    # boolean_match_term_routed + pytest-pinned fold; boosted/bulk/
    # function_score ⊂ green bm25_topk_nostem core
    "rrf_fusion_nostem", "bm25_topk_term_routed", "boosted_bm25_nostem",
    "bulk_bm25_topk_nostem", "function_score_topk",
    # positional/field/stopword variants of green match machinery
    "ordered_proximity_match", "first_positions", "range_filter_match",
    "field_stats_match", "stopword_match",
    "sorted_match", "faceted_match_counts", "term_vectors",
    "export_postings",
    # vocab-sweep wildcard siblings of the head's indexed paths
    "regex_match_nostem", "suffix_match_nostem", "infix_match_trigram",
    # text-stats siblings of green machinery
    "gopher_repetition", "ngram_containment", "oov_rate",
    "pmi_collocations", "unigram_entropy", "zipf_fit",
    "distinct_terms_by_lang", "c4_clean",
    # selection/sampling siblings of green hashing machinery
    "dsir_select", "temperature_sample", "select_until_budget",
    "spectral_direction",
    # mmr λ=1 ⊂ the same brute-force oracle the head's ANN trio +
    # graph_search_exhaustive already cover
    "mmr_topk_lambda1",
]


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_PRIORITY if k in d}
    for k, v in d.items():
        if k not in head:
            head[k] = v
    return head


def queries() -> dict[str, Callable[[str], Any]]:
    from ts_type_filter_ray.functions import ann, dedup, textstats
    from ts_type_filter_ray.pipelines import flagship

    def ann_topk(sf_dir):
        out = ann.brute_force_topk(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K)
        # integer-only output: float similarity never crosses the oracle
        # boundary (DuckDB computes f32, numpy f64)
        return out.select_columns(["query_id", "rank", "vec_id"])

    def near_dup(sf_dir):
        return ann.embedding_near_dup_pairs(_emb(sf_dir), NEAR_DUP_THRESHOLD)

    out = {
        # ---- never-driver-sampled entries FIRST (VERDICT r3 #1): the
        # driver checks the leading ~50 entries of this dict, so queries
        # whose oracles have no CORRECTNESS row in any round lead. ----
        # percolation (reverse search): stored rules classified against
        # the streaming corpus in ONE indexless pass (pipelines/
        # percolate.py) — boolean/phrase/proximity/prefix/fuzzy/field/
        # range leaves, pure negation legal (per-doc universe)
        # fastText-style hashed linear quality classifier (the standard
        # model-based curation filter): integer hashed-BoW dot product +
        # libm sigmoid, weights built once per actor — value-exact incl.
        # the float score (textstats.classifier_scores)
        "classifier_scores": _classifier_scores,
        # CCNet-style LM fluency scoring: self-trained add-alpha bigram
        # LM, two coarse count-attach exchanges + one doc fold — the
        # float perplexity itself crosses the gate (functions/lm.py)
        "bigram_perplexity": _bigram_perplexity,
        # the true CCNet shape: LM trained on the trusted slice
        # (lang='en'), the rest of the crawl scored against it —
        # train bigrams union-tagged into the same count-attach
        # exchanges, unseen bigrams smoothed to alpha/(alpha*V)
        "cross_perplexity": _cross_perplexity,
        # interpolated Kneser-Ney (the KenLM smoothing), self-trained:
        # continuation counts N1+(w1 .) / N1+(. w2) from two coarse
        # hash exchanges; the rational-discount (d = 3/4) decomposition
        # keeps every log argument integer, so the float perplexity
        # itself crosses the gate (functions/lm.py)
        "kneser_ney_perplexity": _kneser_ney,
        # noisy-channel phrase correction (Kernighan/Church/Gale 1990):
        # bigram-LM Viterbi over the per-token candidate lattice —
        # candidates from a vectorized vocabulary sweep, lattice counts
        # from ONE corpus pass over broadcast candidates; the ORACLE
        # enumerates every path (cross join of candidate sets) under
        # the same integer-log float expressions, so the winning
        # phrase AND its float score are value-exact
        "did_you_mean": _did_you_mean,
        # distributed char-level suffix array (prefix doubling as
        # O(log maxrepeat) linear shuffles — functions/suffix.py):
        # every 8th position's suffix rank, value-exact vs a DuckDB
        # truncated-suffix rank() oracle (truncation sound via the
        # engine's convergence guard)
        "suffix_ranks": _suffix_ranks,
        # ExactSubstr (Lee et al. 2022) at the fixed threshold length:
        # per-doc chars covered by a >=2-occurrence 40-char window,
        # from the suffix-array sparse-table anchors — value-exact vs
        # an independent L-gram + gaps-and-islands SQL formulation
        "sa_dup_coverage": _sa_dup_coverage,
        # LCP array by binary descent over the retained doubling rank
        # tables (the sparse-table construction): every 8th position's
        # longest common prefix with its suffix-array predecessor,
        # value-exact vs a DuckDB oracle running the SAME descent as
        # 10 chained window-substr CTEs
        "suffix_lcp": _suffix_lcp,
        # cross-corpus longest common substring: the max adjacent-pair
        # LCP with DIFFERENT corpus ownership over the generalized
        # suffix array — ownership attached by pos-range union-shuffles
        # against replicated per-doc bounds (functions/suffix.py::
        # cross_longest_common); en vs non-en slices
        "cross_common_substring": _cross_common,
        # n(n+1)/2 − Σ LCP: the distinct-substring count / corpus
        # repetitiveness one-number signal — the full-stride LCP array
        # reduced by one Sum over the shared handle
        "distinct_substrings": _distinct_substrings,
        # classic longest-repeated-substring: max over the LCP array,
        # computed by filtering pairs to the last still-duplicated
        # doubling class (K <= L < 2K) before descending the low bits
        "longest_repeat": _longest_repeat,
        # PMI collocations (Church & Hanks 1990): per-batch pair count
        # partials, then three exchanges over the distinct-pair table
        # (c1/c2 are segment sums of c12 — no second corpus pass);
        # integer log arguments make the float pmi value-exact
        "pmi_collocations": _pmi_collocations,
        # two-table edit-similarity join (record linkage): q-gram
        # prefix-filter blocking (Gravano 2001 / Ed-Join) — gram-hash
        # candidate exchange + pair-hash dedup + exact banded-DP
        # verify; en-bigrams × non-en-bigrams at lev ≤ 2, value-exact
        # vs DuckDB's levenshtein() (functions/edjoin.py)
        "edit_join": _edit_join,
        # LSA-style spectral topicality: distributed power iteration on
        # the hashed-tf Gram matrix AᵀA — one feature-stream pass per
        # iteration with the 2^10-dim direction broadcast, ≤ 2^10-key
        # Sum reduce; all-integer iterates (v0=1) with a pre-computed
        # int64 bound guard, so every per-doc projection is value-exact
        # vs the unrolled join+sum SQL iterations (functions/spectral.py)
        "spectral_doc_proj": _spectral_doc_proj,
        # sorted-neighborhood blocking (Hernandez & Stolfo 1995): exact
        # distributed global ranks (packed-prefix range partition +
        # prefix-sum offsets) -> rank-window pairs via one halo-
        # replicated bucket exchange, every bucket <= 2*window rows —
        # value-exact vs a row_number self-join (functions/blocking.py)
        "sorted_neighborhood": _sorted_neighborhood,
        # the direction vector itself (top-32 dims); its values are
        # implied by spectral_doc_proj's projections — deferred sibling
        "spectral_direction": _spectral_direction,
        # Zipf rank-frequency fit: log-log least squares over the
        # top-n of the term_df_tf table; integer ranks/counts + the
        # ordered-fold sum convention make the float slope/intercept
        # value-exact (textstats.zipf_fit)
        "zipf_fit": _zipf_fit,
        # Heaps vocabulary-growth fit: per-term min-doc-id exchange →
        # first-appearance histogram over the checkpoint grid → all
        # checkpoints from ONE corpus pass; same value-exact fit
        "heaps_fit": _heaps_fit,
        # Stupid Backoff (Brants 2007): the canonically distributed LM
        # smoothing — cross mode so the backoff path genuinely fires
        "stupid_backoff": _stupid_backoff,
        # CCNet's final step: head/middle/tail perplexity terciles —
        # exact percentile_disc cutoffs (actual data elements, so the
        # <= labeling is float-exact) over the materialized O(n_docs)
        # score table
        "perplexity_buckets": _perplexity_buckets,
        # DSIR (Xie et al. 2023): hashed unigram+bigram importance
        # weights target-vs-raw — two structurally bounded (2^16)
        # count passes + one shuffle-free broadcast scoring pass;
        # the float log-weight itself crosses the gate
        "dsir_weights": _dsir_weights,
        # DSIR's selection step: Gumbel-top-k over the log weights ==
        # sampling k docs without replacement with prob ∝ exp(weight);
        # deterministic u from md5(doc_id) (the weighted_sample_k
        # convention), rank-only output
        "dsir_select": _dsir_select,
        # SemDeDup (Abbas et al. 2023): cluster-then-pairwise semantic
        # dedup. n_clusters=1 is EXACTLY the global sweep -> components
        # + keep flags value-exact vs a recursive-closure oracle; the
        # clustered mode is approximate by design (rows-only; recall
        # pytest-bounded on the clustered fixture)
        "semantic_dedup_exact": _semantic_dedup_exact,
        "percolate": lambda sf: flagship.percolate_documents(sf),
        # exact-substring duplicate spans (Lee et al. 2022 ExactSubstr
        # at token granularity): per-doc token positions covered by any
        # k-gram occurring at >= 2 positions corpus-wide (same-doc
        # repeats count) — detection stats and the removal transform
        # (whitespace-normalized survivor text), both value-exact
        "strip_dup_spans": _strip_dup_spans,
        # CCNet/MassiveText line dedup over the derived multi-line
        # corpus (LINE_TOKENS tokens per line; oracle re-derives it)
        "line_dedup": _line_dedup,
        # Gopher document-quality rules (Rae et al. 2021): word count /
        # mean word length / symbol ratio / alpha ratio / distinct-
        # stopword rules, one shuffle-free pass; the float ratios AND
        # the keep verdict cross the gate (functions/filters.py)
        "gopher_rules": _gopher_rules,
        # C4 line cleaning (Raffel et al. 2020): terminal-punct +
        # min-words + bad-term line rules, bad-term doc drops, text
        # rebuilt from kept lines — value-exact incl. the rebuilt
        # strings, over the punct-injected multi-line corpus
        "c4_clean": _c4_clean,
        # token-budget data selection (the pretraining allocation step):
        # rank (score desc, id asc) per group, keep the maximal prefix
        # whose inclusive running weight stays <= budget — distributed
        # exact ranking via inverted-order-key range partitioning +
        # per-(group,part) weight sums prefixed on the driver (the
        # deterministic_shuffle construction pointed at scores)
        "select_until_budget": _select_budget,
        # Gopher's WITHIN-doc repetition signals (vs the corpus-wide
        # dup_ngram_fraction): most-frequent-n-gram char fraction (the
        # argmax gram STRING + its lexicographic tie-break cross the
        # gate) and duplicated-n-gram char mass, one shuffle-free pass
        "gopher_repetition": _gopher_repetition,
        # temperature-scaled mixture sampling (Lample & Conneau 2019):
        # per-group keep rates (n_g/n_min)^(alpha-1) DERIVED from one
        # bounded groupby-count, then the coordination-free md5 accept
        "temperature_sample": _temperature_sample,
        # exact all-pairs sparse tf-cosine similarity (the Bayardo
        # all-pairs baseline, bag-of-words near-dup signal): integer
        # dot/norms through the shuffles, one final float expression
        # on both sides (uncapped here — see TF_COSINE_MAX_DF note;
        # the df-cap contract is pytest-pinned underestimate-only)
        "tf_cosine_pairs": _tf_cosine_pairs,
        # KLL quantile sketch (Karnin-Lang-Liberty): the mergeable
        # bounded-state scale path past exact_value_quantiles. With
        # k >= n no compaction ever fires, so the sketch path is EXACT
        # percentile_disc and shares float_quantiles' oracle (the
        # exactness-configuration trick); the k=256 approximate mode is
        # rows-only with a pytest-bounded rank error
        "kll_quantiles_exact": lambda sf: _kll(sf, k=1 << 22),
        # the hashing trick (Weinberger et al.): fixed-dimension sparse
        # bag-of-words features, md5 % 2^b shared with the SQL oracle —
        # a pure per-batch map, NO shuffle, vocabulary never exists
        "hashed_features": _hashed_features,
        # exact triangle count of the kNN cosine similarity graph
        # (node-iterator wedges at the minimum vertex + one
        # co-partitioned closing-edge membership scan) — cluster
        # density analytics beside connected components / PageRank
        "triangle_count_knn": _triangle_count_knn,
        # exact per-slice vocabulary report: distinct terms per lang —
        # batch-unique (group, term-hash) explode, one coarse term-
        # partition dedup scan, tiny group sum; never a driver vocab
        "distinct_terms_by_lang": _distinct_terms_by_lang,
        # snapshot tooling: order-insensitive corpus checksum (per-row
        # md5-64 XOR, no shuffle) and snapshot diff (added/removed/
        # changed vs a deterministically derived variant B — the SQL
        # oracle derives the same B, so the diff is value-exact)
        "corpus_checksum": _corpus_checksum,
        "corpus_diff": _corpus_diff,
        # MMR diversified rerank (Carbonell & Goldstein): distributed
        # exact candidate top-pool + driver-side greedy selection over
        # the tiny pool. lambda=1.0 degenerates EXACTLY to cosine
        # top-k, so that configuration shares the brute-force oracle
        # (the exactness trick); the diversified lambda=0.7 mode is
        # rows-only with pytest-pinned reference parity
        "mmr_topk_lambda1": lambda sf: _mmr(sf, lam=1.0),
        # persisted shingle index (the incremental-recrawl shape):
        # build the reference corpus's distinct-shingle artifact once,
        # probe later batches against it without re-reading the corpus;
        # probed here with the derived snapshot B, value-exact
        "decontaminate_indexed": _decontam_indexed,
        # federated search (DFS query-then-fetch): two independently
        # built half-indexes with a query-time global-stats merge must
        # rank bit-identically to one whole-corpus index, so the SAME
        # whole-corpus BM25 oracle checks the federation value-exactly
        "federated_bm25_nostem":
            lambda sf: flagship.federated_bm25_nostem_table(sf),
        # first-occurrence positions: the stored position VALUES
        # themselves on the value-exact gate (min(pos) per (term, doc)),
        # not just membership predicates over them
        "first_positions": lambda sf: flagship.first_positions_table(sf),
        # proximity-boosted reranking: BM25 x (1 + 1/(1 + min pair
        # distance)) — lexical relevance from the inverted index, a
        # term-dependence feature from the positional index, rank-only
        "proximity_boost_topk":
            lambda sf: _analytics().proximity_boost_table(sf),
        # Indri #odN ordered windows: k terms in order, every adjacent
        # gap <= N (general sloppy phrase; gap=1 ≡ exact phrase)
        "ordered_window_match":
            lambda sf: flagship.ordered_window_table(sf),
        # PageRank over the exact kNN cosine graph (graph analytics
        # beyond connected components): per-iteration broadcast ranks +
        # coarse-partition ordered folds; the float rank column itself
        # is on the value-exact gate
        "pagerank_knn": _pagerank_knn,
        "bfs_hops_knn": _bfs_hops_knn,
        "label_prop_knn": _label_prop_knn,
        "shortest_paths_knn": _shortest_paths_knn,
        "kcore_knn": _kcore_knn,
        # HITS (Kleinberg 1999) over the same kNN edge set: hubs &
        # authorities by the unnormalized all-integer mutual recursion —
        # int64 join+sum CTEs on the oracle side, exact degree-product
        # overflow guard engine-side (functions/graph.py::hits)
        "hits_knn": _hits_knn,
        # time-series resampling with gap fill: the dense (type ×
        # window) grid SYNTHESIZES distributed via ray.data.range and
        # zero-fills against the sparse window aggregate in one
        # co-partitioned merge scan — driver state is the type enum +
        # [min,max] bounds (functions/events.py::gap_filled_windows)
        "gap_filled_windows": _gap_filled,
        # Efraimidis–Spirakis weighted sampling without replacement:
        # deterministic ln(u)/w keys from the id hash, exact top-k —
        # quality-weighted subset selection
        "weighted_sample_k": lambda sf: _weighted_sample_k(sf),
        # exactly k per stratum ("k docs per language"): per-batch
        # per-stratum heads, one small survivor groupby
        "sample_per_stratum": lambda sf: _sample_per_stratum(sf),
        # search-analytics surfaces (pipelines/analytics.py), all
        # value-exact: significant-terms aggregation (fg/bg lift with
        # the float column itself on the gate), fixed-width numeric
        # histogram facets, and function-score ranking (BM25 x numeric
        # doc-values boost, full-window rescore, rank-only)
        "significant_terms":
            lambda sf: _analytics().significant_terms_table(sf),
        "numeric_histogram":
            lambda sf: _analytics().numeric_histogram_table(sf),
        "function_score_topk":
            lambda sf: _analytics().function_score_table(sf),
        # interchange dump: decode the whole index back to its logical
        # (term, doc_id, tf) triples as one streaming distributed pass
        # (vectorized varint column decode + offsets explode) — the
        # decode path corpus-wide on the value-exact gate
        "export_postings": _export_postings,
        # index verification (pipelines/fsck.py): postings recount,
        # per-bucket df-table re-derivation, doc-id uniqueness proof,
        # and the per-row sha256 invariant as per-partition XOR rollups
        # — recounted statistics value-exact vs SQL token aggregates,
        # every flag must be healthy
        "index_fsck": lambda sf: flagship.index_fsck_table(sf),
        # term-partitioned serving topology (serve.TermRoutedService):
        # stems route to the actor owning their term bucket; match
        # unions and the coordinator-side ascending-term score fold are
        # value-exact on the same oracles as the local/doc-partitioned
        # paths
        "boolean_match_term_routed":
            lambda sf: flagship.boolean_match_term_routed_table(sf),
        "bm25_topk_term_routed":
            lambda sf: flagship.bm25_topk_term_routed_table(sf),
        # BM25 ranking itself on the value-exact gate (VERDICT r3 #2):
        # rank-only top-k from the identity-stemmer index
        "bm25_topk_nostem":
            lambda sf: flagship.bm25_topk_nostem_table(sf),
        # BM25F fielded ranking (title weighted 2x over body) from the
        # two-field identity-stemmer index — rank-only, value-exact
        "bm25f_topk_nostem":
            lambda sf: flagship.bm25f_topk_nostem_table(sf),
        # Dirichlet query-likelihood ranking (collection-frequency
        # language model) — rank-only, value-exact
        "ql_topk_nostem":
            lambda sf: flagship.ql_topk_nostem_table(sf),
        # Jelinek-Mercer query likelihood (linear interpolation) — the
        # fourth ranked scorer, rank-only, value-exact
        # per-term query boosts (Lucene term^b) with boost-scaled
        # block-max pruning — rank-only, value-exact
        "boosted_bm25_nostem":
            lambda sf: flagship.boosted_bm25_nostem_table(sf),
        # numeric field index (Lucene points/doc-values analog):
        # range atoms in the query language answered by manifest +
        # row-group-statistics pruned reads over a value-sorted layout
        "range_filter_match":
            lambda sf: flagship.range_filter_match_table(sf),
        # match sets ordered by a numeric field (doc-values gather)
        "sorted_match": lambda sf: flagship.sorted_match_table(sf),
        # numeric aggregations (count/sum/min/max/avg) per match set
        "field_stats_match":
            lambda sf: flagship.field_stats_match_table(sf),
        # forward index: per-doc term vectors (the doc-major transpose
        # of the postings, derived by a distributed decode pass — never
        # re-tokenizing), pruned row-group reads per doc set
        "term_vectors": lambda sf: flagship.term_vectors_table(sf),
        # index-time stopwords (Lucene StopFilter semantics: dropped
        # from postings AND doc_len) — the stopword machinery itself on
        # the value-exact gate via the identity-stemmer build
        "stopword_match": lambda sf: flagship.stopword_match_table(sf),
        # value-exact oracles never sampled in r1-r3
        "asof_join": lambda sf: _events_mod().asof_join_prior(_events(sf)),
        "range_join": lambda sf: _events_mod().range_join_count(
            _events(sf)),
        "float_quantiles": lambda sf: _events_mod().exact_value_quantiles(
            _events(sf)),
        "training_prep": _training_prep,
        "winnow_fingerprints": lambda sf: textstats.winnow_fingerprint_sets(
            _docs(sf)),
        # delete_docs visibility on the value-exact gate (r4): nostem
        # match over an index with a fixed tombstone set
        "deleted_match_nostem":
            lambda sf: flagship.deleted_match_nostem_table(sf),
        # r4 query-algebra extensions over the nostem index, all
        # value-exact: minimum-should-match (the OR..AND dial), fuzzy
        # Levenshtein-≤d match (length-band vocab prune + banded DP vs
        # DuckDB levenshtein()), '*suffix' / '*infix*' wildcard sweeps
        # (vectorized vocab scans vs SQL LIKE), a second ranked scorer
        # (classic ln(N/df)·(1+ln tf), rank-only), and faceted match
        # counts (broadcast match sets + per-batch partial counts +
        # tiny groupby — the pre-aggregate shuffle shape)
        "minshould_match": lambda sf: flagship.minshould_match_table(sf),
        "fuzzy_match_nostem":
            lambda sf: flagship.fuzzy_match_nostem_table(sf),
        # same fuzzy queries from the persisted SymSpell deletion-
        # neighborhood index (O(len^d) pushdown probes — the
        # extreme-vocabulary scale path), same levenshtein() oracle
        "fuzzy_match_indexed":
            lambda sf: flagship.fuzzy_match_indexed_table(sf),
        "suffix_match_nostem":
            lambda sf: flagship.suffix_match_nostem_table(sf),
        # the same leading wildcards answered from the reversed-term
        # dictionary (O(log V) range scan — the documented scale path),
        # same LIKE oracle
        "suffix_match_indexed":
            lambda sf: flagship.suffix_match_indexed_table(sf),
        "tfidf_topk_nostem": lambda sf: flagship.tfidf_topk_nostem_table(sf),
        # search-after pagination: page 2 (ranks k+1..2k) fetched via the
        # exact (score desc, doc_id asc) cursor, vs the rank-windowed
        # oracle — proves the cursor reproduces the global ordering
        "bm25_page2_nostem": lambda sf: flagship.bm25_page2_nostem_table(sf),
        # filter + rank: BM25 restricted to a boolean-expression match
        # set (scores unchanged, candidates filtered), rank-only
        "bm25_filtered_nostem":
            lambda sf: flagship.bm25_filtered_nostem_table(sf),
        # reciprocal-rank fusion of the two ranked scorers (the
        # multi-list ensemble shape hybrid search uses), rank-only
        "rrf_fusion_nostem":
            lambda sf: flagship.rrf_fusion_nostem_table(sf),
        # hybrid lexical+dense retrieval: RRF of BM25 and exact cosine
        # lists over the shared doc_id ≡ vec_id space — rank-only,
        # value-exact (pipelines/flagship.py::hybrid_rrf_table)
        "hybrid_rrf":
            lambda sf: flagship.hybrid_rrf_table(sf, ANN_QUERY_IDS),
        # "did you mean": (distance asc, df desc, term asc) corrections
        "spell_correct": lambda sf: flagship.spell_correct_table(sf),
        # "related searches": top co-occurring terms within each query's
        # match set — broadcast match ids, one corpus pass of partial
        # (query, term, df) counts, vocab-bounded groupby + per-query
        # map_groups top-k (the corpus never shuffles)
        "related_terms": lambda sf: flagship.related_terms_table(sf),
        "faceted_match_counts":
            lambda sf: flagship.faceted_match_counts_table(sf),
        # Lucene-ish boolean query language (querylang.py): AND/OR/NOT,
        # parens, wildcards, fuzzy ~d, quoted phrases — compiled onto
        # the searcher algebra, vs handcrafted set-op SQL mirrors
        "boolean_expr_match":
            lambda sf: flagship.boolean_expr_match_table(sf),
        # metadata field filters (lang:en, source:src1*) from the
        # facet-as-term metadata index, composed with content terms
        "field_filter_match":
            lambda sf: flagship.field_filter_match_table(sf),
        # query-time synonym expansion (index stays synonym-free)
        "synonym_match": lambda sf: flagship.synonym_match_table(sf),
        # sequence packing: the concat-and-chunk training layout — one
        # (doc, seq) overlap row per boundary crossing; distributed
        # exclusive scan (only the tiny counts table shuffles)
        "pack_sequences": lambda sf: _packing().pack_token_spans(
            _docs(sf), seq_len=64),
        # ---- late-r4 additions, all value-exact ----
        # bulk (set-at-a-time) execution: the query set streams as a
        # DATASET through a BulkSearcher actor pool (searcher built once
        # per actor, query-partitioned parallelism) — same lowercase-
        # token oracle shape as boolean_match_nostem, bulk workload
        # the same pool in bm25 mode over the nostem BM25 query set —
        # rank-only, reuses the rank-CTE oracle verbatim
        "bulk_bm25_topk_nostem":
            lambda sf: flagship.bulk_bm25_topk_table(sf),
        # regex vocabulary match: one vectorized match_substring_regex
        # sweep over the sorted vocab (RE2 both sides), postings union
        "regex_match_nostem":
            lambda sf: flagship.regex_match_nostem_table(sf),
        # persisted trigram dictionary (pg_trgm / Cox code-search shape):
        # infix wildcards as O(#grams) hashed probes + candidate verify,
        # regex through required-literal-factor pruning — the documented
        # scale paths for the two sweeps above, on the same LIKE /
        # regexp_matches oracle shapes
        "infix_match_trigram":
            lambda sf: flagship.infix_match_trigram_table(sf),
        "regex_match_trigram":
            lambda sf: flagship.regex_match_trigram_table(sf),
        # more-like-this: seed doc's top-m tf·ln(N/df) terms → BM25 with
        # the seed excluded; rank-only vs a composed DuckDB oracle
        "mlt_topk_nostem": lambda sf: flagship.mlt_topk_nostem_table(sf),
        # field-collapsed top-k: best doc per lang per query, re-ranked —
        # the search-result diversification shape, rank-only
        "collapsed_topk_nostem":
            lambda sf: flagship.collapsed_topk_nostem_table(sf),
        # out-of-vocabulary rate vs the corpus's top-V vocabulary
        # (distributed top-V via partial counts + vocab-sized groupby +
        # sort/limit; one exact integer division → value-exact floats)
        "oov_rate": lambda sf: textstats.oov_rate(_docs(sf), top_v=16),
        # IVF with nprobe = n_centroids scans every cell → EXACT, so the
        # whole IVF machinery (distributed Lloyd, assignment, probe
        # routing, per-cell top-k merge) sits on the value-exact gate
        # with the brute-force oracle (same nostem trick, ANN edition);
        # the approximate nprobe<cells path stays rows-only below
        "ann_ivf_exhaustive": lambda sf: ann.ivf_topk(
            _emb(sf), ANN_QUERY_IDS, k=ANN_K, n_centroids=8,
            nprobe=8).select_columns(["query_id", "rank", "vec_id"]),
        # PQ with refine·k ≥ N rescores every vector exactly → the whole
        # compressed-scan pipeline (codebook training, m-byte encode,
        # ADC LUT scan, candidate merge, exact refine) on the
        # value-exact gate; the approximate refine=4 path stays
        # rows-only below
        "pq_exhaustive_refine": lambda sf: ann.pq_topk(
            _emb(sf), ANN_QUERY_IDS, k=ANN_K, m=4, ksub=16,
            refine=50).select_columns(["query_id", "rank", "vec_id"]),
        # probed kNN join with nprobe ≥ #cells runs the full block-pair
        # grid → exact → shares the knn_join oracle; exercises the cell
        # routing + pair pruning machinery value-exactly
        "knn_join_probed_exhaustive": lambda sf: ann.knn_join(
            _emb(sf), k=5, block_rows=128, nprobe=99).select_columns(
                ["vec_id", "rank", "neighbor_id"]),
        # rows-only entries never sampled in r1-r3 (approximate by
        # nature; pytest pins recall on clustered fixtures)
        # beam search runs in full-index mode: adjacency AND vectors in
        # bucket-partitioned layouts (write_graph_index /
        # write_vector_index) — every hop is pruned reads of the
        # frontier's and candidates' buckets, result identical to the
        # Dataset-scan mode (pytest-pinned)
        "graph_search": lambda sf: ann.graph_search_topk(
            ann.write_vector_index(
                _emb(sf),
                __import__("tempfile").mkdtemp(prefix="graft_vec_idx_")),
            ann.write_graph_index(
                ann.knn_join(_emb(sf), k=5, block_rows=128),
                __import__("tempfile").mkdtemp(prefix="graft_graph_idx_")),
            ANN_QUERY_IDS, k=ANN_K).select_columns(
                ["query_id", "rank", "vec_id"]),
        # exactness-configuration gate for the beam (r5, VERDICT #7): a
        # COMPLETE graph (k = N-1) makes one hop visit every vector, so
        # beam top-k ≡ brute force — value-exact over the SAME
        # bucket-pruned written layouts the approximate entry drives
        "graph_search_exhaustive": _graph_search_exhaustive,
        "knn_graph": lambda sf: ann.knn_graph_descent(
            _emb(sf), k=5, iters=2).select_columns(
                ["vec_id", "rank", "neighbor_id"]),
        # PQ compressed-scan ANN (r4): m-byte codes + ADC LUT scan +
        # exact refine (approximate by construction; recall pytest)
        "embedding_near_dup_lsh": lambda sf: ann.embedding_near_dup_pairs_lsh(
            _emb(sf), threshold=0.45).select_columns(["id_a", "id_b"]),
        # -- inverted index / BM25 (stemmed → rows-only; pytest oracle
        #    covers rank/score identity) --
        "bm25_topk": lambda sf: flagship.bm25_topk_table(sf),
        "bm25_topk_served": lambda sf: flagship.bm25_topk_served_table(sf),
        "boolean_match": lambda sf: flagship.boolean_match_table(sf),
        "index_statistics": lambda sf: flagship.index_statistics_table(sf),
        # -- identity-stemmer index mode: the SAME distributed
        #    build→spill→merge→decode→match machinery with stemming
        #    replaced by lower(), which makes it ANSI-SQL-expressible and
        #    puts the flagship core on the value-exact gate (VERDICT r2 #1)
        "boolean_match_nostem":
            lambda sf: flagship.boolean_match_nostem_table(sf),
        "index_statistics_nostem":
            lambda sf: flagship.index_statistics_nostem_table(sf),
        # -- POSITIONAL index: phrase / proximity answered from persisted
        #    delta-varint positional postings (bucket-pruned, term-filter-
        #    pushed reads), value-exact vs a parallel-unnest DuckDB oracle
        "phrase_match_indexed":
            lambda sf: flagship.phrase_match_indexed_table(sf),
        "proximity_match": lambda sf: flagship.proximity_match_table(sf),
        "ordered_proximity_match":
            lambda sf: flagship.ordered_proximity_match_table(sf),
        # wildcard prefix queries: sorted-vocab range scan on the nostem
        # index, value-exact vs a SQL LIKE oracle
        "prefix_match_nostem":
            lambda sf: flagship.prefix_match_nostem_table(sf),
        # conjunctive (AND) / include-minus-exclude (NOT) boolean shapes
        # and df-ranked autocomplete — all on the nostem index, all
        # value-exact
        "conjunctive_match": lambda sf: flagship.conjunctive_match_table(sf),
        "andnot_match": lambda sf: flagship.andnot_match_table(sf),
        "suggest_terms": lambda sf: flagship.suggest_table(sf),
        # -- SQL-checked text analysis --
        "token_counts": lambda sf: textstats.token_counts(_docs(sf)),
        "doc_stats_by_lang": lambda sf: textstats.doc_stats_by_lang(_docs(sf)),
        "term_df_tf": lambda sf: textstats.term_df_tf(_docs(sf)),
        "top_terms": lambda sf: textstats.top_terms(_docs(sf), TOP_TERMS_K),
        "top_terms_by_lang": lambda sf: textstats.top_terms_by_lang(
            _docs(sf), k=5),
        "quality_scores": lambda sf: textstats.quality_scores(_docs(sf)),
        "bpe_token_counts": lambda sf: textstats.bpe_token_counts(_docs(sf)),
        # -- BPE tokenizer training/encoding (functions/bpe.py) --
        "bpe_top_pairs": _bpe_top_pairs,
        "bpe_first_merge": _bpe_first_merge,
        "bpe_encode_zero": _bpe_encode_zero,
        # multi-merge training is iterative (no SQL analog) → rows-only;
        # pytest pins the incremental trainer vs a naive reference
        "bpe_merges": _bpe_merges,
        "bpe_encode_trained": _bpe_encode_trained,
        "fingerprints": lambda sf: textstats.fingerprints(_docs(sf)),
        "repetition_scores": lambda sf: textstats.repetition_scores(
            _docs(sf)),
        # Shannon unigram entropy (information-density quality signal):
        # the float crosses the gate via the LM family's ordered-fold
        # convention (strict left fold over terms in byte order)
        "unigram_entropy": lambda sf: textstats.unigram_entropy(
            _docs(sf)),
        "length_quantile_filter": lambda sf:
            textstats.filter_by_token_quantile(_docs(sf), lo=0.1, hi=0.9),
        "commonness_scores": lambda sf: textstats.commonness_scores(
            _docs(sf)),
        # HLL vocabulary cardinality (approximate by nature → rows-only;
        # <5% accuracy asserted in pytest at 50k+ true cardinality)
        # bounded-state Misra-Gries top-k with exact re-count (candidate
        # selection is batch-boundary-dependent → rows-only; pytest pins
        # equality with exact top-k on a high-vocab corpus)
        "heavy_hitters": _heavy_hitters,
        # Count-Min point-frequency sketch: the oracle computes the SAME
        # sketch in SQL (integer counter sums + min over rows), so the
        # distributed partial-merge is value-exact; width ≪ vocab makes
        # collisions (and the min) real
        "cms_counts": _cms_counts,
        "doc_top_terms": lambda sf: textstats.doc_top_terms(_docs(sf), k=3),
        "df_histogram": lambda sf: textstats.df_histogram(_docs(sf)),
        # -- corpus n-gram family --
        "ngram_counts": _ngram_counts,
        # TextRank corpus keywords: flat-teleport PageRank over the
        # window-2 co-occurrence multigraph; the FLOAT scores cross the
        # gate (unrolled-iterations oracle, ordered folds)
        "textrank_keywords": _textrank,
        "phrase_match": _phrase_match,
        "dup_ngram_fraction": _dup_ngram_fraction,
        "cooccurrence_counts": _cooccurrence_counts,
        # -- training-data hygiene --
        "dataset_split": _dataset_split,
        "decontaminate": _decontaminate,
        "decontaminate_bloom": _decontaminate_bloom,
        "stratified_sample": _stratified_sample,
        "upsample_by_weight": _upsample_by_weight,
        "deterministic_shuffle": _deterministic_shuffle,
        "sample_exact_k": _sample_exact_k,
        "scrub_pii": _scrub_pii,
        "chunk_documents": _chunk_documents,
        # -- dedup --
        "exact_dedup": lambda sf: dedup.exact_dedup_groups(_docs(sf)),
        "minhash_dedup": lambda sf: dedup.minhash_dedup_pairs(
            _docs(sf), threshold=0.5),
        "simhash_near_dup": lambda sf: dedup.simhash_near_dup_pairs(_docs(sf)),
        "ngram_jaccard": lambda sf: dedup.ngram_jaccard_pairs(
            _docs(sf), shingle_k=3, threshold=NGRAM_JACCARD_T),
        # asymmetric containment |A∩B|/min(|A|,|B|): the quote/subset
        # detector (Broder's resemblance-vs-containment distinction);
        # shares the inverted-shingle intersection machinery
        "ngram_containment": lambda sf: dedup.ngram_containment_pairs(
            _docs(sf), shingle_k=3, threshold=NGRAM_CONTAIN_T),
        # near-dup pairs → clusters via distributed hash-to-min label
        # propagation (component = min doc_id, checked against a
        # recursive-CTE transitive closure)
        "dedup_clusters": _dedup_clusters,
        "cluster_canonicals": _cluster_canonicals,
        # -- similarity search --
        "ann_topk": ann_topk,
        "embedding_near_dup": near_dup,
        # exact self kNN join (full block grid, small block_rows so the
        # gate actually exercises the multi-block path + centroid spill)
        "knn_join": lambda sf: ann.knn_join(
            _emb(sf), k=5, block_rows=128).select_columns(
                ["vec_id", "rank", "neighbor_id"]),
        # -- misc text analysis (heuristic → rows-only) --
        "language_id": lambda sf: textstats.language_id(_docs(sf)),
        # dictionary tagging: non-overlapping multi-phrase substring
        # counts, one vectorized count_substring sweep per phrase
        # (Aho-Corasick automaton actor = the 10^5-pattern scale path)
        "phrase_dictionary": lambda sf: textstats.phrase_counts(
            _docs(sf), PHRASE_DICT).sort(["doc_id", "phrase"]),
        "rolling_fingerprints": lambda sf: textstats.rolling_fingerprints(
            _docs(sf)),
        # -- relational shapes over the TPC-H-ish tables --
        "pricing_summary": _pricing_summary,
        "revenue_by_nation": _revenue_by_nation,
        # GROUP BY ROLLUP(nation, mktsegment): one fact pass computes
        # only the FINEST aggregate (additive measure), coarser levels
        # derive from the enum-bounded result; 'ALL' super-aggregate
        # markers on both sides (functions/relational.py::revenue_rollup)
        "revenue_rollup": lambda sf: _rel_mod().revenue_rollup(sf),
        "customers_without_big_orders": lambda sf:
            _rel_mod().customers_without_big_orders(sf),
        "running_totals": lambda sf: _rel_mod().running_totals(sf),
        # TPC-H Q3 shape: the fact-fact inner equi-join (orders and
        # lineitem co-partitioned by orderkey) + broadcast segment
        # semijoin + per-partition top-k merge
        "top_orders_q3": lambda sf: _rel_mod().top_orders_by_revenue(sf),
        # TPC-H Q18 shape: aggregate + HAVING + join-back on the SAME
        # key in one orderkey co-partition (no separate aggregate
        # shuffle)
        "big_volume_q18": lambda sf: _rel_mod().big_volume_orders(
            sf).sort("o_orderkey"),
        # TPC-H Q13 shape: LEFT OUTER join as a coarse custkey
        # union-shuffle + per-partition searchsorted counts (the zero
        # bucket is the null-extension), then a tiny histogram groupby
        "custdist_q13": lambda sf: _rel_mod().order_count_distribution(
            sf).sort("c_count"),
        # Pareto frontier (max price, min orderdate): distributive
        # per-block local skylines + one final merge pass — no value
        # arithmetic, the float price column crosses the gate verbatim
        "orders_skyline": lambda sf: _rel_mod().orders_skyline(sf),
        # -- stream-shaped windowed operators over the events log --
        "tumbling_window": lambda sf: _events_mod().tumbling_window_agg(
            _events(sf), window_sec=3600),
        "sessionize": lambda sf: _events_mod().sessionize(
            _events(sf), gap_sec=1800),
        "hopping_window": lambda sf: _events_mod().hopping_window_agg(
            _events(sf), window_sec=3600, hop_sec=900),
        "value_percentiles": lambda sf: _events_mod().event_value_percentiles(
            _events(sf)),
        # strict-chaining funnel: per-user earliest-event chain via one
        # user-hash shuffle + vectorized minimum.at scatter per step
        "funnel_steps": lambda sf: _events_mod().funnel_counts(
            _events(sf)).sort("step_idx"),
        # cohort retention: first-touch week + distinct active weeks
        # from the same co-located partition scan
        "cohort_retention": lambda sf: _events_mod().cohort_retention(
            _events(sf)).sort(["cohort_week", "week_offset"]),
        # per-event-type OLS of value on time via exact int64 sufficient
        # statistics — slope/intercept/Pearson-r floats are value-exact
        "group_ols": lambda sf: _events_mod().group_ols(
            _events(sf)).sort("event_type"),
        # per-type z-score feature normalization: broadcast exact
        # moments → one shuffle-free per-row map; z floats value-exact
        "zscore_normalize": lambda sf: _events_mod().zscore_normalize(
            _events(sf)).sort("event_id"),
        # Markov flow analysis: the LAG-window shape — per-partition
        # sort + shift-compare pair counts, tiny |types|² merge
        "event_transitions": lambda sf: _events_mod().event_transitions(
            _events(sf)).sort(["prev_type", "next_type"]),
        # ordered per-group string aggregation (string_agg ... order by):
        # vectorized ListArray offsets + one binary_join per partition
        "event_sequences": lambda sf: _events_mod().user_event_sequences(
            _events(sf)).sort("user_id"),
        # join-size estimation WITHOUT executing the join: CMS inner
        # product (AMS-style), overestimate-only, min over depth —
        # value-exact because the oracle computes the same sketches
        "cms_join_size": lambda sf: _cms_join_size(sf),
        # per-group HLL distinct estimates, VALUE-EXACT (registers and
        # float estimate shapes reproduced in SQL — the cms_counts
        # trick, HLL edition; upgrades the rows-only HLL family)
        "hll_distinct_by_lang": lambda sf:
            _sketches_mod().hll_distinct_by_group(_docs(sf), p=HLL_P),
        # HLL set algebra: union = register-wise max (mergeability),
        # intersection by inclusion-exclusion — approximate answers,
        # exactly reproducible (same registers + float shapes in SQL)
        "hll_set_ops_lang": lambda sf: _sketches_mod().hll_set_ops(
            _docs(sf), "lang", "en", "de", p=HLL_P),
        # warehouse PIVOT: (week × event_type) counts cross-tabbed into
        # one count column per type over the enum-bounded result
        "pivot_weekly": lambda sf: _events_mod().pivot_weekly_counts(
            _events(sf)),
        # -- typefilter capability family (AST semantics → rows-only;
        #    fidelity covered by tests/test_typefilter.py goldens) --
        "prune_types": _prune_types,
        "validate_carts": _validate_carts,
        "normalize_carts": _normalize_carts,
        # -- multimodal plumbing (stubbed codecs, deterministic fake) --
        "decode_media": _decode_media,
        # -- composed curation pipeline (quality → exact dedup →
        #    minhash near-dup → language), per-stage drop report --
        "curation_report": _curation_report,
    }
    return _prioritize(out)


def _pricing_summary(sf_dir: str):
    from ts_type_filter_ray.functions.relational import pricing_summary
    return pricing_summary(sf_dir)


def _revenue_by_nation(sf_dir: str):
    from ts_type_filter_ray.functions.relational import revenue_by_nation
    return revenue_by_nation(sf_dir)


def _dataset_split(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import dataset_split
    return dataset_split(_docs(sf_dir))


def _decontaminate(sf_dir: str):
    from ts_type_filter_ray.functions.decontam import decontaminate
    return decontaminate(_docs(sf_dir), bench_mod=50, shingle_k=3)


def _decontaminate_bloom(sf_dir: str):
    from ts_type_filter_ray.functions.decontam import decontaminate_bloom
    return decontaminate_bloom(_docs(sf_dir), bench_mod=50, shingle_k=3)


def _stratified_sample(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import stratified_sample
    return stratified_sample(
        _docs(sf_dir), {"en": 0.8, "de": 0.5, "zh": 0.25},
        default_rate=0.1)


def _deterministic_shuffle(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import deterministic_shuffle
    return deterministic_shuffle(_docs(sf_dir))


def _upsample_by_weight(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import upsample_by_weight
    return upsample_by_weight(
        _docs(sf_dir), {"src0": 3, "src1": 0, "src2": 2},
        default_weight=1)


def _scrub_pii(sf_dir: str):
    from ts_type_filter_ray.functions.scrub import scrub_pii
    return scrub_pii(_docs(sf_dir))


def _chunk_documents(sf_dir: str):
    from ts_type_filter_ray.functions.chunking import chunk_documents
    return chunk_documents(_docs(sf_dir), chunk_len=32)


#: phrases for the phrase-containment gate entry — common synthetic-
#: corpus collocations plus one guaranteed miss (static so the SQL
#: oracle embeds the identical list)
PHRASE_SET = ["order fast", "agg part filter", "zz qq never_present"]
NGRAM_N = 2
SAMPLE_K = 100
STRATUM_K = 20


def _ngram_counts(sf_dir: str):
    from ts_type_filter_ray.functions.ngrams import ngram_counts
    return ngram_counts(_docs(sf_dir), n=NGRAM_N, k=TOP_TERMS_K)


def _phrase_match(sf_dir: str):
    from ts_type_filter_ray.functions.ngrams import phrase_match
    return phrase_match(_docs(sf_dir), PHRASE_SET)


def _dup_ngram_fraction(sf_dir: str):
    from ts_type_filter_ray.functions.ngrams import dup_ngram_fraction
    return dup_ngram_fraction(_docs(sf_dir), shingle_k=3)


def _cooccurrence_counts(sf_dir: str):
    from ts_type_filter_ray.functions.ngrams import cooccurrence_counts
    # max_doc_terms exercises the per-doc pair-emission cap on the gate;
    # 100k is far above any sf doc's surviving vocabulary, so the cap is
    # a no-op here and the result stays value-exact vs the SQL oracle
    return cooccurrence_counts(_docs(sf_dir), min_df=2, min_count=2,
                               k=TOP_TERMS_K * 2, max_doc_terms=100_000)


def _sample_exact_k(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import sample_exact_k
    return sample_exact_k(_docs(sf_dir), k=SAMPLE_K)


def _weighted_sample_k(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import weighted_sample_k
    return weighted_sample_k(_docs(sf_dir), k=SAMPLE_K,
                             weight_col="n_chars")


def _sample_per_stratum(sf_dir: str):
    from ts_type_filter_ray.functions.sampling import sample_per_stratum
    return sample_per_stratum(_docs(sf_dir), k=STRATUM_K,
                              strata_col="lang")


def _dedup_clusters(sf_dir: str):
    from ts_type_filter_ray.functions import dedup
    from ts_type_filter_ray.functions.graph import connected_components
    docs = _docs(sf_dir)
    edges = dedup.ngram_jaccard_pairs(docs, shingle_k=3,
                                      threshold=NGRAM_JACCARD_T)
    return connected_components(docs, edges)


def _cluster_canonicals(sf_dir: str):
    from ts_type_filter_ray.functions import dedup, textstats
    from ts_type_filter_ray.functions.graph import (cluster_canonicals,
                                                    connected_components)
    docs = _docs(sf_dir)
    edges = dedup.ngram_jaccard_pairs(docs, shingle_k=3,
                                      threshold=NGRAM_JACCARD_T)
    return cluster_canonicals(connected_components(docs, edges),
                              textstats.token_counts(docs))



def _heavy_hitters(sf_dir: str):
    from ts_type_filter_ray.functions.sketches import heavy_hitters
    return heavy_hitters(_docs(sf_dir), k=10)


def _training_prep(sf_dir: str):
    from ts_type_filter_ray.pipelines.prep import training_prep_report
    return training_prep_report(_docs(sf_dir))


def _curation_report(sf_dir: str):
    from ts_type_filter_ray.pipelines.curation import curation_report_table
    return curation_report_table(sf_dir, keep_langs=("en", "und"))


def _prune_types(sf_dir: str):
    # r5: value-exact against the REFERENCE's own conformance goldens
    # (/root/reference/tests/test_type_filter.py:30-159) — the oracle
    # embeds the reference's expected pruned lines as SQL literals, so
    # the whole parse → index → filter → serialize path is string-
    # compared against published reference behavior
    import pyarrow as _pa
    import ray.data as rd

    from ts_type_filter_ray.sources.typefixtures import prune_golden_table
    from ts_type_filter_ray.typefilter import PruneTypesStage

    def explode_lines(batch: _pa.Table) -> _pa.Table:
        import numpy as _np
        import pyarrow.compute as _pc
        split = _pc.split_pattern(batch["pruned"], "\n")
        n = _pc.list_value_length(split).to_numpy(zero_copy_only=False)
        ids = _np.repeat(
            batch["case_id"].to_numpy(zero_copy_only=False), n)
        return _pa.table({
            "case_id": _pa.array(ids, type=_pa.int64()),
            "line": _pc.list_flatten(split),
        })

    return (rd.from_arrow(prune_golden_table())
            .map_batches(PruneTypesStage, batch_format="pyarrow",
                         concurrency=2)
            .map_batches(explode_lines, batch_format="pyarrow"))


def _validate_carts(sf_dir: str):
    # r5: value-exact — expected verdicts mirror the reference
    # validator's semantics (/root/reference/ts_type_filter/
    # validator2.py:18-266, tests/test_validator.py)
    import ray.data as rd

    from ts_type_filter_ray.sources.typefixtures import (
        VALIDATE_GRAPH_SOURCE, validate_golden_table)
    from ts_type_filter_ray.typefilter.validator import ValidateCartsStage
    return rd.from_arrow(validate_golden_table()).map_batches(
        ValidateCartsStage,
        fn_constructor_args=(VALIDATE_GRAPH_SOURCE, "Cart"),
        batch_format="pyarrow",
        concurrency=2).select_columns(["cart_id", "valid"])


def _graph_search_exhaustive(sf_dir: str):
    import tempfile

    from ts_type_filter_ray.functions import ann
    emb = _emb(sf_dir)
    n = emb.count()
    complete = ann.knn_join(emb, k=n - 1, block_rows=256)
    return ann.graph_search_topk(
        ann.write_vector_index(
            _emb(sf_dir), tempfile.mkdtemp(prefix="graft_vec_idx_ex_")),
        ann.write_graph_index(
            complete, tempfile.mkdtemp(prefix="graft_graph_idx_ex_")),
        ANN_QUERY_IDS, k=ANN_K, ef=max(64, ANN_K),
        num_hops=1).select_columns(["query_id", "rank", "vec_id"])


def _normalize_carts(sf_dir: str):
    # r5: value-exact — expected canonical JSON mirrors the reference
    # normalizer (/root/reference/ts_type_filter/normalize.py:287-370)
    import ray.data as rd

    from ts_type_filter_ray.sources.typefixtures import (
        NORMALIZE_GRAPH_SOURCE, normalize_golden_table)
    from ts_type_filter_ray.typefilter import parse
    from ts_type_filter_ray.typefilter.normalize import (NormalizeCartsStage,
                                                         create_normalizer_spec)
    spec = create_normalizer_spec(parse(NORMALIZE_GRAPH_SOURCE))
    return rd.from_arrow(normalize_golden_table()).map_batches(
        NormalizeCartsStage, fn_constructor_args=(spec,),
        batch_format="pyarrow",
        concurrency=2).select_columns(["cart_id", "normalized"])


def _decode_media(sf_dir: str):
    import ray.data as rd

    from ts_type_filter_ray.functions.multimodal import (FakeDecoder,
                                                         decode_media,
                                                         synthesize_media_table)
    return decode_media(rd.from_arrow(synthesize_media_table(96)),
                        decoder=FakeDecoder(), batch_size=16, concurrency=2)




def oracle_sql() -> dict[str, str]:
    from ts_type_filter_ray.functions.events import (HOPPING_SQL,
                                                     SESSIONIZE_SQL,
                                                     TUMBLING_HOUR_SQL)
    from ts_type_filter_ray.functions.textstats import _LANG_MARKERS
    from ts_type_filter_ray.functions.scrub import (EMAIL_RE as _EMAIL_RE,
                                                    IPV4_RE as _IPV4_RE)
    stop = "('the','and','of','a','to','in','is','it','that','for')"
    qids = "(" + ",".join(map(str, ANN_QUERY_IDS)) + ")"

    def _inlist(words):
        return "(" + ",".join(f"'{w}'" for w in sorted(words)) + ")"

    langs = sorted(_LANG_MARKERS)  # de,en,es,fr — engine tie-break order
    lang_counts = ",\n".join(
        f"sum(case when tok in {_inlist(_LANG_MARKERS[lang])} then 1 "
        f"else 0 end) as c_{lang}" for lang in langs)
    lang_max = "greatest(" + ",".join(f"c.c_{lang}" for lang in langs) + ")"
    lang_pick = "\n".join(
        f"when c.c_{lang} = m then '{lang}'" for lang in langs[:-1])

    # B^e mod p constants for the rolling-fingerprint oracle
    _P = (1 << 61) - 1
    _B = 1000003
    pw_rows = ",".join(
        f"({e},{pow(_B, e, _P)}::HUGEINT)" for e in range(16))
    dot = ("list_sum(list_transform(range(1, len({a}.embedding)+1), "
           "i -> {a}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE))")

    # shared by "ngram_jaccard" and (as the edge set) "dedup_clusters"
    ngram_pairs_sql = rf"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            sh as (
              select distinct doc_id, g from (
                select doc_id,
                       arr[p] || ' ' || arr[p+1] || ' ' || arr[p+2] as g
                from (select doc_id, arr,
                             unnest(range(1, len(arr)-1))::INT as p
                      from base where len(arr) >= 3)
                union all
                select doc_id, array_to_string(arr, ' ') as g
                from base where len(arr) < 3)),
            sz as (select doc_id, count(*) as n from sh group by doc_id),
            inter as (
              select a.doc_id as id_a, b.doc_id as id_b, count(*) as i
              from sh a join sh b on a.g = b.g and a.doc_id < b.doc_id
              group by 1, 2)
            select i.id_a, i.id_b,
                   i.i::DOUBLE / (sa.n + sb.n - i.i) as jaccard
            from inter i
            join sz sa on sa.doc_id = i.id_a
            join sz sb on sb.doc_id = i.id_b
            where i.i::DOUBLE / (sa.n + sb.n - i.i) >= {NGRAM_JACCARD_T}"""

    # (query_idx, term) VALUES rows for the identity-stemmer boolean-match
    # oracle, derived from the SAME query set + breaker + stemmer the
    # engine path uses (constants at plan time, like the lang markers)
    from ts_type_filter_ray.pipelines.flagship import (DELETED_DOC_IDS,
                                                       NOSTEM_QUERY_SET,
                                                       identity_stemmer)
    from ts_type_filter_ray.pipelines.query import query_stems
    nostem_rows = ",".join(
        f"({qi},'{t}')" for qi, q in enumerate(NOSTEM_QUERY_SET)
        for t in query_stems(q, stemmer=identity_stemmer))
    deleted_ids = ",".join(str(d) for d in DELETED_DOC_IDS)

    # positional-index oracles: one (doc_id, term, pos) relation via
    # DuckDB's zipped parallel unnest, then per-phrase adjacency joins /
    # per-pair |Δpos| ≤ w joins generated from the SAME constant sets the
    # engine path answers (pipelines/flagship.py)
    from ts_type_filter_ray.pipelines.flagship import (PHRASE_INDEX_SET,
                                                       PROXIMITY_SET)
    pos_tok_cte = r"""
            with tok as (
              select doc_id, unnest(toks) as term,
                     unnest(range(len(toks)))::BIGINT as pos
              from (select doc_id,
                           regexp_split_to_array(lower(trim(text)),'\s+')
                           as toks
                    from documents where trim(text) <> ''))"""
    phrase_branches = []
    for i, p in enumerate(PHRASE_INDEX_SET):
        toks = p.lower().split()
        joins = "".join(
            f" join tok t{j} on t{j}.doc_id = t0.doc_id"
            f" and t{j}.pos = t0.pos + {j}" for j in range(1, len(toks)))
        conds = " and ".join(
            f"t{j}.term = '{t}'" for j, t in enumerate(toks))
        phrase_branches.append(
            f"select distinct cast({i} as bigint) as query_idx, t0.doc_id"
            f" from tok t0{joins} where {conds}")
    phrase_indexed_sql = (pos_tok_cte + "\n" +
                          "\nunion all\n".join(phrase_branches))
    # first-occurrence positions: min(pos) per (term, doc) over the same
    # parallel-unnest token relation
    from ts_type_filter_ray.pipelines.flagship import FIRST_POS_TERM_SET
    fpos_branches = [
        f"select cast({i} as bigint) as query_idx, doc_id,"
        f" min(pos) as first_pos from tok where term = '{t}'"
        f" group by doc_id"
        for i, t in enumerate(FIRST_POS_TERM_SET)]
    first_positions_sql = (pos_tok_cte + "\n" +
                           "\nunion all\n".join(fpos_branches))
    prox_branches = []
    for i, (ta, tb, w) in enumerate(PROXIMITY_SET):
        prox_branches.append(
            f"select distinct cast({i} as bigint) as query_idx, a.doc_id"
            f" from tok a join tok b on b.doc_id = a.doc_id"
            f" where a.term = '{ta}' and b.term = '{tb}'"
            f" and abs(a.pos - b.pos) <= {w}")
    proximity_sql = (pos_tok_cte + "\n" +
                     "\nunion all\n".join(prox_branches))
    # ordered spans: b strictly AFTER a within the window (asymmetric)
    from ts_type_filter_ray.pipelines.flagship import ORDERED_PROXIMITY_SET
    oprox_branches = []
    for i, (ta, tb, w) in enumerate(ORDERED_PROXIMITY_SET):
        oprox_branches.append(
            f"select distinct cast({i} as bigint) as query_idx, a.doc_id"
            f" from tok a join tok b on b.doc_id = a.doc_id"
            f" where a.term = '{ta}' and b.term = '{tb}'"
            f" and b.pos - a.pos between 1 and {w}")
    ordered_proximity_sql = (pos_tok_cte + "\n" +
                             "\nunion all\n".join(oprox_branches))
    # Indri #odN ordered windows: a k-way self-join chain with every
    # adjacent pair strictly increasing and within the gap — SQL's
    # EXISTS-chain is exactly the feasible-chain the engine propagates
    from ts_type_filter_ray.pipelines.flagship import ORDERED_WINDOW_SET
    ow_branches = []
    for i, (p, g) in enumerate(ORDERED_WINDOW_SET):
        toks = p.lower().split()
        joins = "".join(
            f" join tok t{j} on t{j}.doc_id = t0.doc_id"
            f" and t{j}.pos > t{j - 1}.pos"
            f" and t{j}.pos - t{j - 1}.pos <= {g}"
            for j in range(1, len(toks)))
        conds = " and ".join(
            f"t{j}.term = '{t}'" for j, t in enumerate(toks))
        ow_branches.append(
            f"select distinct cast({i} as bigint) as query_idx, t0.doc_id"
            f" from tok t0{joins} where {conds}")
    ordered_window_sql = (pos_tok_cte + "\n" +
                          "\nunion all\n".join(ow_branches))

    # percolation: one SQL branch per stored rule, mirroring the
    # streaming evaluator's per-doc boolean semantics over the same
    # whitespace-token relation (pure negation = anti-join against the
    # documents universe; field/range leaves read the doc's own columns)
    def _perc(rule_id: str, body: str) -> str:
        return (f"select '{rule_id}' as query_id, doc_id from ({body})")

    _term = ("select distinct doc_id from tok where term = '{}'").format
    perc_branches = [
        _perc("p_and",
              f"{_term('order')} intersect {_term('batch')}"),
        _perc("p_andnot",
              f"{_term('order')} except {_term('window')}"),
        _perc("p_or", f"{_term('spark')} union {_term('window')}"),
        _perc("p_not",
              "select d.doc_id from documents d where not exists "
              "(select 1 from tok where tok.doc_id = d.doc_id "
              "and term = 'order')"),
        _perc("p_phrase",
              "select distinct t0.doc_id from tok t0 join tok t1 on "
              "t1.doc_id = t0.doc_id and t1.pos = t0.pos + 1 "
              "where t0.term = 'order' and t1.term = 'fast' "
              "union "
              "select distinct t0.doc_id from tok t0 "
              "join tok t1 on t1.doc_id = t0.doc_id and "
              "t1.pos = t0.pos + 1 "
              "join tok t2 on t2.doc_id = t0.doc_id and "
              "t2.pos = t0.pos + 2 "
              "where t0.term = 'merge' and t1.term = 'part' "
              "and t2.term = 'window'"),
        _perc("p_prox",
              "select distinct a.doc_id from tok a join tok b on "
              "b.doc_id = a.doc_id where a.term = 'spark' and "
              "b.term = 'window' and abs(a.pos - b.pos) <= 3"),
        _perc("p_prefix",
              "select distinct doc_id from tok where term like 'ord%' "
              f"intersect {_term('batch')}"),
        _perc("p_fuzzy",
              "select distinct doc_id from tok "
              "where levenshtein(term, 'ordr') <= 1"),
        _perc("p_field",
              "select distinct t.doc_id from tok t join documents d "
              "on d.doc_id = t.doc_id where lower(d.lang) = 'en' "
              "and t.term = 'order'"),
        _perc("p_range",
              "select distinct t.doc_id from tok t join documents d "
              "on d.doc_id = t.doc_id where d.n_chars between 200 and "
              "400 and t.term = 'batch'"),
        _perc("p_nested",
              f"({_term('order')} union {_term('batch')}) "
              f"except {_term('spark')}"),
    ]
    percolate_sql = (pos_tok_cte + "\n" +
                     "\nunion all\n".join(perc_branches))

    # BM25 rank-only oracle over the identity-stemmer index (VERDICT r3
    # #2): same Robertson formula, same (N, df, avgdl, k1=1.2, b=0.75),
    # same float64 expression shapes, and — critically — the same
    # ascending-term LEFT-FOLD accumulation order (list(... order by
    # term) + list_aggregate 'sum' is a sequential in-order fold), so
    # per-doc scores are bit-identical on both sides and the
    # (score desc, doc_id asc) rank order matches exactly, ties included.
    # Only integer (query_idx, rank, doc_id) crosses the oracle boundary.
    from ts_type_filter_ray.oracle.index import BM25_B, BM25_K1
    from ts_type_filter_ray.pipelines.flagship import (BM25_NOSTEM_K,
                                                       BM25_NOSTEM_QUERY_SET)
    bm25_rows = ",".join(
        f"({qi},'{t}')" for qi, q in enumerate(BM25_NOSTEM_QUERY_SET)
        for t in query_stems(q, stemmer=identity_stemmer))
    # ONE shared CTE stack carries both ranked scorers (bscored = BM25,
    # tscored = classic tf-idf): bm25_topk / page2 / filtered / tfidf /
    # rrf all derive from it, so each scoring formula exists in exactly
    # one place (unreferenced CTEs are pruned by DuckDB's planner).
    # Parameterized on the (query_idx, term) rows so ranked surfaces
    # with their own query sets (proximity boost) reuse the same stack.
    def _mk_rank_ctes(bm25_rows: str) -> str:
        return rf"""
            with base as (
              select doc_id,
                     case when trim(text) = '' then cast([] as varchar[])
                          else regexp_split_to_array(lower(trim(text)),'\s+')
                     end as arr
              from documents),
            dl_t as (select doc_id, len(arr)::BIGINT as dl from base),
            stats as (select count(*)::BIGINT as n,
                             coalesce(sum(dl), 0)::BIGINT as tdl from dl_t),
            tf_t as (
              select doc_id, term, count(*)::BIGINT as tf
              from (select doc_id, unnest(arr) as term from base)
              group by doc_id, term),
            df_t as (select term, count(*)::BIGINT as df
                     from tf_t group by term),
            q(query_idx, term) as (values {bm25_rows}),
            bscored as (
              select q.query_idx, t.doc_id,
                     list_aggregate(list(
                       ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * ((t.tf * ({BM25_K1} + 1.0))
                          / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                             + {BM25_B} * l.dl / (s.tdl / s.n))))
                       order by q.term asc), 'sum') as score
              from q
              join tf_t t on t.term = q.term
              join df_t d on d.term = q.term
              join dl_t l on l.doc_id = t.doc_id
              cross join stats s
              group by q.query_idx, t.doc_id),
            tscored as (
              select q.query_idx, t.doc_id,
                     list_aggregate(list(
                       ln(s.n / d.df) * (1.0 + ln(t.tf))
                       order by q.term asc), 'sum') as score
              from q
              join tf_t t on t.term = q.term
              join df_t d on d.term = q.term
              cross join stats s
              group by q.query_idx, t.doc_id)"""

    _rank_ctes = _mk_rank_ctes(bm25_rows)

    def _ranked_select(source: str, where: str) -> str:
        return rf"""
            select query_idx, rank, doc_id from (
              select query_idx, doc_id,
                     row_number() over (partition by query_idx
                                        order by score desc, doc_id asc)
                         as rank
              from {source})
            where {where}"""

    bm25_nostem_sql = _rank_ctes + _ranked_select(
        "bscored", f"rank <= {BM25_NOSTEM_K}")

    # proximity-boosted reranking: BM25 over docs containing BOTH pair
    # terms, multiplied by (1 + 1/(1 + min |pos_a - pos_b|)) — the same
    # rank CTE stack with the pair terms as its query rows, positions
    # from a parallel-unnest over the same token arrays, identical
    # float64 expression shapes (one int->double conversion, add,
    # divide, add, multiply)
    from ts_type_filter_ray.pipelines.analytics import (PROX_BOOST_K,
                                                        PROX_BOOST_PAIRS)
    pb_term_rows = ",".join(
        f"({qi},'{t}')" for qi, (a, b) in enumerate(PROX_BOOST_PAIRS)
        for t in (a, b))
    pb_pair_rows = ",".join(
        f"({qi},'{a}','{b}')"
        for qi, (a, b) in enumerate(PROX_BOOST_PAIRS))
    prox_boost_sql = (_mk_rank_ctes(pb_term_rows) + rf"""
            , ptok as (
              select doc_id, unnest(arr) as term,
                     unnest(range(len(arr)))::BIGINT as pos
              from base),
            qp(query_idx, ta, tb) as (values {pb_pair_rows}),
            pboost as (
              select qp.query_idx, a.doc_id,
                     min(abs(a.pos - b.pos))::BIGINT as mindist
              from qp
              join ptok a on a.term = qp.ta
              join ptok b on b.term = qp.tb and b.doc_id = a.doc_id
              group by qp.query_idx, a.doc_id),
            pfinal as (
              select s.query_idx, s.doc_id,
                     s.score * (1.0 + 1.0 / (1.0 + pb.mindist)) as score
              from bscored s
              join pboost pb on pb.query_idx = s.query_idx
                            and pb.doc_id = s.doc_id)"""
        + _ranked_select("pfinal", f"rank <= {PROX_BOOST_K}"))
    tfidf_nostem_sql = _rank_ctes + _ranked_select(
        "tscored", f"rank <= {BM25_NOSTEM_K}")
    # page 2 of the same ranking (search-after cursor on the engine side)
    bm25_page2_sql = _rank_ctes + _ranked_select(
        "bscored",
        f"rank > {BM25_NOSTEM_K} and rank <= {2 * BM25_NOSTEM_K}")
    # filtered ranked search: the SAME scored CTE ranked only over docs
    # matching the boolean filter expression (flagship.BM25_FILTER_EXPR
    # = 'batch AND NOT slow' — mirrored as EXCEPT)
    bm25_filtered_sql = (_rank_ctes + rf"""
            , flt as (
              select doc_id from tf_t where term = 'batch'
              except select doc_id from tf_t where term = 'slow')"""
        + _ranked_select("bscored join flt using (doc_id)",
                         f"rank <= {BM25_NOSTEM_K}"))

    # reciprocal-rank fusion of the BM25 and tf-idf top-RRF_DEPTH lists:
    # both rankings computed in SQL, fused with the identical
    # coalesce(1/(k0+r_bm25), 0) + coalesce(1/(k0+r_tfidf), 0)
    # arithmetic (same addition order as the engine)
    from ts_type_filter_ray.pipelines.flagship import RRF_DEPTH, RRF_K0
    rrf_sql = (_rank_ctes + rf"""
            , br as (select query_idx, doc_id,
                          row_number() over (partition by query_idx
                                             order by score desc,
                                                      doc_id asc) as rank
                   from bscored),
            tr as (select query_idx, doc_id,
                          row_number() over (partition by query_idx
                                             order by score desc,
                                                      doc_id asc) as rank
                   from tscored),
            fused as (
              select coalesce(b.query_idx, t.query_idx) as query_idx,
                     coalesce(b.doc_id, t.doc_id) as doc_id,
                     coalesce(1.0 / ({RRF_K0} + b.rank), 0.0)
                     + coalesce(1.0 / ({RRF_K0} + t.rank), 0.0) as score
              from (select * from br where rank <= {RRF_DEPTH}) b
              full outer join
                   (select * from tr where rank <= {RRF_DEPTH}) t
                on b.query_idx = t.query_idx and b.doc_id = t.doc_id)"""
        + _ranked_select("fused", f"rank <= {BM25_NOSTEM_K}"))

    # HYBRID retrieval: RRF of the lexical BM25 list (text query i)
    # and the dense cosine list (query vector ANN_QUERY_IDS[i]) over
    # the shared doc_id ≡ vec_id id space — the same rank-CTE stack
    # for the lexical leg, the ann_topk nrm/sims shape for the dense
    # leg, the same coalesce-sum fusion (lexical term first)
    hybrid_rows = ",".join(
        f"({qi},'{t}')"
        for qi, q in enumerate(BM25_NOSTEM_QUERY_SET[:len(ANN_QUERY_IDS)])
        for t in query_stems(q, stemmer=identity_stemmer))
    hybrid_qmap = ",".join(
        f"({i},{v})" for i, v in enumerate(ANN_QUERY_IDS))
    hybrid_sql = (_mk_rank_ctes(hybrid_rows) + rf"""
            , hb as (select query_idx, doc_id,
                          row_number() over (partition by query_idx
                                             order by score desc,
                                                      doc_id asc) as rank
                   from bscored),
            hnrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            hsims as (
              select q.vec_id as qv, t.vec_id as vec_id,
                     ({dot.format(a='q', b='t')}) / (q.nv * t.nv) as sim
              from hnrm q, hnrm t
              where q.vec_id in {qids}),
            hdr as (
              select qv, vec_id,
                     row_number() over (partition by qv
                                        order by sim desc, vec_id asc)
                         as rank
              from hsims),
            qmap(query_idx, qv) as (values {hybrid_qmap}),
            hd as (select m.query_idx, r.vec_id as doc_id, r.rank
                   from qmap m join hdr r on r.qv = m.qv),
            fused as (
              select coalesce(b.query_idx, d.query_idx) as query_idx,
                     coalesce(b.doc_id, d.doc_id) as doc_id,
                     coalesce(1.0 / ({RRF_K0} + b.rank), 0.0)
                     + coalesce(1.0 / ({RRF_K0} + d.rank), 0.0) as score
              from (select * from hb where rank <= {RRF_DEPTH}) b
              full outer join
                   (select * from hd where rank <= {RRF_DEPTH}) d
                on b.query_idx = d.query_idx and b.doc_id = d.doc_id)"""
        + _ranked_select("fused", f"rank <= {BM25_NOSTEM_K}"))

    # BM25F fielded ranking (pipelines/fielded.py): title = first
    # FIELDED_TITLE_TOKENS whitespace tokens (weight 2.0), body = the
    # rest (weight 1.0) — the oracle slices the same token array, then
    # computes the identical fielded pseudo-frequency (per-field
    # b/avgdl, title leg + body leg in declared order), Robertson idf
    # over the UNION document frequency, one saturation curve, and the
    # ascending-term left fold. Rank-only output.
    from ts_type_filter_ray.pipelines.flagship import (FIELDED_TITLE_TOKENS,
                                                       FIELDED_WEIGHTS)
    _ft = FIELDED_TITLE_TOKENS
    _wt, _wb = FIELDED_WEIGHTS["title"], FIELDED_WEIGHTS["body"]
    bm25f_sql = rf"""
            with base as (
              select doc_id,
                     case when trim(text) = '' then cast([] as varchar[])
                          else regexp_split_to_array(lower(trim(text)),'\s+')
                     end as arr
              from documents),
            farr as (select doc_id, arr[1:{_ft}] as tarr,
                            arr[{_ft + 1}:] as barr from base),
            dl_f as (select doc_id, len(tarr)::BIGINT as dlt,
                            len(barr)::BIGINT as dlb from farr),
            fstats as (select count(*)::BIGINT as n,
                              coalesce(sum(dlt), 0)::BIGINT as tdlt,
                              coalesce(sum(dlb), 0)::BIGINT as tdlb
                       from dl_f),
            tf_ti as (select doc_id, term, count(*)::BIGINT as tf
                      from (select doc_id, unnest(tarr) as term from farr)
                      group by doc_id, term),
            tf_bo as (select doc_id, term, count(*)::BIGINT as tf
                      from (select doc_id, unnest(barr) as term from farr)
                      group by doc_id, term),
            pairs as (select doc_id, term from tf_ti
                      union
                      select doc_id, term from tf_bo),
            df_u as (select term, count(*)::BIGINT as df
                     from pairs group by term),
            q(query_idx, term) as (values {bm25_rows}),
            wtf_t as (
              select p.doc_id, p.term,
                     {_wt} * (coalesce(tt.tf, 0)
                              / (1.0 - {BM25_B}
                                 + {BM25_B} * l.dlt / (s.tdlt / s.n)))
                     + {_wb} * (coalesce(tb.tf, 0)
                                / (1.0 - {BM25_B}
                                   + {BM25_B} * l.dlb / (s.tdlb / s.n)))
                         as wtf
              from pairs p
              left join tf_ti tt on tt.doc_id = p.doc_id
                                and tt.term = p.term
              left join tf_bo tb on tb.doc_id = p.doc_id
                                and tb.term = p.term
              join dl_f l on l.doc_id = p.doc_id
              cross join fstats s),
            fscored as (
              select q.query_idx, w.doc_id,
                     list_aggregate(list(
                       ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * ((w.wtf * ({BM25_K1} + 1.0)) / (w.wtf + {BM25_K1}))
                       order by q.term asc), 'sum') as score
              from q
              join wtf_t w on w.term = q.term
              join df_u d on d.term = q.term
              cross join fstats s
              group by q.query_idx, w.doc_id)"""
    bm25f_nostem_sql = bm25f_sql + _ranked_select(
        "fscored", f"rank <= {BM25_NOSTEM_K}")

    # Dirichlet query-likelihood (LocalSearcher.query_likelihood): the
    # scorer that exercises COLLECTION term frequency. ctf = Σ tf over
    # the whole corpus, C = total tokens, qtf = the term's multiplicity
    # in the query (NOT deduplicated — query_stem_counts), |q| = Σ qtf
    # over collection-present terms. Same float64 shapes: term fold of
    # qtf·ln(1 + tf/(μ·ctf/C)) ascending, then + |q|·ln(μ/(dl+μ)).
    from ts_type_filter_ray.pipelines.flagship import QL_MU
    from ts_type_filter_ray.pipelines.query import query_stem_counts
    ql_rows = ",".join(
        f"({qi},'{t}',{c})" for qi, q in enumerate(BM25_NOSTEM_QUERY_SET)
        for t, c in query_stem_counts(q, stemmer=identity_stemmer))
    ql_nostem_sql = rf"""
            with base as (
              select doc_id,
                     case when trim(text) = '' then cast([] as varchar[])
                          else regexp_split_to_array(lower(trim(text)),'\s+')
                     end as arr
              from documents),
            dl_t as (select doc_id, len(arr)::BIGINT as dl from base),
            stats as (select coalesce(sum(dl), 0)::BIGINT as tdl from dl_t),
            tf_t as (
              select doc_id, term, count(*)::BIGINT as tf
              from (select doc_id, unnest(arr) as term from base)
              group by doc_id, term),
            ctf_t as (select term, sum(tf)::BIGINT as ctf
                      from tf_t group by term),
            q(query_idx, term, qtf) as (values {ql_rows}),
            qlen_t as (
              select q.query_idx, sum(q.qtf)::BIGINT as qlen
              from q join ctf_t f on f.term = q.term
              group by q.query_idx),
            qscored as (
              select q.query_idx, t.doc_id,
                     list_aggregate(list(
                       q.qtf * ln(1.0 + t.tf / ({QL_MU} * (f.ctf / s.tdl)))
                       order by q.term asc), 'sum')
                     + ql.qlen * ln({QL_MU} / (l.dl + {QL_MU})) as score
              from q
              join tf_t t on t.term = q.term
              join ctf_t f on f.term = q.term
              join dl_t l on l.doc_id = t.doc_id
              join qlen_t ql on ql.query_idx = q.query_idx
              cross join stats s
              group by q.query_idx, t.doc_id, ql.qlen, l.dl)"""
    ql_nostem_sql = ql_nostem_sql + _ranked_select(
        "qscored", f"rank <= {BM25_NOSTEM_K}")

    # Boosted BM25 (Lucene term^b): same Robertson fold with each term's
    # contribution scaled boost * (idf * tf_factor) — boosts resolved
    # from the SAME query set + stemmer the engine path uses
    from ts_type_filter_ray.pipelines.flagship import BOOSTED_QUERY_SET
    boosted_rows = ",".join(
        f"({qi},'{t}',{b.get(t, 1.0)!r})"
        for qi, (q, b) in enumerate(BOOSTED_QUERY_SET)
        for t in query_stems(q, stemmer=identity_stemmer))
    boosted_bm25_sql = rf"""
            with base as (
              select doc_id,
                     case when trim(text) = '' then cast([] as varchar[])
                          else regexp_split_to_array(lower(trim(text)),'\s+')
                     end as arr
              from documents),
            dl_t as (select doc_id, len(arr)::BIGINT as dl from base),
            stats as (select count(*)::BIGINT as n,
                             coalesce(sum(dl), 0)::BIGINT as tdl from dl_t),
            tf_t as (
              select doc_id, term, count(*)::BIGINT as tf
              from (select doc_id, unnest(arr) as term from base)
              group by doc_id, term),
            df_t as (select term, count(*)::BIGINT as df
                     from tf_t group by term),
            q(query_idx, term, boost) as (values {boosted_rows}),
            wscored as (
              select q.query_idx, t.doc_id,
                     list_aggregate(list(
                       q.boost *
                       (ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                        * ((t.tf * ({BM25_K1} + 1.0))
                           / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                              + {BM25_B} * l.dl / (s.tdl / s.n)))))
                       order by q.term asc), 'sum') as score
              from q
              join tf_t t on t.term = q.term
              join df_t d on d.term = q.term
              join dl_t l on l.doc_id = t.doc_id
              cross join stats s
              group by q.query_idx, t.doc_id)"""
    boosted_bm25_sql = boosted_bm25_sql + _ranked_select(
        "wscored", f"rank <= {BM25_NOSTEM_K}")

    # ---- late-r4 query surfaces ----
    from ts_type_filter_ray.pipelines.flagship import (
        COLLAPSE_K, MLT_K, MLT_SEED_DOC_IDS, MLT_TERMS,
        REGEX_QUERY_SET)
    # regex vocabulary match: DuckDB regexp_matches is RE2 partial-match,
    # identical semantics to the engine's match_substring_regex sweep
    regex_rows = ",".join(f"({i},'{p}')"
                          for i, p in enumerate(REGEX_QUERY_SET))
    regex_match_sql = rf"""
            with pat(query_idx, pattern) as (values {regex_rows}),
            toks as (
              select distinct doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                       as term
                from documents where trim(text) <> ''))
            select distinct p.query_idx, t.doc_id
            from pat p join toks t on regexp_matches(t.term, p.pattern)"""
    # more-like-this: the seed's top-m tf·ln(N/df) terms become the
    # query (tie (score desc, term asc)); scoring is the same Robertson
    # fold as bscored; the seed is excluded BEFORE ranking
    mlt_seed_rows = ",".join(f"({i},{d})"
                             for i, d in enumerate(MLT_SEED_DOC_IDS))
    mlt_sql = rf"""
            with base as (
              select doc_id,
                     case when trim(text) = '' then cast([] as varchar[])
                          else regexp_split_to_array(lower(trim(text)),'\s+')
                     end as arr
              from documents),
            dl_t as (select doc_id, len(arr)::BIGINT as dl from base),
            stats as (select count(*)::BIGINT as n,
                             coalesce(sum(dl), 0)::BIGINT as tdl from dl_t),
            tf_t as (
              select doc_id, term, count(*)::BIGINT as tf
              from (select doc_id, unnest(arr) as term from base)
              group by doc_id, term),
            df_t as (select term, count(*)::BIGINT as df
                     from tf_t group by term),
            seeds(seed_idx, sdoc) as (values {mlt_seed_rows}),
            sterms as (
              select s.seed_idx, s.sdoc, t.term,
                     row_number() over (partition by s.seed_idx
                         order by t.tf * ln(st.n / d.df) desc,
                                  t.term asc) as trank
              from seeds s
              join tf_t t on t.doc_id = s.sdoc
              join df_t d on d.term = t.term
              cross join stats st),
            q as (select seed_idx as query_idx, sdoc, term
                  from sterms where trank <= {MLT_TERMS}),
            mscored as (
              select q.query_idx, t.doc_id, q.sdoc,
                     list_aggregate(list(
                       ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * ((t.tf * ({BM25_K1} + 1.0))
                          / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                             + {BM25_B} * l.dl / (s.tdl / s.n))))
                       order by q.term asc), 'sum') as score
              from q
              join tf_t t on t.term = q.term
              join df_t d on d.term = q.term
              join dl_t l on l.doc_id = t.doc_id
              cross join stats s
              group by q.query_idx, t.doc_id, q.sdoc)
            select query_idx, rank, doc_id from (
              select query_idx, doc_id,
                     row_number() over (partition by query_idx
                                        order by score desc, doc_id asc)
                         as rank
              from mscored where doc_id <> sdoc)
            where rank <= {MLT_K}"""
    # field-collapsed top-k: best doc per (query, lang) re-ranked
    collapsed_sql = (_rank_ctes + r"""
            , best as (
              select query_idx, b.doc_id, score,
                     row_number() over (partition by query_idx, d.lang
                                        order by score desc,
                                                 b.doc_id asc) as lrank
              from bscored b join documents d on d.doc_id = b.doc_id)"""
        + _ranked_select("(select query_idx, doc_id, score from best"
                         " where lrank = 1) cb",
                         f"rank <= {COLLAPSE_K}"))
    # out-of-vocabulary rate vs the top-16 corpus vocabulary: exact
    # integers + one IEEE division (same contract as commonness_scores)
    oov_sql = r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            topv as (
              select term from (
                select term, count(*) as c from toks group by term
                order by c desc, term asc limit 16)),
            agg as (
              select t.doc_id, count(*)::BIGINT as n_tokens,
                     sum(case when v.term is null then 1 else 0
                         end)::BIGINT as n_oov
              from toks t left join topv v using (term)
              group by t.doc_id)
            select d.doc_id,
                   coalesce(a.n_tokens, 0)::BIGINT as n_tokens,
                   coalesce(a.n_oov, 0)::BIGINT as n_oov,
                   coalesce(a.n_oov::DOUBLE / a.n_tokens, 0.0) as oov_ratio
            from documents d left join agg a using (doc_id)"""

    from ts_type_filter_ray.pipelines.flagship import (
        ANDNOT_QUERY_SET, CONJ_QUERY_SET, SUGGEST_K, SUGGEST_SET)
    nostem_toks_cte = r"""
            with toks as (
              select distinct doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                       as term
                from documents where trim(text) <> ''))"""

    def _stems(q):
        return query_stems(q, stemmer=identity_stemmer)

    conj_branches = []
    for i, q in enumerate(CONJ_QUERY_SET):
        terms = _stems(q)
        if not terms:
            continue  # empty query matches nothing (no pinned docs here)
        inlist = ",".join(f"'{t}'" for t in terms)
        conj_branches.append(
            f"select cast({i} as bigint) as query_idx, doc_id from toks"
            f" where term in ({inlist})"
            f" group by doc_id having count(*) = {len(terms)}")
    conjunctive_sql = (nostem_toks_cte + "\n" +
                       "\nunion all\n".join(conj_branches))

    andnot_branches = []
    for i, (q, ex) in enumerate(ANDNOT_QUERY_SET):
        inc = ",".join(f"'{t}'" for t in _stems(q))
        exc = ",".join(f"'{t}'" for t in _stems(ex))
        andnot_branches.append(
            f"select distinct cast({i} as bigint) as query_idx, doc_id"
            f" from toks where term in ({inc}) and doc_id not in"
            f" (select doc_id from toks where term in ({exc}))")
    andnot_sql = (nostem_toks_cte + "\n" +
                  "\nunion all\n".join(andnot_branches))

    def _like_prefix(p: str) -> str:
        # LIKE-escape the engine-side literal prefix: '_'/'%' are LIKE
        # metacharacters (ADVICE r3 — 'zzz_nope' would match 'zzzxnope'
        # in the oracle but not the engine). DuckDB: ESCAPE '\'.
        esc = (p.replace("\\", "\\\\").replace("_", "\\_")
               .replace("%", "\\%"))
        return f"like '{esc}%' escape '\\'"

    suggest_branches = [
        f"select cast({i} as bigint) as query_idx, rank, term, df from"
        f" (select row_number() over (order by df desc, term asc) as rank,"
        f" term, df from df_t where term {_like_prefix(p)}) where rank <= "
        f"{SUGGEST_K}"
        for i, p in enumerate(SUGGEST_SET)]
    suggest_sql = (nostem_toks_cte + r""",
            df_t as (select term, count(*) as df from toks group by term)
            """ + "\nunion all\n".join(suggest_branches))

    from ts_type_filter_ray.pipelines.flagship import PREFIX_QUERY_SET
    prefix_branches = [
        f"select distinct cast({i} as bigint) as query_idx, doc_id"
        f" from toks where term {_like_prefix(p)}"
        for i, p in enumerate(PREFIX_QUERY_SET)]
    prefix_sql = (r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> '')
            """ + "\nunion all\n".join(prefix_branches))

    # r4 query-algebra extensions (engine: LocalSearcher.match_atleast /
    # match_fuzzy / match_suffix / match_contains / tfidf, and the faceted
    # broadcast-count pipeline) — all generated from the SAME constant
    # query sets the engine answers (pipelines/flagship.py)
    from ts_type_filter_ray.pipelines.flagship import (FUZZY_QUERY_SET,
                                                       MINSHOULD_QUERY_SET,
                                                       SUFFIX_QUERY_SET)
    minshould_branches = []
    for i, (q, m) in enumerate(MINSHOULD_QUERY_SET):
        terms = _stems(q)
        if not terms:
            continue
        inlist = ",".join(f"'{t}'" for t in terms)
        # toks is distinct (doc_id, term), so count(*) counts DISTINCT
        # matching query terms per doc — the minimum-should-match rule
        minshould_branches.append(
            f"select cast({i} as bigint) as query_idx, doc_id from toks"
            f" where term in ({inlist})"
            f" group by doc_id having count(*) >= {m}")
    minshould_sql = (nostem_toks_cte + "\n" +
                     "\nunion all\n".join(minshould_branches))

    fuzzy_branches = [
        f"select distinct cast({i} as bigint) as query_idx, doc_id"
        f" from toks where levenshtein(term, '{tok}') <= {d}"
        for i, (tok, d) in enumerate(FUZZY_QUERY_SET)]
    fuzzy_sql = (nostem_toks_cte + "\n" +
                 "\nunion all\n".join(fuzzy_branches))

    def _like_body(s: str) -> str:
        # same LIKE-metacharacter escaping as _like_prefix, body only
        return (s.replace("\\", "\\\\").replace("_", "\\_")
                .replace("%", "\\%"))

    suffix_branches = [
        f"select distinct cast({i} as bigint) as query_idx, doc_id"
        f" from toks where term like '%{_like_body(s)}' escape '\\'"
        for i, s in enumerate(SUFFIX_QUERY_SET)]
    suffix_sql = (nostem_toks_cte + "\n" +
                  "\nunion all\n".join(suffix_branches))


    # trigram-indexed surfaces: same LIKE '%q%' / regexp_matches oracle
    # shapes over their own (len ≥ 3 / literal-factor) query panels
    from ts_type_filter_ray.pipelines.flagship import (
        TRIGRAM_INFIX_SET, TRIGRAM_REGEX_SET)
    trgm_infix_branches = [
        f"select distinct cast({i} as bigint) as query_idx, doc_id"
        f" from toks where term like '%{_like_body(s)}%' escape '\\'"
        for i, s in enumerate(TRIGRAM_INFIX_SET)]
    trgm_infix_sql = (nostem_toks_cte + "\n" +
                      "\nunion all\n".join(trgm_infix_branches))
    trgm_regex_rows = ",".join(f"({i},'{p}')"
                               for i, p in enumerate(TRIGRAM_REGEX_SET))
    trgm_regex_sql = rf"""
            with pat(query_idx, pattern) as (values {trgm_regex_rows}),
            toks as (
              select distinct doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                       as term
                from documents where trim(text) <> ''))
            select distinct p.query_idx, t.doc_id
            from pat p join toks t on regexp_matches(t.term, p.pattern)"""

    # (tfidf_nostem_sql derives from the shared _rank_ctes stack above —
    # same ln(N/df)·(1+ln tf) float64 shapes and ascending-term
    # left-fold; N counts ALL documents, matching IndexStats)

    # boolean query-language expressions: handcrafted set-op SQL mirrors
    # of flagship.EXPR_QUERY_SET (INTERSECT/EXCEPT/UNION per expression
    # tree; the phrase branch reuses the positional parallel-unnest CTE)
    _expr_branch = (
        "select distinct cast({i} as bigint) as query_idx, doc_id "
        "from ({body})")
    _expr_bodies = [
        # 0: spark OR window
        "select doc_id from toks where term in ('spark','window')",
        # 1: hash AND join AND NOT merge
        """select doc_id from toks where term = 'hash'
           intersect select doc_id from toks where term = 'join'
           except select doc_id from toks where term = 'merge'""",
        # 2: (query OR table) AND fast
        """select doc_id from toks where term in ('query','table')
           intersect select doc_id from toks where term = 'fast'""",
        # 3: sp* AND NOT *er
        """select doc_id from toks where term like 'sp%'
           except select doc_id from toks where term like '%er'""",
        # 4: hask~1 OR jion~2
        """select doc_id from toks where levenshtein(term,'hask') <= 1
           union select doc_id from toks
                 where levenshtein(term,'jion') <= 2""",
        # 5: "batch batch batch" AND slow
        """select t0.doc_id from tok t0
             join tok t1 on t1.doc_id = t0.doc_id and t1.pos = t0.pos + 1
             join tok t2 on t2.doc_id = t0.doc_id and t2.pos = t0.pos + 2
           where t0.term = 'batch' and t1.term = 'batch'
             and t2.term = 'batch'
           intersect select doc_id from toks where term = 'slow'""",
        # 6: *alu* AND key
        """select doc_id from toks where term like '%alu%'
           intersect select doc_id from toks where term = 'key'""",
        # 7: (the AND a) OR dup
        """select doc_id from toks where term = 'the'
           intersect select doc_id from toks where term = 'a'
           union select doc_id from toks where term = 'dup'""",
    ]
    expr_sql = (nostem_toks_cte + r""",
            tok as (
              select doc_id, unnest(toks) as term,
                     unnest(range(len(toks)))::BIGINT as pos
              from (select doc_id,
                           regexp_split_to_array(lower(trim(text)),'\s+')
                           as toks
                    from documents where trim(text) <> ''))
            """ + "\nunion all\n".join(
        _expr_branch.format(i=i, body=b)
        for i, b in enumerate(_expr_bodies)))

    # numeric field index gates — handcrafted mirrors of
    # flagship.RANGE_EXPR_SET (range leaves become BETWEEN / comparison
    # predicates over documents.n_chars; term leaves reuse the distinct
    # lowercased-token CTE; set ops mirror the expression trees)
    _range_branch = (
        "select distinct cast({i} as bigint) as query_idx, doc_id "
        "from ({body})")
    _range_bodies = [
        # 0: value AND n_chars:[100 TO 300]
        """select doc_id from toks where term = 'value'
           intersect select doc_id from documents
                     where n_chars between 100 and 300""",
        # 1: batch AND n_chars:{250 TO 450}
        """select doc_id from toks where term = 'batch'
           intersect select doc_id from documents
                     where n_chars > 250 and n_chars < 450""",
        # 2: spark OR n_chars:[* TO 60]
        """select doc_id from toks where term = 'spark'
           union select doc_id from documents where n_chars <= 60""",
        # 3: n_chars:[400 TO *] AND NOT slow
        """select doc_id from documents where n_chars >= 400
           except select doc_id from toks where term = 'slow'""",
        # 4: table AND n_chars:[500 TO 500]
        """select doc_id from toks where term = 'table'
           intersect select doc_id from documents where n_chars = 500""",
    ]
    from ts_type_filter_ray.pipelines.flagship import (SORT_FIELD_K,
                                                       SORT_FIELD_QUERY_SET,
                                                       STOPWORD_QUERY_SET,
                                                       STOPWORD_SET,
                                                       TV_DOC_IDS)
    _stop_inlist = ",".join(f"'{w}'" for w in STOPWORD_SET)
    stopword_rows = ",".join(
        f"({qi},'{t}')" for qi, q in enumerate(STOPWORD_QUERY_SET)
        for t in query_stems(q, stemmer=identity_stemmer))
    range_filter_sql = (nostem_toks_cte + "\n" + "\nunion all\n".join(
        _range_branch.format(i=i, body=b)
        for i, b in enumerate(_range_bodies)))

    sort_rows = ",".join(
        f"({qi},'{t}')" for qi, q in enumerate(SORT_FIELD_QUERY_SET)
        for t in query_stems(q, stemmer=identity_stemmer))
    _sort_match_cte = rf""",
            sq(query_idx, term) as (values {sort_rows}),
            sm as (select distinct sq.query_idx, t.doc_id
                   from sq join toks t on t.term = sq.term)"""
    sorted_match_sql = (nostem_toks_cte + _sort_match_cte + rf"""
            select query_idx, rank, doc_id, n_chars from (
              select sm.query_idx, sm.doc_id, d.n_chars,
                     row_number() over (partition by sm.query_idx
                                        order by d.n_chars desc,
                                                 sm.doc_id asc) as rank
              from sm join documents d on d.doc_id = sm.doc_id)
            where rank <= {SORT_FIELD_K}""")
    field_stats_sql = (nostem_toks_cte + _sort_match_cte + r"""
            select sm.query_idx,
                   count(*)::BIGINT as n_docs,
                   sum(d.n_chars)::DOUBLE as sum_chars,
                   min(d.n_chars)::BIGINT as min_chars,
                   max(d.n_chars)::BIGINT as max_chars,
                   sum(d.n_chars)::DOUBLE / count(*)::DOUBLE as avg_chars
            from sm join documents d on d.doc_id = sm.doc_id
            group by sm.query_idx""")

    # significant terms (pipelines/analytics.py): foreground df over the
    # match set vs background df over the corpus; lift computed with the
    # IDENTICAL float64 expression shape as the engine (one exact int64
    # product per side, one rounded division), so the float column
    # itself crosses the gate; (lift desc, fg_df desc, term asc) rank,
    # query stems excluded, fg_df >= MIN_FG noise floor
    from ts_type_filter_ray.pipelines.analytics import (HISTOGRAM_QUERY_SET,
                                                        HISTOGRAM_WIDTH,
                                                        SIGTERMS_K,
                                                        SIGTERMS_MIN_FG,
                                                        SIGTERMS_QUERY_SET)
    sig_rows = ",".join(
        f"({qi},'{t}')" for qi, q in enumerate(SIGTERMS_QUERY_SET)
        for t in _stems(q))
    significant_terms_sql = (nostem_toks_cte + rf""",
            sq(query_idx, term) as (values {sig_rows}),
            m as (select distinct sq.query_idx, t.doc_id
                  from sq join toks t using (term)),
            nfg as (select query_idx, count(*)::BIGINT as n_fg
                    from m group by query_idx),
            bg as (select term, count(*)::BIGINT as bg_df
                   from toks group by term),
            fg as (select m.query_idx, t.term,
                          count(*)::BIGINT as fg_df
                   from m join toks t on t.doc_id = m.doc_id
                   group by m.query_idx, t.term),
            scored as (
              select f.query_idx, f.term, f.fg_df, b.bg_df,
                     (f.fg_df * (select count(*) from documents))::DOUBLE
                     / (b.bg_df * g.n_fg)::DOUBLE as lift
              from fg f
              join bg b using (term)
              join nfg g using (query_idx)
              where f.fg_df >= {SIGTERMS_MIN_FG}
                and not exists (select 1 from sq
                                where sq.query_idx = f.query_idx
                                  and sq.term = f.term))
            select query_idx, rank, term, fg_df, bg_df, lift from (
              select *, row_number() over (partition by query_idx
                                           order by lift desc,
                                                    fg_df desc,
                                                    term asc) as rank
              from scored)
            where rank <= {SIGTERMS_K}""")

    # numeric histogram facets: fixed-width buckets of n_chars over each
    # query's match set (floor division on both sides; empty buckets
    # omitted by GROUP BY on both sides)
    hist_rows = ",".join(
        f"({qi},'{t}')" for qi, q in enumerate(HISTOGRAM_QUERY_SET)
        for t in _stems(q))
    numeric_histogram_sql = (nostem_toks_cte + rf""",
            hq(query_idx, term) as (values {hist_rows}),
            hm as (select distinct hq.query_idx, t.doc_id
                   from hq join toks t using (term))
            select hm.query_idx,
                   (d.n_chars // {HISTOGRAM_WIDTH})
                       * {HISTOGRAM_WIDTH} as bucket_lo,
                   count(*)::BIGINT as n_docs
            from hm join documents d on d.doc_id = hm.doc_id
            group by hm.query_idx, bucket_lo""")

    # function score: bscored (the shared bit-identical BM25 CTE) times
    # the numeric doc-values boost — same float64 expression shape as
    # analytics.function_score_table (int->double conversion, one
    # rounded division, one rounded multiply); rank-only output
    function_score_sql = (_rank_ctes + r""",
            fscored as (
              select b.query_idx, b.doc_id,
                     b.score * (1.0 + d.n_chars / 1000.0) as score
              from bscored b join documents d on d.doc_id = b.doc_id)"""
        + _ranked_select("fscored", f"rank <= {BM25_NOSTEM_K}"))

    # related searches: per-query top co-occurring terms within the
    # match set, query terms excluded, (df desc, term asc) rank
    from ts_type_filter_ray.pipelines.flagship import (RELATED_K,
                                                       RELATED_QUERY_SET)
    related_branches = []
    for i, q in enumerate(RELATED_QUERY_SET):
        inlist = ",".join(f"'{t}'" for t in _stems(q))
        related_branches.append(
            f"select cast({i} as bigint) as query_idx, rank, term, df"
            f" from (select row_number() over ("
            f"     order by df desc, term asc) as rank, term, df"
            f"   from (select term, count(*)::BIGINT as df from toks"
            f"     where doc_id in (select doc_id from toks"
            f"                      where term in ({inlist}))"
            f"       and term not in ({inlist})"
            f"     group by term))"
            f" where rank <= {RELATED_K}")
    related_sql = (nostem_toks_cte + "\n" +
                   "\nunion all\n".join(related_branches))

    # spell correction: (distance asc, df desc, term asc) window rank
    # within levenshtein max_dist, top SPELL_K per probe
    from ts_type_filter_ray.pipelines.flagship import (SPELL_K,
                                                       SPELL_QUERY_SET)
    spell_branches = [
        f"select cast({i} as bigint) as query_idx, rank, term, dist, df"
        f" from (select row_number() over ("
        f"   order by levenshtein(term,'{tok}') asc, df desc, term asc)"
        f"   as rank, term, levenshtein(term,'{tok}')::BIGINT as dist, df"
        f"   from df_t where levenshtein(term,'{tok}') <= {d})"
        f" where rank <= {SPELL_K}"
        for i, (tok, d) in enumerate(SPELL_QUERY_SET)]
    spell_sql = (nostem_toks_cte + r""",
            df_t as (select term, count(*)::BIGINT as df
                     from toks group by term)
            """ + "\nunion all\n".join(spell_branches))

    # query-time synonym expansion: expanded IN-list mirrors of
    # flagship.SYNONYM_EXPR_SET under flagship.SYNONYM_MAP
    _syn_bodies = [
        # 0: fast
        """select doc_id from toks
           where term in ('fast','quick','rapid')""",
        # 1: join AND NOT hash
        """select doc_id from toks where term in ('join','merge')
           except select doc_id from toks where term = 'hash'""",
        # 2: (spark OR window) AND join
        """select doc_id from toks
           where term in ('spark','flame','window')
           intersect select doc_id from toks
                     where term in ('join','merge')""",
        # 3: batch (no synonyms)
        "select doc_id from toks where term = 'batch'",
    ]
    synonym_sql = (nostem_toks_cte + "\n" + "\nunion all\n".join(
        _expr_branch.format(i=i, body=b)
        for i, b in enumerate(_syn_bodies)))

    # metadata field filters: set-op mirrors over the documents columns
    # (engine side answers from the facet-as-term metadata index)
    _field_bodies = [
        # 0: lang:en AND spark
        """select doc_id from documents where lower(lang) = 'en'
           intersect select doc_id from toks where term = 'spark'""",
        # 1: source:src3 AND NOT batch
        """select doc_id from documents where lower(source) = 'src3'
           except select doc_id from toks where term = 'batch'""",
        # 2: lang:de OR lang:fr
        """select doc_id from documents
           where lower(lang) in ('de','fr')""",
        # 3: (lang:en OR lang:zh) AND hash AND join
        """select doc_id from documents where lower(lang) in ('en','zh')
           intersect select doc_id from toks where term = 'hash'
           intersect select doc_id from toks where term = 'join'""",
        # 4: source:src1* AND merge
        """select doc_id from documents where lower(source) like 'src1%'
           intersect select doc_id from toks where term = 'merge'""",
        # 5: spark AND NOT source:src0
        """select doc_id from toks where term = 'spark'
           except select doc_id from documents
                  where lower(source) = 'src0'""",
    ]
    field_filter_sql = (nostem_toks_cte + "\n" + "\nunion all\n".join(
        _expr_branch.format(i=i, body=b)
        for i, b in enumerate(_field_bodies)))

    # faceted match counts: per-query distinct match sets joined to the
    # documents facet column, counted per (query_idx, lang)
    faceted_sql = (nostem_toks_cte + rf""",
            q(query_idx, term) as (values {nostem_rows}),
            m as (select distinct q.query_idx, t.doc_id
                  from q join toks t using (term))
            select m.query_idx, d.lang, count(*)::BIGINT as n_docs
            from m join documents d using (doc_id)
            group by m.query_idx, d.lang""")
    # --- the reference AST family, value-exact (r5): the oracle side
    # embeds the REFERENCE's golden outputs as SQL literals (pruning:
    # /root/reference/tests/test_type_filter.py:30-159; validator:
    # validator2.py semantics; normalizer: normalize.py:287-370) — the
    # engine is compared against published reference behavior, never
    # against itself ---
    from ts_type_filter_ray.sources.typefixtures import (NORMALIZE_GOLDENS,
                                                         PRUNE_GOLDENS,
                                                         VALIDATE_GOLDENS)

    def _sqq(s: str) -> str:
        return s.replace("'", "''")

    prune_rows = ",\n              ".join(
        f"({i}, '{_sqq(ln)}')"
        for i, (_q, lines) in enumerate(PRUNE_GOLDENS) for ln in lines)
    validate_rows = ",\n              ".join(
        f"({i}, {str(bool(v)).lower()})"
        for i, (_c, v) in enumerate(VALIDATE_GOLDENS))
    normalize_rows = ",\n              ".join(
        f"({i}, '{_sqq(out_json)}')"
        for i, (_c, out_json) in enumerate(NORMALIZE_GOLDENS))

    out = {
        "prune_types": f"""
            select * from (values
              {prune_rows}
            ) as t(case_id, line)""",
        "validate_carts": f"""
            select * from (values
              {validate_rows}
            ) as t(cart_id, valid)""",
        "normalize_carts": f"""
            select * from (values
              {normalize_rows}
            ) as t(cart_id, normalized)""",
        "token_counts": r"""
            select doc_id,
                   case when trim(text)='' then 0
                        else len(regexp_split_to_array(trim(text),'\s+')) end
                   as n_tokens
            from documents""",
        "doc_stats_by_lang": r"""
            with t as (select lang, n_chars,
                   case when trim(text)='' then 0
                        else len(regexp_split_to_array(trim(text),'\s+')) end
                   as n_tokens
                   from documents)
            select lang, count(*) as n_docs,
                   sum(n_tokens)::BIGINT as total_tokens,
                   avg(n_tokens) as avg_tokens,
                   sum(n_chars)::BIGINT as total_chars
            from t group by lang""",
        "term_df_tf": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+')) as term
              from documents where trim(text) <> '')
            select term, count(distinct doc_id) as df, count(*) as tf
            from toks group by term""",
        "top_terms": rf"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+')) as term
              from documents where trim(text) <> '')
            select term, count(distinct doc_id) as df, count(*) as tf
            from toks group by term
            order by df desc, term asc limit {TOP_TERMS_K}""",
        "top_terms_by_lang": r"""
            with toks as (
              select doc_id, lang,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            df as (
              select lang, term, count(distinct doc_id) as df
              from toks group by lang, term),
            ranked as (
              select lang, term, df,
                     row_number() over (partition by lang
                                        order by df desc, term asc) as rank
              from df)
            select lang, rank, term, df from ranked where rank <= 5""",
        "quality_scores": rf"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+')) as term
              from documents where trim(text) <> ''),
            agg as (
              select doc_id, count(*) as n_tokens,
                     sum(case when term in {stop} then 1 else 0 end) as n_stop,
                     sum(length(term)) as len_sum
              from toks group by doc_id)
            select d.doc_id,
                   coalesce(a.n_tokens, 0) as n_tokens,
                   coalesce(a.n_stop, 0)::BIGINT as n_stopwords,
                   coalesce(a.n_stop::DOUBLE / a.n_tokens, 0.0) as stopword_ratio,
                   coalesce(a.len_sum::DOUBLE / a.n_tokens, 0.0) as mean_token_len
            from documents d left join agg a using (doc_id)""",
        "bpe_token_counts": r"""
            select doc_id,
                   len(regexp_extract_all(text,'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
                   as n_bpe_tokens
            from documents""",
        "bpe_top_pairs": r"""
            with toks as (
              select unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            words as (select term, count(*) as n from toks group by term),
            expanded as (
              select term, n,
                     unnest(generate_series(1, length(term))) as i
              from words)
            select substr(term, i, 1) as "left",
                   case when i = length(term) then '</w>'
                        else substr(term, i + 1, 1) end as "right",
                   sum(n)::BIGINT as pair_count
            from expanded
            group by 1, 2""",
        "bpe_first_merge": r"""
            with toks as (
              select unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            words as (select term, count(*) as n from toks group by term),
            expanded as (
              select term, n,
                     unnest(generate_series(1, length(term))) as i
              from words),
            pairs as (
              select substr(term, i, 1) as l,
                     case when i = length(term) then '</w>'
                          else substr(term, i + 1, 1) end as r,
                     sum(n)::BIGINT as pair_count
              from expanded group by 1, 2)
            select 0::BIGINT as rank, l as "left", r as "right", pair_count
            from pairs
            order by pair_count desc, l asc, r asc
            limit 1""",
        "bpe_encode_zero": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            agg as (
              select doc_id, sum(length(term) + 1)::BIGINT as n_bpe
              from toks group by doc_id)
            select d.doc_id, coalesce(a.n_bpe, 0)::BIGINT as n_bpe
            from documents d left join agg a using (doc_id)""",
        "phrase_dictionary": _textstats_mod().phrase_counts_sql(
            PHRASE_DICT),
        "fingerprints": r"""
            select doc_id,
                   md5(lower(regexp_replace(trim(text),'\s+',' ','g'))) as fp
            from documents""",
        "unigram_entropy": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            tf as (
              select doc_id, term, count(*)::BIGINT as c
              from toks group by doc_id, term),
            agg as (
              select doc_id, sum(c)::BIGINT as n_tokens,
                     count(*)::BIGINT as n_distinct,
                     list_aggregate(
                       list(c::DOUBLE * ln(c::DOUBLE) order by term),
                       'sum') as s
              from tf group by doc_id)
            select d.doc_id,
                   coalesce(a.n_tokens, 0) as n_tokens,
                   coalesce(a.n_distinct, 0) as n_distinct,
                   coalesce(ln(a.n_tokens::DOUBLE)
                            - a.s / a.n_tokens::DOUBLE,
                            0.0::DOUBLE) as entropy
            from documents d left join agg a using (doc_id)""",
        "repetition_scores": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as tok
              from documents where trim(text) <> ''),
            tf as (
              select doc_id, tok, count(*) as c
              from toks group by doc_id, tok),
            agg as (
              select doc_id, sum(c)::BIGINT as n_tokens,
                     count(*)::BIGINT as n_distinct,
                     max(c)::BIGINT as max_tf
              from tf group by doc_id)
            select d.doc_id,
                   coalesce(a.n_tokens, 0) as n_tokens,
                   coalesce(a.n_distinct, 0) as n_distinct,
                   coalesce(a.max_tf, 0) as max_tf,
                   coalesce(a.n_distinct::DOUBLE / a.n_tokens, 0.0)
                       as distinct_ratio,
                   coalesce(a.max_tf::DOUBLE / a.n_tokens, 0.0)
                       as max_tf_ratio
            from documents d left join agg a using (doc_id)""",
        "doc_top_terms": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            tf as (
              select doc_id, term, count(*) as tf
              from toks group by doc_id, term),
            df as (select term, count(*) as df from tf group by term),
            scored as (
              select t.doc_id, t.term, t.tf, d.df,
                     t.tf::DOUBLE / d.df as score
              from tf t join df d using (term)),
            ranked as (
              select *, row_number() over (partition by doc_id
                                           order by score desc, term asc)
                        as rank
              from scored)
            select doc_id, rank, term, tf, df, score
            from ranked where rank <= 3""",
        "heavy_hitters": r"""
            with toks as (
              select unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> '')
            select term, count(*) as n,
                   row_number() over (order by count(*) desc, term asc)
                   as rank
            from toks group by term
            order by n desc, term asc limit 10""",
        "df_histogram": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            dft as (
              select term, count(distinct doc_id) as df
              from toks group by term)
            select df, count(*) as n_terms from dft group by df""",
        "textrank_keywords": (rf"""
            with base as (
              select regexp_split_to_array(lower(trim(text)),'\s+') as arr
              from documents where trim(text) <> ''),
            toks as (
              select unnest(arr) as term from base),
            vocab as (select distinct term from toks),
            big as (
              select arr[p] as a, arr[p+1] as b
              from (select arr, unnest(range(1, len(arr)))::INT as p
                    from base where len(arr) >= 2)
              where arr[p] <> arr[p+1]),
            edges as (
              select a as src, b as dst from big
              union all
              select b as src, a as dst from big),
            wedges as (
              select src, dst, count(*)::BIGINT as w
              from edges group by 1, 2),
            od as (select src, sum(w)::BIGINT as deg
                   from wedges group by src),
            r0 as (select term as node, 1.0::DOUBLE as r from vocab)"""
            + "".join(f""",
            r{i} as (
              select v.term as node,
                     (1.0::DOUBLE - {TEXTRANK_DAMPING}::DOUBLE)
                     + {TEXTRANK_DAMPING}::DOUBLE
                       * coalesce(agg.s, 0.0::DOUBLE) as r
              from vocab v
              left join (
                select e.dst as node,
                       list_aggregate(list((rp.r / od.deg) * e.w
                                           order by e.src asc),
                                      'sum') as s
                from wedges e
                join r{i - 1} rp on rp.node = e.src
                join od on od.src = e.src
                group by e.dst) agg on agg.node = v.term)"""
            for i in range(1, TEXTRANK_ITERS + 1)) + f"""
            select node as term, r as textrank
            from (select node, r,
                         row_number() over (order by r desc, node asc)
                             as rk
                  from r{TEXTRANK_ITERS})
            where rk <= {TEXTRANK_K}"""),
        "cms_counts": rf"""
            with toks as (
              select unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            tf as (select term, count(*)::BIGINT as tf
                   from toks group by term),
            slots as (
              select d,
                     md5_number_lower(term || ':' || d) % {CMS_WIDTH}
                         as slot,
                     sum(tf)::BIGINT as cnt
              from tf cross join range(0, {CMS_DEPTH}) as r(d)
              group by 1, 2)
            select t.term, t.tf, min(s.cnt)::BIGINT as cms_count
            from tf t
            cross join range(0, {CMS_DEPTH}) as r(d)
            join slots s
              on s.d = r.d
             and s.slot = md5_number_lower(t.term || ':' || r.d)
                          % {CMS_WIDTH}
            group by t.term, t.tf""",
        "ngram_counts": rf"""
            with base as (
              select regexp_split_to_array(lower(trim(text)),'\s+') as arr
              from documents where trim(text) <> ''),
            grams as (
              select arr[p] || ' ' || arr[p+1] as ngram
              from (select arr, unnest(range(1, len(arr)))::INT as p
                    from base where len(arr) >= 2))
            select ngram, count(*) as "count" from grams group by ngram
            order by "count" desc, ngram asc limit {TOP_TERMS_K}""",
        "cooccurrence_counts": rf"""
            with raw as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            toks as (select distinct doc_id, term from raw),
            dft as (select term, count(*) as df from toks group by term),
            vocab as (select term from dft where df >= 2),
            ft as (select t.doc_id, t.term
                   from toks t join vocab v using (term))
            select a.term as term_a, b.term as term_b,
                   count(*) as pair_count
            from ft a join ft b
              on a.doc_id = b.doc_id and a.term < b.term
            group by 1, 2 having count(*) >= 2
            order by pair_count desc, term_a, term_b
            limit {TOP_TERMS_K * 2}""",
        "phrase_match": "\n".join(
            ["with h as (",
             "  select doc_id,",
             r"         ' ' || regexp_replace(lower(trim(text)),'\s+',"
             r"' ','g') || ' ' as hay",
             "  from documents),",
             "p(phrase_idx, pat) as (values"] +
            [", ".join(f"({i}, ' {ph} ')"
                       for i, ph in enumerate(PHRASE_SET)) + ")"] +
            ["select p.phrase_idx, h.doc_id from p",
             "join h on contains(h.hay, p.pat)",
             "order by p.phrase_idx, h.doc_id"]),
        "dup_ngram_fraction": r"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            sh as (
              select distinct doc_id, g from (
                select doc_id,
                       arr[p] || ' ' || arr[p+1] || ' ' || arr[p+2] as g
                from (select doc_id, arr,
                             unnest(range(1, len(arr)-1))::INT as p
                      from base where len(arr) >= 3)
                union all
                select doc_id, array_to_string(arr, ' ') as g
                from base where len(arr) < 3)),
            dfg as (select g, count(*) as docs from sh group by g),
            per as (
              select s.doc_id, count(*) as n_shingles,
                     sum(case when d.docs >= 2 then 1 else 0 end)
                         as n_dup
              from sh s join dfg d using (g) group by s.doc_id)
            select doc_id, n_shingles::BIGINT as n_shingles,
                   n_dup::BIGINT as n_dup_shingles,
                   n_dup::DOUBLE / n_shingles as dup_fraction
            from per""",
        "strip_dup_spans": rf"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            sh as (
              select doc_id, p,
                     array_to_string(arr[p+1:p+{DUP_SPAN_K}], ' ') as g,
                     least({DUP_SPAN_K}, len(arr))::BIGINT as w
              from (select doc_id, arr,
                           unnest(range(0, greatest(len(arr)-{DUP_SPAN_K}+1,
                                                    1)))::INT as p
                    from base)),
            dfg as (select g, count(*) as cnt from sh group by g),
            cov as (
              select distinct s.doc_id, s.p + t.o as tp
              from sh s
              join dfg d using (g)
              cross join range(0, {DUP_SPAN_K}) as t(o)
              where d.cnt >= 2 and t.o < s.w),
            toks as (
              select doc_id, p, arr[p+1] as tok
              from (select doc_id, arr,
                           unnest(range(0, len(arr)))::INT as p
                    from base)),
            kept as (
              select t.doc_id, t.p, t.tok
              from toks t left join cov c
                on c.doc_id = t.doc_id and c.tp = t.p
              where c.tp is null),
            agg as (select doc_id, string_agg(tok, ' ' order by p) as text,
                           count(*)::BIGINT as n_kept
                    from kept group by doc_id),
            nt as (select doc_id, len(arr)::BIGINT as n_tokens from base)
            select d.doc_id, coalesce(a.text, '') as text,
                   coalesce(n.n_tokens, 0)::BIGINT as n_tokens,
                   (coalesce(n.n_tokens, 0) - coalesce(a.n_kept, 0))::BIGINT
                       as n_removed
            from documents d
            left join nt n using (doc_id)
            left join agg a using (doc_id)""",
        "line_dedup": rf"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            toks as (
              select doc_id, i, arr[i] as tok
              from (select doc_id, arr,
                           unnest(generate_series(1, len(arr)))::INT as i
                    from base)),
            mlines as (
              select doc_id, (i-1)//{LINE_TOKENS} as li,
                     string_agg(tok, ' ' order by i) as ln
              from toks group by doc_id, (i-1)//{LINE_TOKENS}),
            flagged as (
              select doc_id, li, ln,
                     (length(ln) < 1 or
                      row_number() over (partition by ln
                                         order by doc_id, li) = 1) as keep
              from mlines),
            agg as (
              select doc_id,
                     count(*)::BIGINT as n_lines,
                     sum(case when keep then 0 else 1 end)::BIGINT
                         as n_removed,
                     coalesce(string_agg(ln, chr(10) order by li)
                                  filter (where keep), '') as text
              from flagged group by doc_id)
            select doc_id, text, n_lines, n_removed from agg""",
        "gopher_rules": rf"""
            with t as (
              select doc_id,
                     unnest(regexp_split_to_array(trim(text),'\s+')) as tok
              from documents where trim(text) <> ''),
            agg as (
              select doc_id,
                     count(*)::BIGINT as n_words,
                     sum(length(tok))::BIGINT as len_sum,
                     sum(case when regexp_matches(tok, '[A-Za-z]')
                              then 1 else 0 end)::BIGINT as n_alpha,
                     sum(case when position('#' in tok) > 0
                              or position('...' in tok) > 0
                              or position('…' in tok) > 0
                              then 1 else 0 end)::BIGINT as n_sym,
                     count(distinct case when lower(tok) in {stop}
                                    then lower(tok) end)::BIGINT as n_stop
              from t group by doc_id),
            per as (
              select d.doc_id,
                     coalesce(a.n_words, 0)::BIGINT as n_words,
                     coalesce(a.len_sum, 0)::DOUBLE
                       / greatest(coalesce(a.n_words, 0), 1)::DOUBLE
                       as mean_word_len,
                     coalesce(a.n_sym, 0)::DOUBLE
                       / greatest(coalesce(a.n_words, 0), 1)::DOUBLE
                       as symbol_ratio,
                     coalesce(a.n_alpha, 0)::DOUBLE
                       / greatest(coalesce(a.n_words, 0), 1)::DOUBLE
                       as alpha_ratio,
                     coalesce(a.n_stop, 0)::BIGINT as n_stop_distinct
              from documents d left join agg a using (doc_id))
            select doc_id, n_words, mean_word_len, symbol_ratio,
                   alpha_ratio, n_stop_distinct,
                   (case when n_words >= {GOPHER_MIN_WORDS}
                          and n_words <= {GOPHER_MAX_WORDS}
                          and mean_word_len >= {GOPHER_MIN_MEAN_LEN}::DOUBLE
                          and mean_word_len <= {GOPHER_MAX_MEAN_LEN}::DOUBLE
                          and symbol_ratio <= {GOPHER_MAX_SYMBOL}::DOUBLE
                          and alpha_ratio >= {GOPHER_MIN_ALPHA}::DOUBLE
                          and n_stop_distinct >= {GOPHER_MIN_STOP}
                     then 1 else 0 end)::BIGINT as keep
            from per""",
        "c4_clean": rf"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            toks as (
              select doc_id, i, arr[i] as tok
              from (select doc_id, arr,
                           unnest(generate_series(1, len(arr)))::INT as i
                    from base)),
            mlines as (
              select doc_id, (i-1)//{LINE_TOKENS} as li,
                     string_agg(tok, ' ' order by i)
                       || (case when (doc_id + (i-1)//{LINE_TOKENS}) % 2 = 0
                           then '.' else '' end) as ln,
                     count(*)::BIGINT as nw
              from toks group by doc_id, (i-1)//{LINE_TOKENS}),
            flagged as (
              select doc_id, li, ln, nw,
                     (regexp_matches(ln, '[.!?"]$') and nw >= 3
                      and position('javascript' in lower(ln)) = 0)
                         as keepl,
                     (position('lorem ipsum' in lower(ln)) > 0
                      or position(chr(123) in ln) > 0) as badl
              from mlines),
            agg as (
              select doc_id,
                     count(*)::BIGINT as n_lines,
                     sum(case when keepl then 1 else 0 end)::BIGINT
                         as n_kept,
                     bool_or(badl) as bad,
                     coalesce(string_agg(ln, chr(10) order by li)
                                  filter (where keepl), '') as text
              from flagged group by doc_id)
            select doc_id, n_lines, n_kept, text
            from agg where (not bad) and n_kept >= 1""",
        "select_until_budget": rf"""
            with r as (
              select doc_id, lang, n_chars,
                     sum(n_chars) over (
                       partition by lang
                       order by n_chars desc, doc_id asc
                       rows unbounded preceding)::BIGINT as cum_weight
              from documents)
            select doc_id, n_chars, lang, cum_weight from r
            where cum_weight <= {SELECT_BUDGET}""",
        "gopher_repetition": rf"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            tot as (
              select doc_id, len(arr)::BIGINT as nt,
                     length(array_to_string(arr, ' '))::BIGINT as tc
              from base),
            grams as (
              select doc_id,
                     array_to_string(arr[p:p+{GOPHER_REP_N}-1], ' ') as g
              from (select doc_id, arr,
                           unnest(range(1, len(arr)-{GOPHER_REP_N}+2))::INT
                               as p
                    from base where len(arr) >= {GOPHER_REP_N})),
            gc as (select doc_id, g, count(*)::BIGINT as cnt
                   from grams group by 1, 2),
            top as (select doc_id, g, cnt,
                           row_number() over (partition by doc_id
                                              order by cnt desc, g asc)
                               as rn
                    from gc),
            dup as (select doc_id,
                           sum(cnt * length(g))::BIGINT as dchars
                    from gc where cnt >= 2 group by doc_id)
            select d.doc_id,
                   coalesce(t.nt, 0)::BIGINT as n_tokens,
                   coalesce(tp.g, '') as top_gram,
                   coalesce(tp.cnt, 0)::BIGINT as top_gram_count,
                   (coalesce(tp.cnt, 0)
                    * length(coalesce(tp.g, '')))::DOUBLE
                     / greatest(coalesce(t.tc, 0), 1)::DOUBLE
                     as top_gram_frac,
                   coalesce(u.dchars, 0)::DOUBLE
                     / greatest(coalesce(t.tc, 0), 1)::DOUBLE
                     as dup_gram_frac
            from documents d
            left join tot t using (doc_id)
            left join (select * from top where rn = 1) tp using (doc_id)
            left join dup u using (doc_id)""",
        "temperature_sample": rf"""
            with c as (select lang, count(*)::BIGINT as n
                       from documents group by lang),
            m as (select min(n) as nm from c),
            r as (select c.lang,
                         cast(floor(pow(c.n::DOUBLE / m.nm::DOUBLE,
                                        {TEMP_ALPHA}::DOUBLE
                                          - 1.0::DOUBLE)
                                    * {TEMP_MOD}) as BIGINT) as cut
                  from c cross join m)
            select d.doc_id, d.lang,
                   (md5_number_lower(d.doc_id::VARCHAR)
                    % {TEMP_MOD})::BIGINT as bucket
            from documents d join r using (lang)
            where md5_number_lower(d.doc_id::VARCHAR) % {TEMP_MOD}
                  < r.cut""",
        "tf_cosine_pairs": rf"""
            with raw as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            tf as (select doc_id, term, count(*)::BIGINT as tf
                   from raw group by 1, 2),
            nrm as (select doc_id, sum(tf*tf)::BIGINT as sq
                    from tf group by 1),
            dt as (select a.doc_id as id_a, b.doc_id as id_b,
                          sum(a.tf*b.tf)::BIGINT as dot
                   from tf a join tf b using (term)
                   where a.doc_id < b.doc_id
                   group by 1, 2)
            select id_a, id_b,
                   dot::DOUBLE / (sqrt(na.sq::DOUBLE)
                                  * sqrt(nb.sq::DOUBLE)) as cosine
            from dt
            join nrm na on na.doc_id = id_a
            join nrm nb on nb.doc_id = id_b
            where dot::DOUBLE / (sqrt(na.sq::DOUBLE)
                                 * sqrt(nb.sq::DOUBLE))
                  >= {TF_COSINE_T}::DOUBLE
            order by id_a, id_b""",
        "sample_exact_k": rf"""
            select row_number() over (
                     order by md5_number_lower(doc_id::VARCHAR), doc_id)
                   as "rank", doc_id
            from documents
            order by md5_number_lower(doc_id::VARCHAR), doc_id
            limit {SAMPLE_K}""",
        "sample_per_stratum": rf"""
            select lang, "rank", doc_id from (
              select lang, doc_id,
                     row_number() over (
                       partition by lang
                       order by md5_number_lower(doc_id::VARCHAR),
                                doc_id) as "rank"
              from documents)
            where "rank" <= {STRATUM_K}""",
        "weighted_sample_k": rf"""
            with keyed as (
              select doc_id,
                     ln((md5_number_lower(doc_id::VARCHAR)::DOUBLE
                         + 0.5::DOUBLE) * pow(2.0::DOUBLE, -64.0::DOUBLE))
                     / n_chars::DOUBLE as k
              from documents where n_chars > 0)
            select row_number() over (order by k desc, doc_id asc)
                   as "rank", doc_id
            from keyed
            order by k desc, doc_id asc
            limit {SAMPLE_K}""",
        "training_prep": r"""
            with tc as (
              select doc_id, case when trim(text)='' then 0
                     else len(regexp_split_to_array(trim(text),'\s+')) end
                     as n_tokens
              from documents),
            cut as (
              select percentile_disc(0.05) within group
                         (order by n_tokens) as lo,
                     percentile_disc(0.95) within group
                         (order by n_tokens) as hi from tc),
            keepq as (
              select doc_id, n_tokens from tc, cut
              where n_tokens between lo and hi),
            losers as (
              select doc_id from (
                select doc_id, row_number() over
                       (partition by sha256(text) order by doc_id) rn
                from documents) where rn > 1),
            base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            sh as (
              select distinct doc_id, g from (
                select doc_id,
                       arr[p] || ' ' || arr[p+1] || ' ' || arr[p+2] as g
                from (select doc_id, arr,
                             unnest(range(1, len(arr)-1))::INT as p
                      from base where len(arr) >= 3)
                union all
                select doc_id, array_to_string(arr, ' ') as g
                from base where len(arr) < 3)),
            bench as (select distinct g from sh where doc_id % 50 = 0),
            contam as (
              select distinct s.doc_id from sh s join bench b using (g)
              where s.doc_id % 50 <> 0),
            kept as (
              select k.doc_id, k.n_tokens from keepq k
              where k.doc_id % 50 <> 0
                and k.doc_id not in (select doc_id from losers)
                and k.doc_id not in (select doc_id from contam)),
            sp as (
              select n_tokens,
                     case when md5_number_lower(doc_id::VARCHAR)%100 < 80
                          then 'train'
                          when md5_number_lower(doc_id::VARCHAR)%100 < 90
                          then 'valid'
                          else 'test' end as split
              from kept)
            select split, count(*)::BIGINT as n_docs,
                   sum(n_tokens)::BIGINT as n_tokens
            from sp group by split""",
        "length_quantile_filter": r"""
            with tc as (
              select doc_id, case when trim(text)='' then 0
                     else len(regexp_split_to_array(trim(text),'\s+')) end
                     as n_tokens
              from documents),
            cut as (
              select percentile_disc(0.1) within group
                         (order by n_tokens) as lo,
                     percentile_disc(0.9) within group
                         (order by n_tokens) as hi
              from tc)
            select doc_id, n_tokens from tc, cut
            where n_tokens between lo and hi""",
        "commonness_scores": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> ''),
            tf as (
              select doc_id, term, count(*) as tf from toks group by 1, 2),
            g as (select term, sum(tf)::BIGINT as tfg from tf group by term),
            tot as (select sum(tf)::BIGINT as total from tf),
            agg as (
              select t.doc_id, sum(t.tf * g.tfg)::BIGINT as sum_tfg,
                     sum(t.tf)::BIGINT as n_tokens
              from tf t join g using (term) group by t.doc_id)
            select doc_id, sum_tfg, n_tokens,
                   sum_tfg::DOUBLE / (n_tokens::DOUBLE * total::DOUBLE)
                       as commonness
            from agg, tot""",
        "dataset_split": """
            select doc_id,
                   (md5_number_lower(doc_id::VARCHAR) % 100)::BIGINT
                       as bucket,
                   case when md5_number_lower(doc_id::VARCHAR) % 100 < 80
                        then 'train'
                        when md5_number_lower(doc_id::VARCHAR) % 100 < 90
                        then 'valid'
                        else 'test' end as split
            from documents""",
        "decontaminate": r"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            sh as (
              select distinct doc_id, g from (
                select doc_id,
                       arr[p] || ' ' || arr[p+1] || ' ' || arr[p+2] as g
                from (select doc_id, arr,
                             unnest(range(1, len(arr)-1))::INT as p
                      from base where len(arr) >= 3)
                union all
                select doc_id, array_to_string(arr, ' ') as g
                from base where len(arr) < 3)),
            bench as (select distinct g from sh where doc_id % 50 = 0)
            select s.doc_id, count(*)::BIGINT as n_shared_shingles
            from sh s join bench b using (g)
            where s.doc_id % 50 <> 0
            group by s.doc_id""",
        "stratified_sample": """
            select doc_id, lang,
                   (md5_number_lower(doc_id::VARCHAR) % 10000)::BIGINT
                       as bucket
            from documents
            where md5_number_lower(doc_id::VARCHAR) % 10000 <
                  case lang when 'en' then 8000 when 'de' then 5000
                            when 'zh' then 2500 else 1000 end""",
        "deterministic_shuffle": """
            select doc_id,
                   row_number() over (
                       order by md5_number_lower(doc_id::VARCHAR),
                                doc_id)::BIGINT as position
            from documents""",
        "upsample_by_weight": """
            select doc_id, source,
                   unnest(range(case source when 'src0' then 3
                                            when 'src1' then 0
                                            when 'src2' then 2
                                            else 1 end))::BIGINT
                       as copy_id
            from documents""",
        "scrub_pii": rf"""
            select doc_id,
                   regexp_replace(regexp_replace(text,
                       '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_IPV4_RE}', '<IP>', 'g') as clean_text,
                   len(regexp_extract_all(text, '{_EMAIL_RE}'))::BIGINT
                       as n_emails,
                   len(regexp_extract_all(regexp_replace(text,
                       '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_IPV4_RE}'))::BIGINT as n_ips
            from documents""",
        "chunk_documents": r"""
            with toks as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            c as (
              select doc_id, p as chunk_id,
                     array_to_string(
                         arr[p*32+1 : least((p+1)*32, len(arr))], ' ')
                         as chunk_text,
                     (least((p+1)*32, len(arr)) - p*32)::BIGINT
                         as n_tokens
              from (select doc_id, arr,
                           unnest(range(0, (len(arr)+31)//32))::BIGINT
                           as p
                    from toks))
            select doc_id, chunk_id, n_tokens, chunk_text from c""",
        "boolean_match_nostem": rf"""
            with q(query_idx, term) as (values {nostem_rows}),
            toks as (
              select distinct doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                       as term
                from documents where trim(text) <> ''))
            select distinct q.query_idx, t.doc_id
            from q join toks t using (term)""",
        "deleted_match_nostem": rf"""
            with q(query_idx, term) as (values {nostem_rows}),
            toks as (
              select distinct doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                       as term
                from documents where trim(text) <> ''))
            select distinct q.query_idx, t.doc_id
            from q join toks t using (term)
            where t.doc_id not in ({deleted_ids})""",
        "export_postings": r"""
            select term, doc_id, count(*)::BIGINT as tf
            from (select doc_id,
                         unnest(regexp_split_to_array(lower(trim(text)),
                                                      '\s+')) as term
                  from documents where trim(text) <> '')
            group by doc_id, term""",
        "index_fsck": r"""
            with toks as (
              select doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\s+')) as term
                from documents where trim(text) <> ''))
            select (select count(*) from documents)::BIGINT
                       as num_documents,
                   (select count(distinct term) from toks)::BIGINT
                       as num_unique_terms,
                   (select count(*) from
                       (select distinct doc_id, term from toks))::BIGINT
                       as num_postings,
                   (select count(*) from toks)::BIGINT as total_doc_len,
                   true as stats_consistent,
                   true as df_files_consistent,
                   true as doc_ids_unique,
                   0::BIGINT as sha_mismatched_parts,
                   true as ok""",
        "boolean_match_term_routed": rf"""
            with q(query_idx, term) as (values {nostem_rows}),
            toks as (
              select distinct doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                       as term
                from documents where trim(text) <> ''))
            select distinct q.query_idx, t.doc_id
            from q join toks t using (term)""",
        "bm25_topk_term_routed": bm25_nostem_sql,
        "significant_terms": significant_terms_sql,
        "numeric_histogram": numeric_histogram_sql,
        "function_score_topk": function_score_sql,
        "bm25_topk_nostem": bm25_nostem_sql,
        # the federation must reproduce the whole-corpus ranking exactly
        "federated_bm25_nostem": bm25_nostem_sql,
        "proximity_boost_topk": prox_boost_sql,
        "ordered_window_match": ordered_window_sql,
        "bm25f_topk_nostem": bm25f_nostem_sql,
        "ql_topk_nostem": ql_nostem_sql,
        "boosted_bm25_nostem": boosted_bm25_sql,
        "range_filter_match": range_filter_sql,
        "stopword_match": rf"""
            with toks as (
              select distinct doc_id, term from (
                select doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\s+')) as term
                from documents where trim(text) <> '')
              where term not in ({_stop_inlist})),
            q(query_idx, term) as (values {stopword_rows})
            select distinct q.query_idx, t.doc_id
            from q join toks t on t.term = q.term""",
        "term_vectors": rf"""
            select doc_id, term, count(*)::BIGINT as tf
            from (select doc_id,
                         unnest(regexp_split_to_array(lower(trim(text)),
                                                      '\s+')) as term
                  from documents
                  where trim(text) <> ''
                    and doc_id in ({",".join(map(str, TV_DOC_IDS))}))
            group by doc_id, term""",
        "sorted_match": sorted_match_sql,
        "field_stats_match": field_stats_sql,
        "bm25_page2_nostem": bm25_page2_sql,
        "bm25_filtered_nostem": bm25_filtered_sql,
        "rrf_fusion_nostem": rrf_sql,
        "hybrid_rrf": hybrid_sql,
        "spell_correct": spell_sql,
        "related_terms": related_sql,
        "index_statistics_nostem": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> '')
            select (select count(*) from documents)::BIGINT as num_documents,
                   (select count(distinct term) from toks)::BIGINT
                       as num_unique_terms,
                   (select count(*) from
                       (select distinct doc_id, term from toks))::BIGINT
                       as num_postings,
                   (select count(*) from toks)::BIGINT as total_doc_len""",
        "phrase_match_indexed": phrase_indexed_sql,
        "first_positions": first_positions_sql,
        "proximity_match": proximity_sql,
        "ordered_proximity_match": ordered_proximity_sql,
        "prefix_match_nostem": prefix_sql,
        "conjunctive_match": conjunctive_sql,
        "andnot_match": andnot_sql,
        "suggest_terms": suggest_sql,
        "minshould_match": minshould_sql,
        "fuzzy_match_nostem": fuzzy_sql,
        "fuzzy_match_indexed": fuzzy_sql,
        "suffix_match_nostem": suffix_sql,
        "suffix_match_indexed": suffix_sql,
        "tfidf_topk_nostem": tfidf_nostem_sql,
        "faceted_match_counts": faceted_sql,
        "boolean_expr_match": expr_sql,
        "percolate": percolate_sql,
        "field_filter_match": field_filter_sql,
        "synonym_match": synonym_sql,
        # late-r4 surfaces
        "bulk_bm25_topk_nostem": bm25_nostem_sql,
        "regex_match_nostem": regex_match_sql,
        "infix_match_trigram": trgm_infix_sql,
        "regex_match_trigram": trgm_regex_sql,
        "mlt_topk_nostem": mlt_sql,
        "collapsed_topk_nostem": collapsed_sql,
        "oov_rate": oov_sql,
        # sequence packing: window exclusive-cumsum over doc_id order,
        # range-unnest of the covered sequence ids, overlap arithmetic
        "pack_sequences": r"""
            with t as (
              select doc_id,
                     (case when trim(text) = '' then 0
                           else len(regexp_split_to_array(trim(text),
                                                          '\s+'))
                      end)::BIGINT as n
              from documents),
            o as (
              select doc_id, n,
                     coalesce(sum(n) over (order by doc_id
                                           rows between unbounded
                                           preceding and 1 preceding),
                              0)::BIGINT as o
              from t),
            s as (
              select doc_id, n, o,
                     unnest(range(o // 64,
                                  (o + n - 1) // 64 + 1))::BIGINT as seq_id
              from o where n > 0)
            select doc_id, seq_id,
                   (least((seq_id + 1) * 64, o + n)
                    - greatest(seq_id * 64, o))::BIGINT as n_tokens
            from s""",
        "exact_dedup": """
            select sha256(text) as sha256, min(doc_id) as keep_doc_id,
                   count(*) as n_copies
            from documents group by sha256(text)""",
        "ngram_jaccard": ngram_pairs_sql,
        "ngram_containment": ngram_pairs_sql.rsplit("select i.id_a", 1)[0]
        + f"""select i.id_a, i.id_b,
                   i.i::DOUBLE / least(sa.n, sb.n) as containment
            from inter i
            join sz sa on sa.doc_id = i.id_a
            join sz sb on sb.doc_id = i.id_b
            where i.i::DOUBLE / least(sa.n, sb.n)
                  >= {NGRAM_CONTAIN_T}""",
        "dedup_clusters": f"""
            with recursive
            edges(a, b) as (
              select id_a, id_b from ({ngram_pairs_sql})),
            und(a, b) as (
              select a, b from edges union select b, a from edges),
            reach(a, b) as (
              select a, b from und
              union
              select r.a, u.b from reach r join und u on r.b = u.a)
            select n.doc_id,
                   least(n.doc_id, coalesce(min(r.b), n.doc_id))
                       as component
            from documents n left join reach r on r.a = n.doc_id
            group by n.doc_id""",
        "cluster_canonicals": f"""
            with recursive
            edges(a, b) as (
              select id_a, id_b from ({ngram_pairs_sql})),
            und(a, b) as (
              select a, b from edges union select b, a from edges),
            reach(a, b) as (
              select a, b from und
              union
              select r.a, u.b from reach r join und u on r.b = u.a),
            comp as (
              select n.doc_id,
                     least(n.doc_id, coalesce(min(r.b), n.doc_id))
                         as component
              from documents n left join reach r on r.a = n.doc_id
              group by n.doc_id),
            tokc as (
              select doc_id,
                     case when trim(text) = '' then 0
                          else len(regexp_split_to_array(trim(text),
                                                         '\\s+')) end
                     as n_tokens
              from documents),
            j as (
              select c.component, c.doc_id, t.n_tokens
              from comp c join tokc t using (doc_id)),
            win as (
              select component, doc_id, n_tokens,
                     row_number() over (partition by component
                                        order by n_tokens desc,
                                                 doc_id asc) as rn
              from j),
            agg as (
              select component, count(*) as n_members,
                     max(n_tokens) as max_score
              from j group by component)
            select w.component, w.doc_id as keep_doc_id,
                   a.n_members, a.max_score
            from win w join agg a using (component)
            where w.rn = 1
            order by w.component""",
        "rolling_fingerprints": rf"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            tok as (
              select doc_id,
                     unnest(range(1, len(arr)+1))::INT as pos,
                     unnest(arr) as tok,
                     len(arr) as n
              from base),
            th as (
              select doc_id, pos, n,
                     (md5_number_lower(tok)::HUGEINT) % {_P} as h
              from tok),
            pw(e, c) as (values {pw_rows}),
            params as (
              select doc_id, least(16, max(n)) as w from th group by doc_id),
            win as (
              select a.doc_id, a.pos,
                     sum((b.h * pw.c) % {_P}) % {_P} as wh
              from th a
              join params pr using (doc_id)
              join th b on b.doc_id = a.doc_id
                       and b.pos between a.pos and a.pos + pr.w - 1
              join pw on pw.e = pr.w - 1 - (b.pos - a.pos)
              where a.pos + pr.w - 1 <= a.n
              group by a.doc_id, a.pos),
            sel as (select doc_id, min(wh) as fp from win group by doc_id)
            select d.doc_id, coalesce(s.fp, 0)::UBIGINT as fp64
            from documents d left join sel s using (doc_id)""",
        "winnow_fingerprints": rf"""
            with base as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            tok as (
              select doc_id,
                     unnest(range(1, len(arr)+1))::INT as pos,
                     unnest(arr) as tok,
                     len(arr) as n
              from base),
            th as (
              select doc_id, pos, n,
                     (md5_number_lower(tok)::HUGEINT) % {_P} as h
              from tok),
            pw(e, c) as (values {pw_rows}),
            params as (
              select doc_id, least(16, max(n)) as w from th group by doc_id),
            win as (
              select a.doc_id, a.pos,
                     sum((b.h * pw.c) % {_P}) % {_P} as wh
              from th a
              join params pr using (doc_id)
              join th b on b.doc_id = a.doc_id
                       and b.pos between a.pos and a.pos + pr.w - 1
              join pw on pw.e = pr.w - 1 - (b.pos - a.pos)
              where a.pos + pr.w - 1 <= a.n
              group by a.doc_id, a.pos),
            winnow as (
              select doc_id, pos,
                     min(wh) over (partition by doc_id order by pos
                                   rows between current row
                                   and 3 following) as fp,
                     count(*) over (partition by doc_id) as m,
                     row_number() over (partition by doc_id
                                        order by pos) as i
              from win)
            select distinct doc_id, fp::UBIGINT as fp64
            from winnow where i <= greatest(m - 4 + 1, 1)""",
        "language_id": rf"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as tok
              from documents where trim(text) <> ''),
            counts as (
              select doc_id, {lang_counts}, count(*) as n
              from toks group by doc_id),
            scored as (
              select c.doc_id, c.n, {lang_max} as m, c.*
              from counts c)
            select d.doc_id,
                   case when c.m is null or c.m = 0 then 'und'
                        {lang_pick}
                        else '{langs[-1]}' end as pred_lang,
                   case when c.m is null or c.n = 0 then 0.0
                        else c.m::DOUBLE / c.n end as confidence
            from documents d left join scored c using (doc_id)""",
        "simhash_near_dup": r"""
            with toks as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as tok
              from documents where trim(text) <> ''),
            tf as (
              select doc_id, tok, count(*) as cnt
              from toks group by doc_id, tok),
            th as (
              select doc_id, cnt, md5_number_lower(tok) as h from tf),
            votes as (
              select doc_id, b.bit,
                     sum(case when (h >> b.bit) & 1 = 1
                         then cnt else -cnt end) as vote
              from th, (select unnest(range(64)) as bit) b
              group by doc_id, b.bit),
            sims as (
              select doc_id,
                     sum(case when vote > 0
                         then (1::UBIGINT << bit) else 0 end)::UBIGINT
                     as simhash
              from votes group by doc_id),
            allsims as (
              select d.doc_id, coalesce(s.simhash, 0::UBIGINT) as simhash
              from documents d left join sims s using (doc_id))
            select a.doc_id as id_a, b.doc_id as id_b,
                   bit_count(xor(a.simhash, b.simhash))::INT as hamming
            from allsims a join allsims b on a.doc_id < b.doc_id
            where bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "pricing_summary": _rel_mod().PRICING_SUMMARY_SQL,
        "revenue_by_nation": _rel_mod().REVENUE_BY_NATION_SQL,
        "revenue_rollup": _rel_mod().REVENUE_ROLLUP_SQL,
        "customers_without_big_orders":
            _rel_mod().CUSTOMERS_WITHOUT_BIG_ORDERS_SQL,
        "running_totals": _rel_mod().RUNNING_TOTALS_SQL,
        "top_orders_q3": _rel_mod().TOP_ORDERS_SQL,
        "custdist_q13": _rel_mod().CUSTDIST_SQL,
        "orders_skyline": _rel_mod().SKYLINE_SQL,
        "big_volume_q18": _rel_mod().BIG_VOLUME_SQL,
        "tumbling_window": TUMBLING_HOUR_SQL,
        "hopping_window": HOPPING_SQL.format(k=4, hop_us=900 * 1_000_000),
        "value_percentiles": _events_mod().PERCENTILES_SQL,
        "asof_join": _events_mod().ASOF_SQL,
        "range_join": _events_mod().RANGE_JOIN_SQL,
        "funnel_steps": _events_mod().FUNNEL_SQL,
        "cohort_retention": _events_mod().COHORT_SQL,
        "group_ols": _events_mod().OLS_SQL,
        "zscore_normalize": _events_mod().ZSCORE_SQL,
        "event_transitions": _events_mod().TRANSITIONS_SQL,
        "pivot_weekly": _events_mod().PIVOT_WEEKLY_SQL,
        "event_sequences": _events_mod().EVENT_SEQ_SQL,
        "cms_join_size": _sketches_mod().cms_join_size_sql(
            "events", "user_id", "orders", "o_custkey",
            CMS_JOIN_DEPTH, CMS_JOIN_WIDTH),
        "hll_distinct_by_lang": _sketches_mod().hll_group_sql(
            "lang", HLL_P),
        "hll_set_ops_lang": _sketches_mod().hll_set_ops_sql(
            "lang", "en", "de", HLL_P),
        "float_quantiles": _events_mod().FLOAT_QUANTILES_SQL,
        # k >= n => the KLL path retains every element at weight 1 and
        # percentile_disc semantics hold exactly
        "kll_quantiles_exact": _events_mod().FLOAT_QUANTILES_SQL,
        "sessionize": SESSIONIZE_SQL.format(gap=1800),
        "ann_topk": f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select q.vec_id as query_id, t.vec_id as vec_id,
                     ({dot.format(a='q', b='t')}) / (q.nv * t.nv) as sim
              from nrm q, nrm t where q.vec_id in {qids}),
            ranked as (
              select query_id, vec_id,
                     row_number() over (partition by query_id
                                        order by sim desc, vec_id asc) as rank
              from sims)
            select query_id, rank, vec_id from ranked where rank <= {ANN_K}""",
        "pagerank_knn": (f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as src, b.vec_id as dst,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            eranked as (
              select src, dst,
                     row_number() over (partition by src
                                        order by sim desc, dst asc) as rank
              from sims),
            edges as (select src, dst from eranked
                      where rank <= {PAGERANK_KNN_K}),
            n_t as (select count(*)::BIGINT as n from embeddings),
            od as (select src, count(*)::BIGINT as deg
                   from edges group by src),
            r0 as (select vec_id as node, 1.0::DOUBLE / n.n as r
                   from embeddings cross join n_t n)""" + "".join(f""",
            r{i} as (
              select e0.vec_id as node,
                     (1.0::DOUBLE - {PAGERANK_DAMPING}::DOUBLE) / n.n
                     + {PAGERANK_DAMPING}::DOUBLE
                       * coalesce(agg.s, 0.0::DOUBLE) as r
              from embeddings e0 cross join n_t n
              left join (
                select e.dst as node,
                       list_aggregate(list(rp.r / od.deg
                                           order by e.src asc),
                                      'sum') as s
                from edges e
                join r{i - 1} rp on rp.node = e.src
                join od on od.src = e.src
                group by e.dst) agg on agg.node = e0.vec_id)"""
            for i in range(1, PAGERANK_ITERS + 1)) + f"""
            select node, r as pagerank from r{PAGERANK_ITERS}"""),
        "kcore_knn": (f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as src, b.vec_id as dst,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            eranked as (
              select src, dst,
                     row_number() over (partition by src
                                        order by sim desc, dst asc) as rank
              from sims),
            e0 as MATERIALIZED (select src, dst from eranked
                   where rank <= {PAGERANK_KNN_K}),
            a0 as MATERIALIZED (select vec_id as node from embeddings)"""
            + "".join(f""",
            deg{i} as MATERIALIZED (
              select node, count(*)::BIGINT as deg from (
                select e.src as node from e0 e
                join a{i - 1} x on x.node = e.src
                join a{i - 1} y on y.node = e.dst
                union all
                select e.dst from e0 e
                join a{i - 1} x on x.node = e.src
                join a{i - 1} y on y.node = e.dst)
              group by 1),
            a{i} as MATERIALIZED (select a.node from a{i - 1} a
                     join deg{i} d on d.node = a.node
                     where d.deg >= {KCORE_K})"""
            for i in range(1, KCORE_ROUNDS + 1)) + f"""
            select node as vec_id from a{KCORE_ROUNDS}"""),
        "shortest_paths_knn": (f"""
            with recursive nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as src, b.vec_id as dst,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            eranked as (
              select src, dst,
                     row_number() over (partition by src
                                        order by sim desc, dst asc) as rank
              from sims),
            e0 as (select src, dst, rank as w from eranked
                   where rank <= {PAGERANK_KNN_K}),
            edges as (select src, dst, w from e0
                      union all select dst, src, w from e0),
            walk(node, d) as (
              select {BFS_SEED}::BIGINT as node, 0::BIGINT as d
              union
              select e.dst, w2.d + e.w from walk w2
              join edges e on e.src = w2.node
              where w2.d + e.w < {SP_DIST_CAP})
            select node as vec_id, min(d)::BIGINT as dist
            from walk group by 1 having min(d) < {SP_DIST_CAP}"""),
        "label_prop_knn": (f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as src, b.vec_id as dst,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            eranked as (
              select src, dst,
                     row_number() over (partition by src
                                        order by sim desc, dst asc) as rank
              from sims),
            e0 as (select src, dst from eranked
                   where rank <= {PAGERANK_KNN_K}),
            edges as MATERIALIZED (select src, dst from e0
                      union all select dst, src from e0),
            l0 as MATERIALIZED (select vec_id as node,
                   vec_id::BIGINT as label
                   from embeddings)""" + "".join(f""",
            cnt{i} as MATERIALIZED (
              select e.dst as node, l.label, count(*)::BIGINT as c
              from edges e join l{i - 1} l on l.node = e.src
              group by 1, 2),
            pick{i} as MATERIALIZED (
              select node, label, row_number() over
                  (partition by node order by c desc, label asc) as rn
              from cnt{i}),
            l{i} as MATERIALIZED (
              select p0.node, coalesce(p.label, p0.label) as label
              from l{i - 1} p0 left join
                   (select node, label from pick{i} where rn = 1) p
                   on p.node = p0.node)"""
            for i in range(1, LPA_ITERS + 1)) + f"""
            select node as vec_id, label from l{LPA_ITERS}"""),
        "bfs_hops_knn": (f"""
            with recursive nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as src, b.vec_id as dst,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            eranked as (
              select src, dst,
                     row_number() over (partition by src
                                        order by sim desc, dst asc) as rank
              from sims),
            e0 as (select src, dst from eranked
                   where rank <= {PAGERANK_KNN_K}),
            edges as (select src, dst from e0
                      union select dst, src from e0),
            walk(node, d) as (
              select {BFS_SEED}::BIGINT as node, 0::BIGINT as d
              union
              select e.dst, w.d + 1 from walk w
              join edges e on e.src = w.node
              where w.d < {BFS_MAX_HOPS})
            select node as vec_id, min(d)::BIGINT as hops
            from walk group by 1"""),
        "hits_knn": (f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as src, b.vec_id as dst,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            eranked as (
              select src, dst,
                     row_number() over (partition by src
                                        order by sim desc, dst asc) as rank
              from sims),
            edges as (select src, dst from eranked
                      where rank <= {PAGERANK_KNN_K}),
            a1 as (select dst as node, count(*)::BIGINT as s
                   from edges group by dst),
            h1 as (select src as node, sum(a1.s)::BIGINT as s
                   from edges join a1 on a1.node = edges.dst
                   group by src),
            a2 as (select dst as node, sum(h1.s)::BIGINT as s
                   from edges join h1 on h1.node = edges.src
                   group by dst),
            h2 as (select src as node, sum(a2.s)::BIGINT as s
                   from edges join a2 on a2.node = edges.dst
                   group by src)
            select e0.vec_id as node,
                   coalesce(h2.s, 0)::BIGINT as hub,
                   coalesce(a2.s, 0)::BIGINT as authority
            from embeddings e0
            left join h2 on h2.node = e0.vec_id
            left join a2 on a2.node = e0.vec_id
            order by node"""),
        "knn_join": f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as vec_id, b.vec_id as neighbor_id,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            ranked as (
              select vec_id, neighbor_id,
                     row_number() over (partition by vec_id
                                        order by sim desc, neighbor_id asc)
                         as rank
              from sims)
            select vec_id, rank, neighbor_id from ranked
            where rank <= 5""",
        "triangle_count_knn": f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e),
            sims as (
              select a.vec_id as vec_id, b.vec_id as neighbor_id,
                     ({dot.format(a='a', b='b')}) / (a.nv * b.nv) as sim
              from nrm a, nrm b where a.vec_id <> b.vec_id),
            ranked as (
              select vec_id, neighbor_id,
                     row_number() over (partition by vec_id
                                        order by sim desc, neighbor_id asc)
                         as rank
              from sims),
            ed as (
              select distinct least(vec_id, neighbor_id) as a,
                     greatest(vec_id, neighbor_id) as b
              from ranked where rank <= {PAGERANK_KNN_K}),
            tri as (
              select count(*)::BIGINT as n_triangles
              from ed e1
              join ed e2 on e2.a = e1.b
              join ed e3 on e3.a = e1.a and e3.b = e2.b)
            select (select count(*) from ed)::BIGINT as n_edges,
                   n_triangles
            from tri""",
        "hashed_features": rf"""
            with raw as (
              select doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> '')
            select doc_id,
                   (md5_number_lower(term) % {1 << FEATURE_DIM_BITS})::BIGINT
                       as feature_idx,
                   count(*)::BIGINT as tf
            from raw group by 1, 2""",
        "distinct_terms_by_lang": r"""
            with raw as (
              select lang,
                     unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
              from documents where trim(text) <> '')
            select lang, count(distinct term)::BIGINT as n_distinct_terms
            from raw group by lang order by lang""",
        "corpus_checksum": """
            select count(*)::BIGINT as n_docs,
                   bit_xor(md5_number_lower(doc_id::VARCHAR || ':' || text)
                           & 9223372036854775807)::BIGINT as checksum
            from documents""",
        "corpus_diff": """
            with a as (select doc_id, text from documents),
            b as (
              select doc_id,
                     case when doc_id % 7 = 0 then text || ' __r4__'
                          else text end as text
              from documents where doc_id % 13 <> 5
              union all
              select doc_id + 10000000 as doc_id,
                     'added:' || doc_id::VARCHAR as text
              from documents where doc_id % 11 = 3)
            select coalesce(a.doc_id, b.doc_id) as doc_id,
                   case when a.doc_id is null then 'added'
                        when b.doc_id is null then 'removed'
                        else 'changed' end as status
            from a full outer join b on a.doc_id = b.doc_id
            where a.doc_id is null or b.doc_id is null
                  or a.text <> b.text
            order by 1""",
        "decontaminate_indexed": r"""
            with base as (
              select regexp_split_to_array(trim(text),'\s+') as arr
              from documents where trim(text) <> ''),
            refsh as (
              select distinct array_to_string(arr[p+1:p+3], ' ') as g
              from (select arr,
                           unnest(range(0, greatest(len(arr)-2, 1)))::INT
                               as p
                    from base)),
            bdocs as (
              select doc_id,
                     case when doc_id % 7 = 0 then text || ' __r4__'
                          else text end as text
              from documents where doc_id % 13 <> 5
              union all
              select doc_id + 10000000 as doc_id,
                     'added:' || doc_id::VARCHAR as text
              from documents where doc_id % 11 = 3),
            bb as (
              select doc_id, regexp_split_to_array(trim(text),'\s+') as arr
              from bdocs where trim(text) <> ''),
            bsh as (
              select distinct doc_id,
                     array_to_string(arr[p+1:p+3], ' ') as g
              from (select doc_id, arr,
                           unnest(range(0, greatest(len(arr)-2, 1)))::INT
                               as p
                    from bb)),
            per as (
              select b.doc_id, count(*) as n_shingles,
                     sum(case when r.g is not null then 1 else 0 end)
                         as n_hits
              from bsh b left join refsh r using (g)
              group by b.doc_id)
            select doc_id, n_shingles::BIGINT as n_shingles,
                   n_hits::BIGINT as n_hits,
                   n_hits::DOUBLE / n_shingles as hit_fraction
            from per where n_hits >= 1""",
        "embedding_near_dup": f"""
            with nrm as (
              select vec_id, embedding,
                     sqrt({dot.format(a='e', b='e')}) as nv
              from embeddings e)
            select a.vec_id as id_a, b.vec_id as id_b
            from nrm a join nrm b on a.vec_id < b.vec_id
            where ({dot.format(a='a', b='b')}) / (a.nv * b.nv)
                  >= {NEAR_DUP_THRESHOLD}""",
    }
    out["classifier_scores"] = f"""
        with raw as (
          select doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)),'\\s+'))
                 as term
          from documents where trim(text) <> ''),
        wtd as (
          select doc_id,
                 ((md5_number_lower('w1:' ||
                     (md5_number_lower(term)
                      % {1 << CLASSIFIER_DIM_BITS})::VARCHAR)
                   % 17)::BIGINT - 8) as wt
          from raw),
        agg as (
          select doc_id, count(*)::BIGINT as n_tokens,
                 sum(wt)::BIGINT as dot
          from wtd group by doc_id)
        select doc_id, n_tokens, dot,
               1::DOUBLE / (1::DOUBLE
                   + exp(-(dot::DOUBLE / {CLASSIFIER_SCALE}::DOUBLE)))
                   as score
        from agg"""
    out["bigram_perplexity"] = r"""
        with base as (
          select doc_id,
                 regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> ''),
        v as (select count(distinct term) as v
              from (select unnest(arr) as term from base)),
        bg as (
          select doc_id, p as pos, arr[p] as w1, arr[p+1] as w2
          from (select doc_id, arr, unnest(range(1, len(arr)))::INT as p
                from base where len(arr) >= 2)),
        c12 as (select w1, w2, count(*) as c from bg group by 1, 2),
        c1 as (select w1, count(*) as c from bg group by 1),
        lp as (
          select b.doc_id, b.pos,
                 ln((c12.c + 1)::DOUBLE)
                   - ln((c1.c + (select v from v))::DOUBLE) as lp
          from bg b join c12 on b.w1 = c12.w1 and b.w2 = c12.w2
                    join c1 on b.w1 = c1.w1),
        agg as (
          select doc_id, count(*)::BIGINT as n_bigrams,
                 -list_aggregate(list(lp order by pos), 'sum')
                     as neg_logprob
          from lp group by doc_id)
        select doc_id, n_bigrams, neg_logprob,
               exp(neg_logprob / n_bigrams::DOUBLE) as perplexity
        from agg"""
    # corpus-law fits: the four regression sums are ordered folds, the
    # closing slope/intercept expressions share the engine's float64
    # shapes exactly (n::DOUBLE * sxy - sx * sy, etc.)
    out["zipf_fit"] = rf"""
        with tok as (
          select unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
          from documents where trim(text) <> ''),
        tf as (select term, count(*) as c from tok group by 1),
        ranked as (
          select c, row_number() over (order by c desc, term asc) as r
          from tf),
        top as (select r, c from ranked where r <= {ZIPF_TOP_N}),
        s as (select count(*)::BIGINT as n,
          list_aggregate(list(ln(r::DOUBLE) order by r), 'sum') as sx,
          list_aggregate(list(ln(c::DOUBLE) order by r), 'sum') as sy,
          list_aggregate(list(ln(r::DOUBLE) * ln(r::DOUBLE)
                              order by r), 'sum') as sxx,
          list_aggregate(list(ln(r::DOUBLE) * ln(c::DOUBLE)
                              order by r), 'sum') as sxy
          from top),
        fit as (select n,
          (n::DOUBLE * sxy - sx * sy)
              / (n::DOUBLE * sxx - sx * sx) as slope,
          sx, sy from s)
        select n as n_terms, slope,
               (sy - slope * sx) / n::DOUBLE as intercept
        from fit"""
    _heaps_cp = ",".join(f"({c})" for c in HEAPS_CHECKPOINTS)
    out["heaps_fit"] = rf"""
        with tok as (
          select doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
          from documents where trim(text) <> ''),
        cp(n) as (values {_heaps_cp}),
        growth as (
          select cp.n as n_docs,
                 (select count(distinct term) from tok
                  where doc_id <= cp.n) as vocab
          from cp),
        pts as (select n_docs, vocab from growth
                where vocab > 0 and n_docs >= 1),
        s as (select count(*)::BIGINT as n,
          list_aggregate(list(ln(n_docs::DOUBLE)
                              order by n_docs), 'sum') as sx,
          list_aggregate(list(ln(vocab::DOUBLE)
                              order by n_docs), 'sum') as sy,
          list_aggregate(list(ln(n_docs::DOUBLE) * ln(n_docs::DOUBLE)
                              order by n_docs), 'sum') as sxx,
          list_aggregate(list(ln(n_docs::DOUBLE) * ln(vocab::DOUBLE)
                              order by n_docs), 'sum') as sxy
          from pts),
        fit as (select n,
          (n::DOUBLE * sxy - sx * sy)
              / (n::DOUBLE * sxx - sx * sx) as slope,
          sx, sy from s)
        select n as n_points, slope,
               (sy - slope * sx) / n::DOUBLE as intercept
        from fit"""
    out["gap_filled_windows"] = rf"""
        with w as (
          select event_type,
                 to_timestamp((epoch_us(ts) // {GAPFILL_WINDOW_SEC * 1_000_000})
                              * {GAPFILL_WINDOW_SEC})::TIMESTAMP as ws,
                 cast(round(value * 100) as bigint) as cents
          from events),
        b as (select min(ws) as lo, max(ws) as hi from w),
        grid as (
          select t.event_type, gs.ws
          from (select distinct event_type from w) t
          cross join (select unnest(generate_series(
                          (select lo from b), (select hi from b),
                          interval {GAPFILL_WINDOW_SEC} seconds)) as ws) gs),
        agg as (select event_type, ws, count(*)::BIGINT as n,
                       sum(cents)::BIGINT as c
                from w group by 1, 2)
        select g.event_type, g.ws as window_start,
               coalesce(a.n, 0)::BIGINT as n_events,
               coalesce(a.c, 0)::BIGINT as value_cents
        from grid g left join agg a using(event_type, ws)"""
    out["sorted_neighborhood"] = rf"""
        with r as (
          select doc_id,
                 row_number() over (
                   order by substr(lower(trim(coalesce(text, ''))),
                                   1, {SNB_KEY_CHARS}), doc_id
                 )::BIGINT as rk
          from documents)
        select a.doc_id as id_a, b.doc_id as id_b,
               a.rk as rank_a, b.rk as rank_b
        from r a join r b
          on b.rk > a.rk and b.rk <= a.rk + {SNB_WINDOW}"""
    _spectral_cte = rf"""
        with raw as (
          select doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)),'\s+'))
                     as term
          from documents where trim(text) <> ''),
        feats as (
          select doc_id,
                 (md5_number_lower(term)
                  % {1 << SPECTRAL_DIM_BITS})::BIGINT as f,
                 count(*)::BIGINT as tf
          from raw group by 1, 2),
        u1 as (select doc_id, sum(tf)::BIGINT as u
               from feats group by doc_id),
        w1 as (select f, sum(feats.tf * u1.u)::BIGINT as w
               from feats join u1 using(doc_id) group by f),
        u2 as (select doc_id, sum(feats.tf * w1.w)::BIGINT as u
               from feats join w1 using(f) group by doc_id),
        w2 as (select f, sum(feats.tf * u2.u)::BIGINT as w
               from feats join u2 using(doc_id) group by f)"""
    out["spectral_doc_proj"] = _spectral_cte + """,
        u3 as (select doc_id, sum(feats.tf * w2.w)::BIGINT as u
               from feats join w2 using(f) group by doc_id)
        select doc_id, u as proj from u3 order by doc_id"""
    out["spectral_direction"] = _spectral_cte + f"""
        select f as feature_idx, w as score from w2
        order by score desc, feature_idx asc limit {SPECTRAL_TOP_K}"""
    out["edit_join"] = rf"""
        with base as (
          select lang,
                 regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> ''),
        bg as (
          select lang, arr[p] || ' ' || arr[p+1] as b
          from (select lang, arr, unnest(range(1, len(arr)))::INT as p
                from base where len(arr) >= 2)),
        l as (select distinct b from bg where lang = 'en'),
        r as (select distinct b from bg where lang <> 'en')
        select l.b as left_key, r.b as right_key,
               levenshtein(l.b, r.b)::BIGINT as dist
        from l cross join r
        where levenshtein(l.b, r.b) <= {EDIT_JOIN_DIST}"""
    out["pmi_collocations"] = rf"""
        with base as (
          select regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> ''),
        bg as (
          select arr[p] as w1, arr[p+1] as w2
          from (select arr, unnest(range(1, len(arr)))::INT as p
                from base where len(arr) >= 2)),
        c12 as (select w1, w2, count(*) as c from bg group by 1, 2),
        c1 as (select w1, count(*) as c from bg group by 1),
        c2 as (select w2, count(*) as c from bg group by 1),
        t as (select count(*) as t from bg)
        select c12.w1, c12.w2, c12.c as c12,
               ln((c12.c * (select t from t))::DOUBLE)
                 - ln((c1.c * c2.c)::DOUBLE) as pmi
        from c12 join c1 on c12.w1 = c1.w1
                 join c2 on c12.w2 = c2.w2
        where c12.c >= {PMI_MIN_COUNT}"""
    # interpolated Kneser-Ney, self-trained, d = 3/4: the rational-
    # discount decomposition P = ((4*c12 - 3)*B + 3*n1h*nc2)/(4*c1*B)
    # keeps both ln arguments integer — same libm ln on both sides
    out["kneser_ney_perplexity"] = r"""
        with base as (
          select doc_id,
                 regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> ''),
        bg as (
          select doc_id, p as pos, arr[p] as w1, arr[p+1] as w2
          from (select doc_id, arr, unnest(range(1, len(arr)))::INT as p
                from base where len(arr) >= 2)),
        c12 as (select w1, w2, count(*) as c from bg group by 1, 2),
        c1 as (select w1, count(*) as c from bg group by 1),
        n1h as (select w1, count(distinct w2) as c from bg group by 1),
        nc2 as (select w2, count(distinct w1) as c from bg group by 1),
        bt as (select count(*) as b from c12),
        lp as (
          select b.doc_id, b.pos,
                 ln(((4 * c12.c - 3) * (select b from bt)
                     + 3 * n1h.c * nc2.c)::DOUBLE)
                   - ln((4 * c1.c * (select b from bt))::DOUBLE) as lp
          from bg b join c12 on b.w1 = c12.w1 and b.w2 = c12.w2
                    join c1 on b.w1 = c1.w1
                    join n1h on b.w1 = n1h.w1
                    join nc2 on b.w2 = nc2.w2),
        agg as (
          select doc_id, count(*)::BIGINT as n_bigrams,
                 -list_aggregate(list(lp order by pos), 'sum')
                     as neg_logprob
          from lp group by doc_id)
        select doc_id, n_bigrams, neg_logprob,
               exp(neg_logprob / n_bigrams::DOUBLE) as kn_perplexity
        from agg"""
    out["cross_perplexity"] = r"""
        with tbase as (
          select regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> '' and lang = 'en'),
        v as (select count(distinct term) as v
              from (select unnest(arr) as term from tbase)),
        tbg as (
          select arr[p] as w1, arr[p+1] as w2
          from (select arr, unnest(range(1, len(arr)))::INT as p
                from tbase where len(arr) >= 2)),
        c12 as (select w1, w2, count(*) as c from tbg group by 1, 2),
        c1 as (select w1, count(*) as c from tbg group by 1),
        sbase as (
          select doc_id,
                 regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> '' and lang <> 'en'),
        sbg as (
          select doc_id, p as pos, arr[p] as w1, arr[p+1] as w2
          from (select doc_id, arr, unnest(range(1, len(arr)))::INT as p
                from sbase where len(arr) >= 2)),
        lp as (
          select b.doc_id, b.pos,
                 ln((coalesce(c12.c, 0) + 1)::DOUBLE)
                   - ln((coalesce(c1.c, 0) + (select v from v))::DOUBLE)
                     as lp
          from sbg b
          left join c12 on b.w1 = c12.w1 and b.w2 = c12.w2
          left join c1 on b.w1 = c1.w1),
        agg as (
          select doc_id, count(*)::BIGINT as n_bigrams,
                 -list_aggregate(list(lp order by pos), 'sum')
                     as neg_logprob
          from lp group by doc_id)
        select doc_id, n_bigrams, neg_logprob,
               exp(neg_logprob / n_bigrams::DOUBLE) as perplexity
        from agg"""
    out["stupid_backoff"] = r"""
        with tbase as (
          select regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> '' and lang = 'en'),
        tok as (select unnest(arr) as term from tbase),
        v as (select count(distinct term) as v from tok),
        nn as (select count(*) as n from tok),
        c1u as (select term, count(*) as c from tok group by term),
        tbg as (
          select arr[p] as w1, arr[p+1] as w2
          from (select arr, unnest(range(1, len(arr)))::INT as p
                from tbase where len(arr) >= 2)),
        c12 as (select w1, w2, count(*) as c from tbg group by 1, 2),
        sbase as (
          select doc_id,
                 regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> '' and lang <> 'en'),
        sbg as (
          select doc_id, p as pos, arr[p] as w1, arr[p+1] as w2
          from (select doc_id, arr, unnest(range(1, len(arr)))::INT as p
                from sbase where len(arr) >= 2)),
        lp as (
          select b.doc_id, b.pos,
                 case when c12.c is not null
                      then ln(c12.c::DOUBLE) - ln(u1.c::DOUBLE)
                      else ln(0.4::DOUBLE)
                           + ln((coalesce(u2.c, 0) + 1)::DOUBLE)
                           - ln(((select n from nn)
                                 + (select v from v))::DOUBLE)
                 end as lp
          from sbg b
          left join c12 on b.w1 = c12.w1 and b.w2 = c12.w2
          left join c1u u1 on b.w1 = u1.term
          left join c1u u2 on b.w2 = u2.term),
        agg as (
          select doc_id, count(*)::BIGINT as n_bigrams,
                 -list_aggregate(list(lp order by pos), 'sum')
                     as neg_logscore
          from lp group by doc_id)
        select doc_id, n_bigrams, neg_logscore,
               exp(neg_logscore / n_bigrams::DOUBLE) as sb_perplexity
        from agg"""
    # CCNet terciles over the self-trained bigram perplexity table —
    # identical p literals to the engine's ps=(1/3, 2/3); tercile rank
    # semantics parity with percentile_disc is pinned by
    # tests/test_lm_semdedup.py::test_tercile_rank_rule_matches_duckdb
    out["perplexity_buckets"] = f"""
        with ppl as ({out["bigram_perplexity"]}),
        cuts as (
          select percentile_disc({1 / 3!r}::DOUBLE)
                     within group (order by perplexity) as c1,
                 percentile_disc({2 / 3!r}::DOUBLE)
                     within group (order by perplexity) as c2
          from ppl)
        select doc_id, perplexity,
               case when perplexity <= (select c1 from cuts) then 'head'
                    when perplexity <= (select c2 from cuts)
                        then 'middle'
                    else 'tail' end as bucket
        from ppl"""
    _dsir_b = 1 << DSIR_DIM_BITS
    out["dsir_weights"] = rf"""
        with base as (
          select doc_id, lang,
                 regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> ''),
        feats as (
          select doc_id, lang, p as ord,
                 (md5_number_lower(arr[p]) % {_dsir_b})::BIGINT as f
          from (select doc_id, lang, arr,
                       unnest(range(1, len(arr)+1))::INT as p
                from base)
          union all
          select doc_id, lang, len(arr) + p as ord,
                 (md5_number_lower(arr[p] || chr(31) || arr[p+1])
                  % {_dsir_b})::BIGINT as f
          from (select doc_id, lang, arr,
                       unnest(range(1, len(arr)))::INT as p
                from base where len(arr) >= 2)),
        tcnt as (select f, count(*) as c from feats
                 where lang = 'en' group by f),
        rcnt as (select f, count(*) as c from feats group by f),
        nt as (select count(*) as n from feats where lang = 'en'),
        nr as (select count(*) as n from feats),
        lp as (
          select fe.doc_id, fe.ord,
                 ln((coalesce(t.c, 0) + 1)::DOUBLE)
                   - ln(((select n from nt) + {_dsir_b})::DOUBLE)
                   - ln((coalesce(r.c, 0) + 1)::DOUBLE)
                   + ln(((select n from nr) + {_dsir_b})::DOUBLE) as lp
          from feats fe
          left join tcnt t on fe.f = t.f
          left join rcnt r on fe.f = r.f)
        select doc_id, count(*)::BIGINT as n_features,
               list_aggregate(list(lp order by ord), 'sum')
                   as log_weight
        from lp group by doc_id"""
    # DSIR selection: Gumbel-top-k over the weights — the u/key
    # expression shapes mirror weighted_sample_k's proven pair
    out["dsir_select"] = f"""
        with dsir as ({out["dsir_weights"]}),
        keyed as (
          select doc_id,
                 log_weight
                   - ln(-ln(least(
                         (md5_number_lower(doc_id::VARCHAR)::DOUBLE
                          + 0.5::DOUBLE)
                         * pow(2.0::DOUBLE, -64.0::DOUBLE),
                         0.9999999999999999::DOUBLE))) as g
          from dsir)
        select row_number() over (order by g desc, doc_id asc)
               as "rank", doc_id
        from keyed
        order by g desc, doc_id asc
        limit {SAMPLE_K}"""
    # SemDeDup at n_clusters=1 is the exact global sweep, so its
    # components are the transitive closure of the exact near-dup pair
    # graph (the dedup_clusters oracle shape over embeddings)
    out["semantic_dedup_exact"] = f"""
        with recursive
        edges(a, b) as (select id_a, id_b
                        from ({out["embedding_near_dup"]})),
        und(a, b) as (select a, b from edges union
                      select b, a from edges),
        reach(a, b) as (
          select a, b from und
          union
          select r.a, u.b from reach r join und u on r.b = u.a),
        comp as (
          select n.vec_id,
                 least(n.vec_id, coalesce(min(r.b), n.vec_id))
                     as component
          from embeddings n left join reach r on r.a = n.vec_id
          group by n.vec_id)
        select vec_id, component,
               (case when vec_id = component then 1 else 0 end)::BIGINT
                   as keep
        from comp"""
    # the Bloom-prefiltered variant is contract-identical to the
    # exhaustive operator, so it shares the oracle verbatim
    out["decontaminate_bloom"] = out["decontaminate"]
    # IVF at nprobe = n_centroids scans every cell, and PQ at
    # refine·k ≥ N rescores every vector exactly → both exact → both
    # share the brute-force cosine oracle (rank-only)
    out["ann_ivf_exhaustive"] = out["ann_topk"]
    out["pq_exhaustive_refine"] = out["ann_topk"]
    # MMR at lambda=1.0 degenerates exactly to cosine top-k (zero
    # redundancy weight, same (sim desc, vec_id asc) selection fold)
    out["mmr_topk_lambda1"] = out["ann_topk"]
    # beam search over a COMPLETE kNN graph (k = N-1) visits every
    # vector in one hop and keeps the best ef ≥ k → exact → shares the
    # brute-force cosine oracle, while still driving the bucket-pruned
    # write_graph_index/write_vector_index hop path (VERDICT r4 #7)
    out["graph_search_exhaustive"] = out["ann_topk"]
    # probed kNN join at nprobe ≥ #cells runs every block pair → exact
    out["knn_join_probed_exhaustive"] = out["knn_join"]

    # noisy-channel "did you mean": the oracle ENUMERATES the candidate
    # lattice (cross join of per-position candidate sets — bounded by
    # max_dist=1 over the sf vocabulary) and scores every path with the
    # engine's exact float64 expression shapes (integer log arguments,
    # left-fold accumulation), then takes the same
    # (score desc, path asc) argmax — a Viterbi decode checked by an
    # exhaustive oracle.
    _dym_ctes = [
        r"""base as (
          select regexp_split_to_array(lower(trim(text)),'\s+') as arr
          from documents where trim(text) <> '')""",
        r"""uni as (
          select arr[p] as term, count(*)::BIGINT as c
          from (select arr, unnest(range(1, len(arr)+1))::INT as p
                from base)
          group by 1)""",
        r"""nv as (select sum(c)::BIGINT as n, count(*)::BIGINT as v
                   from uni)""",
        r"""big as (
          select arr[p] as w1, arr[p+1] as w2, count(*)::BIGINT as c12
          from (select arr, unnest(range(1, len(arr)))::INT as p
                from base where len(arr) >= 2)
          group by 1, 2)""",
        "hist as (select w1, sum(c12)::BIGINT as ch from big group by 1)",
    ]
    _dym_rows = []
    for _qi, _q in enumerate(DYM_QUERY_SET):
        _ts = _q.strip().lower().split()
        _k = len(_ts)
        for _j, _t in enumerate(_ts, start=1):
            _dym_ctes.append(
                f"c{_qi}_{_j} as ("
                f"select term, levenshtein(term, '{_t}')::BIGINT as d"
                f" from uni"
                f" where levenshtein(term, '{_t}') <= {DYM_MAX_DIST}"
                f" union all select '{_t}', 0::BIGINT"
                f" where not exists"
                f" (select 1 from uni where term = '{_t}'))")
        _score = (f"((ln((coalesce(u1.c, 0) + 1)::DOUBLE)"
                  f" - ln(((select n from nv)"
                  f" + (select v from nv))::DOUBLE))"
                  f" - c1.d * ln({DYM_PEN}))")
        _joins = [f"from c{_qi}_1 c1 left join uni u1 on u1.term = c1.term"]
        for _j in range(2, _k + 1):
            _score += (f" + ((ln((coalesce(b{_j}.c12, 0) + 1)::DOUBLE)"
                       f" - ln((coalesce(h{_j}.ch, 0)"
                       f" + (select v from nv))::DOUBLE))"
                       f" - c{_j}.d * ln({DYM_PEN}))")
            _joins.append(
                f"cross join c{_qi}_{_j} c{_j}"
                f" left join big b{_j} on b{_j}.w1 = c{_j - 1}.term"
                f" and b{_j}.w2 = c{_j}.term"
                f" left join hist h{_j} on h{_j}.w1 = c{_j - 1}.term")
        _sel = ", ".join(f"c{_j}.term as t{_j}" for _j in range(1, _k + 1))
        _ord = ", ".join(f"t{_j} asc" for _j in range(1, _k + 1))
        _dym_ctes.append(
            f"b{_qi} as (select {_sel}, {_score} as score "
            + " ".join(_joins)
            + f" order by score desc, {_ord} limit 1)")
        _dym_rows.extend(
            f"select cast({_qi} as bigint) as query_idx,"
            f" cast({_j} as bigint) as pos, t{_j} as term, score"
            f" from b{_qi}"
            for _j in range(1, _k + 1))
    out["did_you_mean"] = ("with " + ",\n".join(_dym_ctes) + "\n"
                           + "\nunion all\n".join(_dym_rows))

    # distributed suffix array: the oracle materializes every suffix
    # of the SAME corpus string G truncated to SA_MAX_COMPARE code
    # points and ranks them — sound because the engine raises unless
    # doubling converged within that window (no repeat reaches it, so
    # truncated comparisons decide every pair)
    out["suffix_ranks"] = rf"""
        with g as (
          select string_agg(coalesce(lower(trim(text)), '') || chr(1),
                            '' order by doc_id) as s
          from documents),
        p as (select unnest(range(1,
                     length((select s from g)) + 1)) as p),
        sfx as (select p, substr(g.s, p::INT, {SA_MAX_COMPARE}) as suf
                from g cross join p),
        r as (select p, rank() over (order by suf) as rk from sfx)
        select (p - 1)::BIGINT as pos, (rk - 1)::BIGINT as "rank"
        from r where (p - 1) % {SA_STRIDE} = 0"""
    # ExactSubstr coverage: the independent fixed-length formulation —
    # L-grams of G occurring >= 2 times, starts attributed to the doc
    # whose char range wholly contains the window, per-doc interval
    # union via gaps-and-islands (an island's cover = last - first + L)
    out["sa_dup_coverage"] = rf"""
        with docs as (
          select doc_id, coalesce(lower(trim(text)), '') as t
          from documents),
        offs as (
          select doc_id, length(t) as len,
                 coalesce(sum(length(t) + 1) over (order by doc_id
                     rows between unbounded preceding and 1 preceding),
                     0) as off
          from docs),
        g as (select string_agg(t || chr(1), '' order by doc_id) as s
              from docs),
        p as (select unnest(range(1,
                     length((select s from g)) - {SA_DUP_LEN} + 2))
                     as p),
        grams as (select p, substr(g.s, p::INT, {SA_DUP_LEN}) as gram
                  from g cross join p),
        dup as (select gram from grams
                group by gram having count(*) >= 2),
        starts as (
          select o.doc_id, g2.p - 1 - o.off as lp, o.len
          from grams g2 join dup using (gram)
          join offs o on g2.p - 1 >= o.off
                     and g2.p - 1 + {SA_DUP_LEN} <= o.off + o.len),
        isl as (
          select doc_id, lp, len,
                 case when lag(lp) over (partition by doc_id
                          order by lp) is null
                       or lp - lag(lp) over (partition by doc_id
                          order by lp) > {SA_DUP_LEN}
                      then 1 else 0 end as brk
          from starts),
        isl2 as (
          select doc_id, lp, len,
                 sum(brk) over (partition by doc_id order by lp
                     rows between unbounded preceding and current row)
                     as island
          from isl),
        cov as (
          select doc_id, len,
                 max(lp) - min(lp) + {SA_DUP_LEN} as c
          from isl2 group by doc_id, len, island)
        select doc_id, max(len)::BIGINT as n_chars,
               sum(c)::BIGINT as n_dup_chars,
               (sum(c)::DOUBLE / max(len)::DOUBLE)
                   as dup_char_fraction
        from cov group by doc_id"""

    # LCP array / longest repeated substring: adjacent-suffix pairs in
    # suffix-array order, then the SAME binary descent the engine runs
    # — 10 chained CTEs each testing one power-of-two window with
    # substr equality. Window arithmetic never crosses the truncation:
    # before testing bit b, lo <= 1024 - 2b, so the window ends at
    # lo + b <= 1024 - b. A partial (string-end) window can only
    # compare equal if the two suffixes were equal outright —
    # impossible — so every matched window contributes its full width.
    def _lcp_stack() -> tuple[str, str]:
        bits = []
        b = SA_MAX_COMPARE // 2
        while b >= 1:
            bits.append(b)
            b //= 2
        ctes = [rf"""g as (
          select string_agg(coalesce(lower(trim(text)), '') || chr(1),
                            '' order by doc_id) as s
          from documents),
        p as (select unnest(range(1,
                     length((select s from g)) + 1)) as p),
        sfx as (select p, substr(g.s, p::INT, {SA_MAX_COMPARE}) as suf
                from g cross join p),
        r as (select p, suf, lag(suf) over (order by suf) as prv
              from sfx),
        d0 as (select p, suf, prv, 0::BIGINT as lo
               from r where prv is not null)"""]
        prev = "d0"
        for i, bit in enumerate(bits, start=1):
            ctes.append(
                f"d{i} as (select p, suf, prv, lo + (case when "
                f"substr(suf, (lo + 1)::INT, {bit}) = "
                f"substr(prv, (lo + 1)::INT, {bit}) "
                f"then {bit} else 0 end) as lo from {prev})")
            prev = f"d{i}"
        return "with " + ",\n        ".join(ctes), prev

    def _cross_lcp_stack() -> tuple[str, str]:
        bits = []
        b = SA_MAX_COMPARE // 2
        while b >= 1:
            bits.append(b)
            b //= 2
        ctes = [rf"""d0docs as (
          select doc_id, coalesce(lower(trim(text)), '') as t,
                 case when lang = 'en' then 0 else 1 end as tag
          from documents),
        lens as (select doc_id, tag, length(t) + 1 as l from d0docs),
        offs as (select doc_id, tag, l,
                        coalesce(sum(l) over (order by doc_id
                                  rows between unbounded preceding
                                  and 1 preceding), 0) as off
                 from lens),
        own as (select off + unnest(range(1, l))::BIGINT as p, tag
                from offs),
        g as (select string_agg(t || chr(1), '' order by doc_id) as s
              from d0docs),
        p as (select unnest(range(1,
                     length((select s from g)) + 1)) as p),
        sfx as (select p, substr(g.s, p::INT, {SA_MAX_COMPARE}) as suf
                from g cross join p),
        r as (select p, suf, lag(suf) over (order by suf) as prv,
                     lag(p) over (order by suf) as pp
              from sfx),
        x0 as (select r.p, suf, prv, 0::BIGINT as lo
               from r join own oa on oa.p = r.p
                      join own ob on ob.p = r.pp
               where r.prv is not null and oa.tag <> ob.tag)"""]
        prev = "x0"
        for i, bit in enumerate(bits, start=1):
            ctes.append(
                f"x{i} as (select p, suf, prv, lo + (case when "
                f"substr(suf, (lo + 1)::INT, {bit}) = "
                f"substr(prv, (lo + 1)::INT, {bit}) "
                f"then {bit} else 0 end) as lo from {prev})")
            prev = f"x{i}"
        return "with " + ",\n        ".join(ctes), prev

    _xlcp_with, _xlcp_last = _cross_lcp_stack()
    out["cross_common_substring"] = (
        f"{_xlcp_with}\n"
        f"        select coalesce(max(lo), 0)::BIGINT as "
        f"cross_common_len from {_xlcp_last}")
    _lcp_with, _lcp_last = _lcp_stack()
    out["suffix_lcp"] = (
        f"{_lcp_with}\n"
        f"        select (p - 1)::BIGINT as pos, lo::BIGINT as lcp\n"
        f"        from {_lcp_last} where (p - 1) % {SA_STRIDE} = 0")
    _nsub = "(select length(s) from g)::BIGINT"
    out["distinct_substrings"] = (
        f"{_lcp_with}\n"
        f"        select {_nsub} as n_chars,\n"
        f"               ({_nsub} * ({_nsub} + 1) // 2\n"
        f"                - coalesce(sum(lo), 0))::BIGINT\n"
        f"                   as n_distinct_substrings from {_lcp_last}")
    out["longest_repeat"] = (
        f"{_lcp_with}\n"
        f"        select coalesce(max(lo), 0)::BIGINT as "
        f"longest_repeat from {_lcp_last}")
    return out
