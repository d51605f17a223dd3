"""Salted hot-history path parity (VERDICT r4 "what's wrong" #2).

A planted corpus where one token ("the") is the history of ~40% of all
bigrams — the web-scale skew shape — must produce BIT-identical scores
whether the salted path is off (single-exchange, the pre-r5 shape),
forced on with a threshold low enough to also catch warm keys, or left
on "auto". Covers all three LM scorers, self and cross modes.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.lm import (
    bigram_logprob_scores, kneser_ney_scores, stupid_backoff_scores)


@pytest.fixture(scope="module")
def hot_corpus(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for _ in range(500):
        toks = []
        for _ in range(rng.integers(5, 30)):
            if rng.random() < 0.4:
                toks += ["the", vocab[rng.integers(0, 60)]]
            else:
                toks.append(vocab[rng.integers(0, 60)])
        docs.append(" ".join(toks))
    return pa.table({
        "doc_id": pa.array(np.arange(500, dtype=np.int64)),
        "text": pa.array(docs),
    })


def _df(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _identical(a, b, cols):
    assert len(a) == len(b)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


@pytest.mark.parametrize("thr", [5, "auto"])
def test_bigram_salted_bit_identical(hot_corpus, thr):
    ds = rd.from_arrow(hot_corpus)
    base = _df(bigram_logprob_scores(ds, hot_threshold=None))
    salted = _df(bigram_logprob_scores(ds, hot_threshold=thr))
    _identical(base, salted,
               ["doc_id", "n_bigrams", "neg_logprob", "perplexity"])


def test_bigram_salted_cross_mode(hot_corpus):
    train = rd.from_arrow(hot_corpus.slice(0, 250))
    score = rd.from_arrow(hot_corpus.slice(250))
    base = _df(bigram_logprob_scores(score, train=train,
                                     hot_threshold=None))
    salted = _df(bigram_logprob_scores(score, train=train,
                                       hot_threshold=5))
    _identical(base, salted,
               ["doc_id", "n_bigrams", "neg_logprob", "perplexity"])


def test_stupid_backoff_salted(hot_corpus):
    ds = rd.from_arrow(hot_corpus)
    base = _df(stupid_backoff_scores(ds, hot_threshold=None))
    salted = _df(stupid_backoff_scores(ds, hot_threshold=5))
    _identical(base, salted,
               ["doc_id", "n_bigrams", "neg_logscore", "sb_perplexity"])


def test_stupid_backoff_salted_cross(hot_corpus):
    train = rd.from_arrow(hot_corpus.slice(0, 250))
    score = rd.from_arrow(hot_corpus.slice(250))
    base = _df(stupid_backoff_scores(score, train=train,
                                     hot_threshold=None))
    salted = _df(stupid_backoff_scores(score, train=train,
                                       hot_threshold=5))
    _identical(base, salted,
               ["doc_id", "n_bigrams", "neg_logscore", "sb_perplexity"])


def test_kneser_ney_salted(hot_corpus):
    ds = rd.from_arrow(hot_corpus)
    base = _df(kneser_ney_scores(ds, hot_threshold=None))
    salted = _df(kneser_ney_scores(ds, hot_threshold=5))
    _identical(base, salted,
               ["doc_id", "n_bigrams", "neg_logprob", "kn_perplexity"])


def test_auto_threshold_no_hot_keys_is_noop(ray_session):
    # a uniform corpus never crosses the auto threshold — the detection
    # pass must find nothing and leave the plain path bit-intact
    rng = np.random.default_rng(9)
    docs = [" ".join(f"t{rng.integers(0, 500)}" for _ in range(20))
            for _ in range(200)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "text": pa.array(docs)}))
    base = _df(bigram_logprob_scores(ds, hot_threshold=None))
    auto = _df(bigram_logprob_scores(ds, hot_threshold="auto"))
    _identical(base, auto, ["doc_id", "neg_logprob", "perplexity"])
