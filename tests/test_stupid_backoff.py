"""Stupid Backoff LM: bit-identical to a pure-Python reference in self
and cross modes; backoff path really fires in cross mode."""

import math

import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.lm import stupid_backoff_scores


def ref_scores(score_texts, train_texts, backoff=0.4):
    def toks(t):
        return t.strip().lower().split()
    c12, c1u, c2u = {}, {}, {}
    n_total = 0
    vocab = set()
    for t in train_texts:
        ws = toks(t)
        n_total += len(ws)
        vocab.update(ws)
        for w in ws:
            c1u[w] = c1u.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c2u = c1u
    v = len(vocab)
    log_b = math.log(backoff)
    log_nv = math.log(n_total + v)
    out = {}
    for d, t in enumerate(score_texts):
        ws = toks(t)
        if len(ws) < 2:
            continue
        total = 0.0
        for a, b in zip(ws, ws[1:]):
            c = c12.get((a, b), 0)
            if c > 0:
                lp = math.log(c) - math.log(c1u[a])
            else:
                lp = (log_b + math.log(c2u.get(b, 0) + 1)) - log_nv
            total += lp
        neg = -total
        out[d] = (len(ws) - 1, neg, math.exp(neg / (len(ws) - 1)))
    return out


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)


TRAIN = ["the cat sat on the mat", "the dog chased the cat",
         "a mat for a cat", "dogs and cats and dogs"]
SCORE = ["the cat sat", "the zebra jumped over the moon", "",
         "cat", "mat mat the cat sat on"]


def _got(score, train=None, **kw):
    ds = _ds(score)
    tr = _ds(train) if train is not None else None
    rows = stupid_backoff_scores(ds, train=tr, num_parts=4,
                                 **kw).take_all()
    return {r["doc_id"]: (r["n_bigrams"], r["neg_logscore"],
                          r["sb_perplexity"]) for r in rows}


def test_cross_mode_bit_identical(ray_session):
    got = _got(SCORE, TRAIN)
    want = ref_scores(SCORE, TRAIN)
    assert got == want          # exact float equality
    # the backoff path really fired: changing the backoff constant
    # moves the zebra doc's score (unseen bigrams + OOV 'zebra') but
    # leaves the fully-seen doc 0 untouched
    want9 = ref_scores(SCORE, TRAIN, backoff=0.9)
    assert want9[0] == want[0]
    assert want9[1][1] != want[1][1]


def test_self_mode_backoff_never_fires(ray_session):
    got = _got(SCORE)
    want = ref_scores(SCORE, SCORE)
    assert got == want
    # self-trained: every scored bigram seen, scores are finite & tame
    assert all(math.isfinite(v[1]) for v in got.values())


def test_backoff_literal_forwarded(ray_session):
    got = _got(SCORE, TRAIN, backoff=0.25)
    want = ref_scores(SCORE, TRAIN, backoff=0.25)
    assert got == want


def test_empty_train_raises(ray_session):
    import pytest
    with pytest.raises(ValueError, match="no tokens"):
        stupid_backoff_scores(_ds(["a b"]), train=_ds(["", "  "]),
                              num_parts=2)
