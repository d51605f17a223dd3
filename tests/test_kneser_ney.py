"""Interpolated Kneser-Ney bigram LM: bit-identical to a pure-Python
reference built from the rational-discount integer-log decomposition,
and semantically equal to the textbook float formulation."""

import math

import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.lm import kneser_ney_scores


def ref_scores(texts, p=3, q=4):
    """Pure-Python KN over the same corpus, via the SAME integer-log
    shapes the engine and the SQL oracle use (ln of int, left fold)."""
    def toks(t):
        return t.strip().lower().split()
    c12, c1, conts, hists = {}, {}, {}, {}
    for t in texts:
        ws = toks(t)
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
            conts.setdefault(a, set()).add(b)
            hists.setdefault(b, set()).add(a)
    big_b = len(c12)
    out = {}
    for d, t in enumerate(texts):
        ws = toks(t)
        if len(ws) < 2:
            continue
        total = 0.0
        for a, b in zip(ws, ws[1:]):
            num = (q * c12[(a, b)] - p) * big_b \
                + p * len(conts[a]) * len(hists[b])
            den = q * c1[a] * big_b
            total += math.log(num) - math.log(den)
        neg = -total
        out[d] = (len(ws) - 1, neg, math.exp(neg / (len(ws) - 1)))
    return out


def textbook_prob(texts, a, b, d=0.75):
    """The classic float formulation, for semantic cross-checking."""
    c12, c1, conts, hists = {}, {}, {}, {}
    for t in texts:
        ws = t.strip().lower().split()
        for x, y in zip(ws, ws[1:]):
            c12[(x, y)] = c12.get((x, y), 0) + 1
            c1[x] = c1.get(x, 0) + 1
            conts.setdefault(x, set()).add(y)
            hists.setdefault(y, set()).add(x)
    big_b = len(c12)
    return (max(c12.get((a, b), 0) - d, 0.0) / c1[a]
            + d * len(conts[a]) / c1[a] * len(hists[b]) / big_b)


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)


CORPUS = ["the cat sat on the mat", "the dog chased the cat",
          "a mat for a cat", "dogs and cats and dogs",
          "", "  ", "single", "the cat the cat the cat",
          "san francisco is on the bay"]


def test_bit_identical_to_reference(ray_session):
    rows = kneser_ney_scores(_ds(CORPUS), num_parts=4).take_all()
    got = {r["doc_id"]: (r["n_bigrams"], r["neg_logprob"],
                         r["kn_perplexity"]) for r in rows}
    assert got == ref_scores(CORPUS)   # exact float equality
    # blank / single-token docs emit no row
    assert set(got) == {0, 1, 2, 3, 7, 8}


def test_matches_textbook_formulation(ray_session):
    # the rational decomposition IS the textbook interpolated KN:
    # per-bigram probs agree to float tolerance for d = 3/4
    for pair in [("the", "cat"), ("a", "mat"), ("san", "francisco")]:
        num_den = ref_scores(["%s %s" % pair] + CORPUS)
        p_text = textbook_prob(["%s %s" % pair] + CORPUS, *pair)
        lp = -num_den[0][1]
        assert math.isclose(math.exp(lp), p_text, rel_tol=1e-12)


def test_continuation_count_bites(ray_session):
    # 'francisco' only ever follows 'san': its continuation count is 1
    # even though we inflate its raw frequency — KN must score
    # P(francisco | the) context-poor vs a same-frequency diverse word.
    corpus = (["san francisco"] * 6
              + ["the bay", "a bay", "big bay", "blue bay",
                 "cold bay", "my bay"]
              + ["the francisco problem"])  # one 'the francisco' bigram
    ref = ref_scores(corpus)
    got = {r["doc_id"]: (r["n_bigrams"], r["neg_logprob"],
                         r["kn_perplexity"])
           for r in kneser_ney_scores(_ds(corpus),
                                      num_parts=4).take_all()}
    assert got == ref
    # semantic check via the textbook form: continuation mass of
    # 'bay' (6 distinct histories) far exceeds 'francisco' (2)
    assert (textbook_prob(corpus, "my", "bay")
            > textbook_prob(corpus, "the", "francisco") / 3)


def test_discount_ratio_forwarded(ray_session):
    got = {r["doc_id"]: r["neg_logprob"]
           for r in kneser_ney_scores(_ds(CORPUS), discount=(1, 2),
                                      num_parts=4).take_all()}
    want = {d: v[1] for d, v in ref_scores(CORPUS, p=1, q=2).items()}
    assert got == want


def test_bad_discount_raises(ray_session):
    with pytest.raises(ValueError, match="integer ratio"):
        kneser_ney_scores(_ds(CORPUS), discount=(4, 4), num_parts=2)
    with pytest.raises(ValueError, match="integer ratio"):
        kneser_ney_scores(_ds(CORPUS), discount=(0.75, 1), num_parts=2)
