"""Noisy-channel phrase correction: the Viterbi decode must equal an
exhaustive enumeration of the candidate lattice under the documented
integer-log scoring, including the (score desc, path asc) tie-break."""

import itertools
import math

import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.didyoumean import did_you_mean


def _lev(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[lb]


def _exhaustive(texts, query, max_dist=1, pen=16):
    """Enumerate every path like the SQL oracle does."""
    toks = [t.strip().lower().split() for t in texts]
    vocab = {}
    c12, c1h = {}, {}
    n = 0
    for ws in toks:
        n += len(ws)
        for w in ws:
            vocab[w] = vocab.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1h[a] = c1h.get(a, 0) + 1
    v = len(vocab)
    qs = query.strip().lower().split()
    cands = []
    for q in qs:
        cs = {t: _lev(q, t) for t in vocab if _lev(q, t) <= max_dist}
        if q not in cs:
            cs[q] = 0
        cands.append(sorted(cs.items()))
    best = None
    log_pen = math.log(pen)
    for path in itertools.product(*cands):
        ws = tuple(w for w, _ in path)
        s = (math.log(vocab.get(ws[0], 0) + 1) - math.log(n + v)) \
            - float(path[0][1]) * log_pen
        for i in range(1, len(ws)):
            s += (math.log(c12.get((ws[i - 1], ws[i]), 0) + 1)
                  - math.log(c1h.get(ws[i - 1], 0) + v)) \
                - float(path[i][1]) * log_pen
        key = (s, ws)
        if best is None or s > best[0] or \
                (s == best[0] and ws < best[1]):
            best = key
    return best


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)


CORPUS = ["hash join beats merge join", "sort merge join is stable",
          "hash table scan", "the fast scan wins", "merge sort",
          "a hash can clash", "fast hash fast scan", ""]


def test_decode_equals_exhaustive(ray_session):
    queries = ["hsah join", "fist scan", "merg sort", "zzz join",
               "hash"]
    out = did_you_mean(_ds(CORPUS), queries, max_dist=1).to_pylist()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_idx"], []).append(r)
    for qi, q in enumerate(queries):
        want_score, want_path = _exhaustive(CORPUS, q)
        rows = sorted(by_q[qi], key=lambda r: r["pos"])
        assert tuple(r["term"] for r in rows) == want_path
        assert all(r["score"] == want_score for r in rows)


def test_correction_semantics(ray_session):
    # pen=4 keeps the channel penalty (ln 4 per edit) below the LM gain
    # at this tiny corpus scale; the sf-scale gate uses the default 16.
    # 'hach' -> 'hash' is one substitution; plain-Levenshtein
    # transpositions like 'hsah' cost 2 and need max_dist=2
    out = did_you_mean(_ds(CORPUS), ["hach join"], max_dist=1, pen=4)
    assert [r["term"] for r in
            sorted(out.to_pylist(), key=lambda r: r["pos"])] == \
        ["hash", "join"]
    # two edits: the channel charge doubles, so only pen=2 keeps it
    # below the 'hash' LM gain in this 27-token corpus
    out1 = did_you_mean(_ds(CORPUS), ["hsah join"], max_dist=2, pen=2)
    assert [r["term"] for r in
            sorted(out1.to_pylist(), key=lambda r: r["pos"])] == \
        ["hash", "join"]
    # context disambiguates: 'fst' alone could be 'fast'; before 'scan'
    # the bigram 'fast scan' must win over any same-distance rival
    out2 = did_you_mean(_ds(CORPUS), ["fst scan"], max_dist=2, pen=4)
    terms = [r["term"] for r in
             sorted(out2.to_pylist(), key=lambda r: r["pos"])]
    assert terms == list(
        _exhaustive(CORPUS, "fst scan", max_dist=2, pen=4)[1])


def test_oov_token_survives(ray_session):
    out = did_you_mean(_ds(CORPUS), ["qqqqqqq join"],
                       max_dist=1).to_pylist()
    assert [r["term"] for r in sorted(out, key=lambda r: r["pos"])] == \
        ["qqqqqqq", "join"]


def test_empty_query_and_max_dist2(ray_session):
    out = did_you_mean(_ds(CORPUS), ["", "  ", "hsh jin"], max_dist=2)
    rows = out.to_pylist()
    assert {r["query_idx"] for r in rows} == {2}
    want = _exhaustive(CORPUS, "hsh jin", max_dist=2)
    assert tuple(r["term"] for r in
                 sorted(rows, key=lambda r: r["pos"])) == want[1]


def test_pen_validation(ray_session):
    with pytest.raises(ValueError, match="integer"):
        did_you_mean(_ds(CORPUS), ["x"], pen=1)
    with pytest.raises(ValueError, match="integer"):
        did_you_mean(_ds(CORPUS), ["x"], pen=2.5)
