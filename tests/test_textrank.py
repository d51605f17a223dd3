"""TextRank keywords: bit-identical to a pure-Python reference
(ordered folds), tie-breaks, degenerate corpora."""

from collections import defaultdict

import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.ngrams import textrank_keywords


def ref_textrank(texts, iters=3, d=0.85):
    """Flat-teleport WEIGHTED TextRank with the engine's fold order:
    one row per distinct ordered pair, contribution (r/deg)·w, per-dst
    sums in ascending-src order."""
    toks = [t.strip().lower().split() for t in texts]
    vocab = sorted({w for ts in toks for w in ts})
    idx = {w: i for i, w in enumerate(vocab)}
    w = defaultdict(int)
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            if a != b:
                w[(idx[a], idx[b])] += 1
                w[(idx[b], idx[a])] += 1
    deg = [0] * len(vocab)
    for (s, _), c in w.items():
        deg[s] += c
    r = [1.0] * len(vocab)
    for _ in range(iters):
        by_dst = defaultdict(list)
        for s, t in w:
            by_dst[t].append(s)
        nxt = [0.0] * len(vocab)
        for t, srcs in by_dst.items():
            tot = 0.0
            for s in sorted(srcs):
                tot += (r[s] / deg[s]) * w[(s, t)]
            nxt[t] = tot
        r = [(1.0 - d) + d * x for x in nxt]
    return {wd: r[i] for wd, i in idx.items()}


def _run(texts, k, **kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)
    tbl = textrank_keywords(ds, k=k, **kw)
    return list(zip(tbl["term"].to_pylist(), tbl["textrank"].to_pylist()))


TEXTS = ["the cat sat on the mat", "the dog chased the cat",
         "a mat for the cat", "", "dog dog dog", "solo"]


def test_bit_identical_to_reference(ray_session):
    want = ref_textrank(TEXTS)
    got = _run(TEXTS, k=100)
    assert len(got) == len(want)
    for term, score in got:
        assert score == want[term], term   # exact float equality
    # ordered (score desc, term asc)
    keys = [(-s, t) for t, s in got]
    assert keys == sorted(keys)


def test_hub_term_ranks_first(ray_session):
    got = _run(TEXTS, k=3)
    assert got[0][0] == "the"   # highest-degree word wins


def test_isolated_terms_sit_at_teleport(ray_session):
    # 'solo' and the self-loop-only 'dog dog dog' doc: 'solo' has no
    # edges at all -> rank exactly 1 - d
    want = ref_textrank(TEXTS)
    assert want["solo"] == 1.0 - 0.85
    got = dict(_run(TEXTS, k=100))
    assert got["solo"] == 1.0 - 0.85


def test_empty_corpus(ray_session):
    assert _run(["", "   "], k=5) == []


def test_iters_and_damping_forwarded(ray_session):
    want = ref_textrank(TEXTS, iters=5, d=0.5)
    got = dict(_run(TEXTS, k=100, iters=5, damping=0.5))
    assert got == {t: want[t] for t in got} and len(got) == len(want)
