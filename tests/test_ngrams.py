"""Edge cases for the corpus n-gram family (functions/ngrams.py) and
the exact-k sampler — the driver-gate parity lives in
test_driver_contract; these pin the semantics on adversarial shapes."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.ngrams import (dup_ngram_fraction,
                                                 ngram_counts,
                                                 phrase_match)
from ts_type_filter_ray.functions.sampling import sample_exact_k


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def test_ngram_counts_blank_and_short_docs(ray_session):
    ds = _docs([(0, "a b a b"), (1, ""), (2, "   "), (3, "solo"),
                (4, "A B")])  # lowercased => 'a b'
    out = {r["ngram"]: r["count"]
           for r in ngram_counts(ds, n=2, k=10).take_all()}
    assert out == {"a b": 3, "b a": 1}


def test_ngram_counts_never_crosses_doc_boundary(ray_session):
    ds = _docs([(0, "x y"), (1, "y z")])
    out = {r["ngram"]: r["count"]
           for r in ngram_counts(ds, n=2, k=10).take_all()}
    assert "y y" not in out
    assert out == {"x y": 1, "y z": 1}


def test_ngram_counts_trigram_and_unigram(ray_session):
    ds = _docs([(0, "p q r p q r")])
    tri = {r["ngram"]: r["count"]
           for r in ngram_counts(ds, n=3, k=10).take_all()}
    assert tri["p q r"] == 2 and tri["q r p"] == 1
    uni = {r["ngram"]: r["count"]
           for r in ngram_counts(ds, n=1, k=10).take_all()}
    assert uni == {"p": 2, "q": 2, "r": 2}


def test_phrase_match_boundaries(ray_session):
    ds = _docs([
        (0, "alpha beta gamma"),        # phrase at start
        (1, "x alpha beta"),            # phrase at end
        (2, "alphabeta gamma"),         # no token boundary -> no match
        (3, "ALPHA   BETA tail"),       # case + multi-space normalize
        (4, ""),
    ])
    out = phrase_match(ds, ["alpha beta", "gamma", "missing phrase"]
                       ).take_all()
    got = {(r["phrase_idx"], r["doc_id"]) for r in out}
    assert got == {(0, 0), (0, 1), (0, 3), (1, 0), (1, 2)}


def test_dup_ngram_fraction_exact_small(ray_session):
    ds = _docs([
        (0, "a b c d"),     # shingles: abc, bcd
        (1, "a b c x"),     # shingles: abc, bcx
        (2, "q r"),         # short doc -> whole text 'q r'
        (3, "q r"),         # duplicate short doc
        (4, ""),            # no shingles -> absent
    ])
    out = {r["doc_id"]: r for r in dup_ngram_fraction(ds, 3).take_all()}
    assert set(out) == {0, 1, 2, 3}
    assert (out[0]["n_shingles"], out[0]["n_dup_shingles"]) == (2, 1)
    assert (out[1]["n_shingles"], out[1]["n_dup_shingles"]) == (2, 1)
    assert out[0]["dup_fraction"] == 0.5
    assert (out[2]["n_shingles"], out[2]["n_dup_shingles"]) == (1, 1)
    assert out[3]["dup_fraction"] == 1.0


def test_sample_exact_k_deterministic_and_bounded(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(500), type=pa.int64())}))
    a = sample_exact_k(ds, k=7)
    b = sample_exact_k(ds, k=7)
    assert a.equals(b)                      # rerun-identical
    assert a.num_rows == 7
    assert a["rank"].to_pylist() == list(range(1, 8))
    # k exceeding the corpus returns every row, still ranked
    c = sample_exact_k(ds.limit(3), k=10)
    assert c.num_rows == 3
    # ranks follow md5 order, not id order
    import hashlib
    key = {d: int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:],
                             "little") for d in range(500)}
    exp = sorted(range(500), key=lambda d: (key[d], d))[:7]
    assert a["doc_id"].to_pylist() == exp


def test_cooccurrence_counts_semantics(ray_session):
    from ts_type_filter_ray.functions.ngrams import cooccurrence_counts
    # docs: 'a b' together in 3 docs, 'a c' in 2, 'b c' in 2; 'z' df=1
    ds = _docs([(0, "a b c"), (1, "A b c z"), (2, "a a b"), (3, ""),
                (4, "a c d"), (5, "d b")])
    out = [(r["term_a"], r["term_b"], r["pair_count"]) for r in
           cooccurrence_counts(ds, min_df=1, min_count=1,
                               k=100).take_all()]
    want = {("a", "b"): 3, ("a", "c"): 3, ("b", "c"): 2, ("a", "z"): 1,
            ("b", "z"): 1, ("c", "z"): 1, ("a", "d"): 1, ("c", "d"): 1,
            ("b", "d"): 1}
    assert dict(((a, b), c) for a, b, c in out) == want
    # ordered (count desc, term_a, term_b)
    assert out == sorted(out, key=lambda t: (-t[2], t[0], t[1]))
    # min_df band drops df=1 terms (z, d) before pairing; min_count
    # floors the output
    banded = {(r["term_a"], r["term_b"]): r["pair_count"] for r in
              cooccurrence_counts(ds, min_df=2, min_count=2,
                                  k=100).take_all()}
    assert banded == {("a", "b"): 3, ("a", "c"): 3, ("b", "c"): 2}
    # max_df stopword guard: 'a' and 'b' (df 4) excluded entirely;
    # surviving vocab is c (df 3), d (df 2), z (df 1)
    capped = {(r["term_a"], r["term_b"]) for r in
              cooccurrence_counts(ds, min_df=1, max_df=3, min_count=1,
                                  k=100).take_all()}
    assert capped == {("c", "z"), ("c", "d")}


def test_cooccurrence_max_doc_terms_cap(ray_session):
    """The per-doc pair-emission cap (VERDICT r3 #6): a cap above every
    doc's surviving vocabulary is a no-op; a tight cap bounds each doc's
    contribution to C(cap, 2) pairs and only ever UNDER-counts."""
    from ts_type_filter_ray.functions.ngrams import cooccurrence_counts

    # one pathological doc with 30 distinct terms, a few normal docs
    big = " ".join(f"t{i:02d}" for i in range(30))
    ds = _docs([(0, big), (1, "t00 t01 t02"), (2, "t00 t01"),
                (3, "t05 t06 t07")])
    exact = {(r["term_a"], r["term_b"]): r["pair_count"] for r in
             cooccurrence_counts(ds, min_df=1, min_count=1,
                                 k=1000).take_all()}
    assert len(exact) == 30 * 29 // 2  # doc 0 pairs everything
    # cap ≥ max doc vocab → identical result
    same = {(r["term_a"], r["term_b"]): r["pair_count"] for r in
            cooccurrence_counts(ds, min_df=1, min_count=1, k=1000,
                                max_doc_terms=30).take_all()}
    assert same == exact
    # tight cap: bounded pair count, every count ≤ the exact count,
    # and deterministic across runs
    capped1 = {(r["term_a"], r["term_b"]): r["pair_count"] for r in
               cooccurrence_counts(ds, min_df=1, min_count=1, k=1000,
                                   max_doc_terms=5).take_all()}
    capped2 = {(r["term_a"], r["term_b"]): r["pair_count"] for r in
               cooccurrence_counts(ds, min_df=1, min_count=1, k=1000,
                                   max_doc_terms=5).take_all()}
    assert capped1 == capped2
    # each doc emits at most C(5,2)=10 pairs → ≤ 40 distinct pairs here
    assert len(capped1) <= 40
    assert all(capped1[k] <= exact[k] for k in capped1)


# ------------------------------------------------- exact-substring spans


def _span_brute(docs, k):
    """Brute-force ExactSubstr coverage: (doc -> (n_tokens, n_dup))."""
    import collections
    occ = collections.Counter()
    for _, t in docs:
        tk = t.split()
        if not tk:
            continue
        grams = ([tuple(tk)] if len(tk) < k else
                 [tuple(tk[p:p + k]) for p in range(len(tk) - k + 1)])
        occ.update(grams)
    out = {}
    for did, t in docs:
        tk = t.split()
        if not tk:
            continue
        cov = np.zeros(len(tk), dtype=bool)
        if len(tk) < k:
            if occ[tuple(tk)] >= 2:
                cov[:] = True
        else:
            for p in range(len(tk) - k + 1):
                if occ[tuple(tk[p:p + k])] >= 2:
                    cov[p:p + k] = True
        out[did] = (len(tk), int(cov.sum()), cov)
    return out


SPAN_DOCS = [
    (0, "a b c d e f g"),
    (1, "x y z a b c d q r"),        # shares the run 'a b c d' with 0
    (2, "unique tokens only here"),
    (3, "a b c a b c a b c"),        # self-repeat counts (ExactSubstr)
    (4, "tiny doc"),
    (5, "tiny doc"),                 # short-doc whole-text duplicate
    (6, ""),
    (7, "p q r s t u v w"),
    (8, "e f g x y z"),              # overlapping coverage with 0/1
]


def _islands(cov):
    """(n_runs, max_run_len) of a boolean coverage mask."""
    runs, cur, best = 0, 0, 0
    for c in cov:
        if c:
            cur += 1
            if cur == 1:
                runs += 1
            best = max(best, cur)
        else:
            cur = 0
    return runs, best


def test_dup_token_spans_matches_brute_force(ray_session):
    from ts_type_filter_ray.functions.ngrams import dup_token_spans
    for k in (2, 3, 5):
        brute = _span_brute(SPAN_DOCS, k)
        exp = {d: (n, c) + _islands(cov)
               for d, (n, c, cov) in brute.items() if c > 0}
        rows = dup_token_spans(_docs(SPAN_DOCS), shingle_k=k,
                               num_parts=4).take_all()
        got = {r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"],
                             r["n_dup_spans"], r["max_dup_span"])
               for r in rows}
        assert got == exp, k
        for r in rows:
            assert r["dup_token_fraction"] == (
                r["n_dup_tokens"] / r["n_tokens"])


def test_strip_dup_spans_rebuilds_survivors(ray_session):
    from ts_type_filter_ray.functions.ngrams import strip_dup_spans
    k = 3
    brute = _span_brute(SPAN_DOCS, k)
    got = {r["doc_id"]: r
           for r in strip_dup_spans(_docs(SPAN_DOCS), shingle_k=k,
                                    num_parts=4).take_all()}
    assert set(got) == {d for d, _ in SPAN_DOCS}  # every doc reported
    for did, t in SPAN_DOCS:
        tk = t.split()
        if not tk:
            assert got[did]["text"] == "" and got[did]["n_removed"] == 0
            continue
        _, n_dup, cov = brute[did]
        want = " ".join(tok for tok, c in zip(tk, cov) if not c)
        assert got[did]["text"] == want, did
        assert got[did]["n_tokens"] == len(tk)
        assert got[did]["n_removed"] == n_dup


def test_dup_token_spans_whole_corpus_unique(ray_session):
    from ts_type_filter_ray.functions.ngrams import dup_token_spans
    ds = _docs([(0, "q w e r t y"), (1, "u i o p a s")])
    assert dup_token_spans(ds, shingle_k=3, num_parts=2).count() == 0


# ---- PMI collocations ------------------------------------------------


def _pmi_ref(texts, min_count=1, p=None, q=None):
    import math as _m
    import collections as _c
    c12 = _c.Counter()
    for t in texts:
        ws = t.strip().lower().split()
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    t_total = sum(c12.values())
    c1, c2 = _c.Counter(), _c.Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        c2[b] += c
    return {(a, b): (c, _m.log(c * t_total) - _m.log(c1[a] * c2[b]))
            for (a, b), c in c12.items() if c >= min_count}


def test_pmi_collocations_exact(ray_session):
    from ts_type_filter_ray.functions.ngrams import pmi_collocations
    texts = ["new york new york city", "the big city", "new day",
             "york minster", "the the the", "", "one"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)
    got = {(r["w1"], r["w2"]): (r["c12"], r["pmi"])
           for r in pmi_collocations(ds, min_count=1,
                                     num_parts=4).take_all()}
    assert got == _pmi_ref(texts)          # exact float equality
    # exclusive pairing out-scores one diluted by a promiscuous history
    assert got[("big", "city")][1] > got[("the", "big")][1]


def test_pmi_min_count_and_topk(ray_session):
    from ts_type_filter_ray.functions.ngrams import pmi_collocations
    texts = ["a b a b a b", "c d", "x y x y"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }))
    rows = pmi_collocations(ds, min_count=2, num_parts=2).take_all()
    ref = _pmi_ref(texts, min_count=2)
    assert {(r["w1"], r["w2"]) for r in rows} == set(ref)
    top = pmi_collocations(ds, min_count=1, k=2,
                           num_parts=2).take_all()
    full = sorted(_pmi_ref(texts).items(),
                  key=lambda kv: (-kv[1][1], kv[0]))
    assert [(r["w1"], r["w2"]) for r in top] == [k for k, _ in full[:2]]


# ---- corpus-law fits (textstats.zipf_fit / vocab_growth / heaps_fit) --


def _fit_ref(xs, ys):
    import math as _m
    x = [_m.log(v) for v in xs]
    y = [_m.log(v) for v in ys]
    n = len(x)
    # strict left folds, matching the engine/oracle convention
    sx = 0.0
    for v in x: sx += v
    sy = 0.0
    for v in y: sy += v
    sxx = 0.0
    for v in x: sxx += v * v
    sxy = 0.0
    for a, b in zip(x, y): sxy += a * b
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return slope, (sy - slope * sx) / n


def test_zipf_fit_matches_reference(ray_session):
    from ts_type_filter_ray.functions.textstats import zipf_fit
    import collections
    texts = ["the the the the cat", "the cat sat sat", "a the cat b",
             "zz", ""]
    ds = _docs(list(enumerate(texts)))
    out = zipf_fit(ds, top_n=4).to_pylist()[0]
    cnt = collections.Counter(
        w for t in texts for w in t.lower().split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    slope, intercept = _fit_ref(range(1, 5), [c for _, c in ranked])
    assert out["n_terms"] == 4
    assert out["slope"] == slope and out["intercept"] == intercept
    assert out["slope"] < 0        # frequency falls with rank


def test_vocab_growth_exact(ray_session):
    from ts_type_filter_ray.functions.textstats import vocab_growth
    texts = ["a b c", "a b", "d", "", "e f a", "g"]
    ds = _docs(list(enumerate(texts)))
    got = vocab_growth(ds, [0, 1, 3, 5], num_parts=3).to_pylist()
    def ref(c):
        return len({w for d, t in enumerate(texts) if d <= c
                    for w in t.lower().split()})
    assert [(r["n_docs"], r["vocab"]) for r in got] == \
        [(c, ref(c)) for c in [0, 1, 3, 5]]


def test_heaps_fit_matches_reference(ray_session):
    from ts_type_filter_ray.functions.textstats import heaps_fit
    texts = ["a b c", "a b d", "e f", "g h i j", "a k"]
    ds = _docs(list(enumerate(texts)))
    vocab = []
    seen = set()
    for t in texts:
        seen.update(t.lower().split())
        vocab.append(len(seen))
    # checkpoint 0 is dropped (ln needs a positive doc-id cutoff)
    out = heaps_fit(ds, [0, 1, 2, 3, 4], num_parts=3).to_pylist()[0]
    slope, intercept = _fit_ref([1, 2, 3, 4], vocab[1:])
    assert out["n_points"] == 4
    assert out["slope"] == slope and out["intercept"] == intercept
    assert 0.0 < out["slope"] < 1.0    # sublinear growth


def test_ngram_containment_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ts_type_filter_ray.functions.dedup import ngram_containment_pairs

    # doc 1 is a strict subset of doc 0's shingles: containment 1.0
    # while jaccard is small
    texts = ["a b c d e f g h i j", "c d e f g", "x y z w v u"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), type=pa.int64()),
        "text": pa.array(texts),
    }))
    rows = ngram_containment_pairs(ds, shingle_k=3,
                                   threshold=0.9).take_all()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(0, 1)]
    assert rows[0]["containment"] == 1.0
    # the same pair fails a 0.9 jaccard bar
    from ts_type_filter_ray.functions.dedup import ngram_jaccard_pairs
    jac = ngram_jaccard_pairs(ds, shingle_k=3, threshold=0.9).take_all()
    assert jac == []
