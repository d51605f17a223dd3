"""Unit coverage for the round-4 LLM-curation additions: the hashed
linear quality classifier (fastText-style model filter), SemDeDup
semantic deduplication, and the CCNet-style bigram-LM perplexity
scorer. Each is pinned against an independent pure-Python
reimplementation of its documented contract (float values included —
the gate pairs are engineered bit-identical)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions import ann
from ts_type_filter_ray.functions.lm import (bigram_logprob_scores,
                                             distinct_token_count)
from ts_type_filter_ray.functions.textstats import (classifier_scores,
                                                    hashed_weights)
from ts_type_filter_ray.text.hashvec import md5_lower64_strings


def _docs_ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs], type=pa.string()),
    }))


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat SAT"),
    (3, "   "),                       # blank: no features, no bigrams
    (4, "solo"),                      # 1 token: classified, no bigrams
    (5, "a b a b a"),
    (6, "The THE the"),               # case folding
]


def test_classifier_scores_matches_pure_python(ray_session):
    dim_bits, seed, scale = 10, "w1", 64
    got = {r["doc_id"]: r for r in classifier_scores(
        _docs_ds(DOCS), dim_bits=dim_bits, seed=seed,
        scale=scale).take_all()}
    w = hashed_weights(dim_bits, seed)
    dim = 1 << dim_bits
    expected = {}
    for did, text in DOCS:
        toks = text.strip().split()
        if not toks:
            continue
        h = md5_lower64_strings([t.lower() for t in toks])
        # int(x) first: np.uint64 % python-int silently promotes to
        # float64 and destroys the modulus
        dot = int(sum(int(w[int(x) % dim]) for x in h))
        expected[did] = (len(toks), dot,
                         1.0 / (1.0 + math.exp(-(dot / float(scale)))))
    assert set(got) == set(expected)        # blank doc 3 emits no row
    for did, (n, dot, score) in expected.items():
        r = got[did]
        assert r["n_tokens"] == n
        assert r["dot"] == dot
        assert r["score"] == score          # bit-identical float


def test_hashed_weights_deterministic_and_bounded():
    w = hashed_weights(6, "w1")
    assert w.shape == (64,) and w.dtype == np.int64
    assert w.min() >= -8 and w.max() <= 8
    assert np.array_equal(w, hashed_weights(6, "w1"))
    assert not np.array_equal(w, hashed_weights(6, "other-seed"))


def _clustered_embeddings(n_clusters=6, per=30, dim=12, seed=11):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, dim))
    vecs = (np.repeat(cents, per, axis=0)
            + 0.05 * rng.normal(size=(n_clusters * per, dim)))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    }))


def test_semantic_dedup_pairs_subset_and_recall(ray_session):
    ds = _clustered_embeddings()
    thr = 0.9
    exact = {(r["id_a"], r["id_b"])
             for r in ann.embedding_near_dup_pairs(ds, thr).take_all()}
    got = {(r["id_a"], r["id_b"])
           for r in ann.semantic_dedup_pairs(ds, thr, n_clusters=6,
                                             iters=3).take_all()}
    # within-cluster pairs are exact-verified -> always a SUBSET of the
    # exact sweep; on the tight-cluster fixture recall is near-total
    assert got <= exact
    assert exact and len(got) / len(exact) >= 0.95


def test_semantic_dedup_exact_configuration(ray_session):
    # n_clusters=1 degenerates to the exact global sweep: components
    # are the connected components of the exact pair graph, keep marks
    # exactly the min-id exemplar of each component
    ds = _clustered_embeddings(n_clusters=3, per=8)
    thr = 0.9
    from ts_type_filter_ray.functions.graph import connected_components
    comp_ref = {r["vec_id"]: r["component"] for r in connected_components(
        ds.select_columns(["vec_id"]),
        ann.embedding_near_dup_pairs(ds, thr),
        node_col="vec_id").take_all()}
    rows = ann.semantic_dedup(ds, thr, n_clusters=1).take_all()
    assert {r["vec_id"]: r["component"] for r in rows} == comp_ref
    for r in rows:
        assert r["keep"] == (1 if r["vec_id"] == r["component"] else 0)
    kept = {r["component"] for r in rows if r["keep"] == 1}
    assert kept == set(comp_ref.values())   # one exemplar per component


def _ref_bigram(docs, alpha):
    toks = {d: [w.lower() for w in t.strip().split()] for d, t in docs}
    vocab = {w for ws in toks.values() for w in ws}
    c12, c1 = {}, {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    av = alpha * len(vocab)
    out = {}
    for d, ws in toks.items():
        if len(ws) < 2:
            continue
        total = 0.0
        for a, b in zip(ws, ws[1:]):        # strict position-order fold
            total += (math.log(c12[(a, b)] + alpha)
                      - math.log(c1[a] + av))
        n = len(ws) - 1
        out[d] = (n, -total, math.exp(-total / n))
    return out


@pytest.mark.parametrize("alpha", [1, 3])
def test_bigram_lm_matches_pure_python(ray_session, alpha):
    got = {r["doc_id"]: r for r in bigram_logprob_scores(
        _docs_ds(DOCS), alpha=alpha).take_all()}
    exp = _ref_bigram(DOCS, alpha)
    assert set(got) == set(exp)             # docs 3 and 4 emit no row
    for did, (n, neg, ppl) in exp.items():
        r = got[did]
        assert r["n_bigrams"] == n
        assert r["neg_logprob"] == neg      # bit-identical float
        assert r["perplexity"] == ppl
    # repeated boilerplate (doc 5's alternating bigrams) scores more
    # fluent (lower perplexity) than the one-off doc-2 tail
    assert got[5]["perplexity"] < got[2]["perplexity"]


def test_bigram_lm_alpha_contract(ray_session):
    with pytest.raises(ValueError, match="alpha"):
        bigram_logprob_scores(_docs_ds(DOCS), alpha=0)
    with pytest.raises(ValueError, match="alpha"):
        bigram_logprob_scores(_docs_ds(DOCS), alpha=0.5)


def test_distinct_token_count_exact(ray_session):
    n = distinct_token_count(_docs_ds(DOCS))
    vocab = {w.lower() for _, t in DOCS for w in t.strip().split()}
    assert n == len(vocab)


def _ref_cross_bigram(score_docs, train_docs, alpha):
    toks = lambda t: [w.lower() for w in t.strip().split()]
    vocab = {w for _, t in train_docs for w in toks(t)}
    c12, c1 = {}, {}
    for _, t in train_docs:
        ws = toks(t)
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    av = alpha * len(vocab)
    out = {}
    for d, t in score_docs:
        ws = toks(t)
        if len(ws) < 2:
            continue
        total = 0.0
        for a, b in zip(ws, ws[1:]):
            total += (math.log(c12.get((a, b), 0) + alpha)
                      - math.log(c1.get(a, 0) + av))
        n = len(ws) - 1
        out[d] = (n, -total, math.exp(-total / n))
    return out


def test_bigram_lm_cross_corpus(ray_session):
    train = [(10, "the cat sat"), (11, "on the mat the cat"),
             (12, "the dog sat on the cat")]
    got = {r["doc_id"]: r for r in bigram_logprob_scores(
        _docs_ds(DOCS), alpha=2, train=_docs_ds(train)).take_all()}
    exp = _ref_cross_bigram(DOCS, train, 2)
    assert set(got) == set(exp)
    for did, (n, neg, ppl) in exp.items():
        r = got[did]
        assert r["n_bigrams"] == n
        assert r["neg_logprob"] == neg      # bit-identical float
        assert r["perplexity"] == ppl
    # train-distribution text scores more fluent than OOV text
    assert got[1]["perplexity"] < got[5]["perplexity"]


def test_bigram_lm_self_mode_unchanged_by_refactor(ray_session):
    # the cross-corpus refactor must leave self-trained results
    # bit-identical (the gate-green path)
    got = {r["doc_id"]: (r["n_bigrams"], r["neg_logprob"])
           for r in bigram_logprob_scores(_docs_ds(DOCS),
                                          alpha=1).take_all()}
    exp = {d: (n, neg) for d, (n, neg, _) in _ref_bigram(DOCS, 1).items()}
    assert got == exp


def _ref_dsir(score_docs, target_docs, dim_bits, alpha):
    b = 1 << dim_bits

    def feats(text):
        ws = [w.lower() for w in text.strip().split()]
        out = [int(h) % b for h in md5_lower64_strings(ws)] if ws else []
        if len(ws) > 1:
            keys = [a + "\x1f" + c for a, c in zip(ws, ws[1:])]
            out += [int(h) % b for h in md5_lower64_strings(keys)]
        return out

    ct, cr = {}, {}
    for _, t in target_docs:
        for f in feats(t):
            ct[f] = ct.get(f, 0) + 1
    for _, t in score_docs:
        for f in feats(t):
            cr[f] = cr.get(f, 0) + 1
    ln_nt = math.log(sum(ct.values()) + alpha * b)
    ln_nr = math.log(sum(cr.values()) + alpha * b)
    out = {}
    for d, t in score_docs:
        fs = feats(t)
        if not fs:
            continue
        total = 0.0
        for f in fs:
            total += (math.log(ct.get(f, 0) + alpha) - ln_nt
                      - math.log(cr.get(f, 0) + alpha) + ln_nr)
        out[d] = (len(fs), total)
    return out


def test_dsir_matches_pure_python(ray_session):
    from ts_type_filter_ray.functions.lm import dsir_importance_weights
    target = [(20, "the cat sat on a mat"), (21, "the cat the mat")]
    got = {r["doc_id"]: r for r in dsir_importance_weights(
        _docs_ds(DOCS), _docs_ds(target), dim_bits=8).take_all()}
    exp = _ref_dsir(DOCS, target, 8, 1)
    assert set(got) == set(exp)             # blank doc 3 emits no row
    for did, (n, lw) in exp.items():
        r = got[did]
        assert r["n_features"] == n
        assert r["log_weight"] == lw        # bit-identical float
    # target-like doc 1 outranks the off-distribution doc 5
    assert got[1]["log_weight"] > got[5]["log_weight"]


def test_dsir_alpha_contract(ray_session):
    from ts_type_filter_ray.functions.lm import dsir_importance_weights
    with pytest.raises(ValueError, match="alpha"):
        dsir_importance_weights(_docs_ds(DOCS), _docs_ds(DOCS), alpha=0)


def test_classifier_extreme_dot_scores_zero_not_crash(ray_session):
    # a spam doc whose every token hashes to a -8-weight bucket can push
    # z past libm exp's overflow point; the engine must score 0.0 (the
    # SQL oracle's 1/(1+inf)), never raise
    w = hashed_weights(6, "w1")
    neg_bucket_tok = None
    for cand in ("tok%d" % i for i in range(100000)):
        h = int(md5_lower64_strings([cand])[0]) % 64
        if w[h] == -8:
            neg_bucket_tok = cand
            break
    assert neg_bucket_tok is not None
    spam = " ".join([neg_bucket_tok] * 6000)    # dot = -48000, z = -750
    rows = classifier_scores(_docs_ds([(1, spam)]), dim_bits=6,
                             scale=64).take_all()
    assert rows[0]["dot"] == -48000
    assert rows[0]["score"] == 0.0
    # and the positive tail saturates to 1.0 symmetric-safely
    pos_tok = None
    for cand in ("pok%d" % i for i in range(100000)):
        h = int(md5_lower64_strings([cand])[0]) % 64
        if w[h] == 8:
            pos_tok = cand
            break
    rows = classifier_scores(_docs_ds([(1, " ".join([pos_tok] * 6000))]),
                             dim_bits=6, scale=64).take_all()
    assert rows[0]["score"] == 1.0


def test_bigram_lm_empty_train_fails_fast(ray_session):
    with pytest.raises(ValueError, match="train corpus has no tokens"):
        bigram_logprob_scores(_docs_ds(DOCS), alpha=1,
                              train=_docs_ds([(9, "   ")]))


def test_perplexity_buckets_terciles(ray_session):
    from ts_type_filter_ray.functions.lm import perplexity_buckets
    # 9 scoreable docs with distinct perplexities (varying length) ->
    # exactly 3 per bucket under percentile_disc terciles
    docs = [(i, " ".join(["common"] * (i + 2)) + f" w{i}")
            for i in range(9)]
    rows = perplexity_buckets(_docs_ds(docs)).take_all()
    assert len(rows) == 9
    from collections import Counter
    c = Counter(r["bucket"] for r in rows)
    assert c == {"head": 3, "middle": 3, "tail": 3}
    # bucket boundaries respect the perplexity order
    by_ppl = sorted(rows, key=lambda r: r["perplexity"])
    assert [r["bucket"] for r in by_ppl] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)


def test_bigram_lm_hot_history_skew(ray_session):
    # every bigram shares the history token "the": the one-exchange
    # design routes ALL of them to a single partition — correctness
    # must hold under that extreme skew (the documented worst case)
    # interleave "the" everywhere: "the w the w the w ..."
    docs = [(i, " ".join(x for j in range(5)
                         for x in ("the", f"w{i}_{j}")))
            for i in range(40)]
    got = {r["doc_id"]: (r["n_bigrams"], r["neg_logprob"])
           for r in bigram_logprob_scores(_docs_ds(docs), alpha=1,
                                          num_parts=16).take_all()}
    exp = {d: (n, neg) for d, (n, neg, _) in _ref_bigram(docs, 1).items()}
    assert got == exp


def test_dsir_select_gumbel_topk(ray_session):
    from ts_type_filter_ray.functions.lm import (dsir_importance_weights,
                                                 dsir_select)
    from ts_type_filter_ray.text.hashvec import md5_lower64_ints
    target = [(20, "the cat sat on a mat")]
    tbl = dsir_select(_docs_ds(DOCS), _docs_ds(target), k=3, dim_bits=8)
    assert tbl.column_names == ["rank", "doc_id"]
    assert tbl.num_rows == 3
    # reference: g = log_weight - ln(-ln(u)) over the scored docs
    lw = {r["doc_id"]: r["log_weight"] for r in dsir_importance_weights(
        _docs_ds(DOCS), _docs_ds(target), dim_bits=8).take_all()}
    g = {}
    for d, w in lw.items():
        u = (float(md5_lower64_ints(np.array([d]))[0]) + 0.5) * 2.0**-64
        g[d] = w - math.log(-math.log(u))
    want = [d for d, _ in sorted(g.items(),
                                 key=lambda kv: (-kv[1], kv[0]))][:3]
    assert tbl["doc_id"].to_pylist() == want
    assert tbl["rank"].to_pylist() == [1, 2, 3]


def test_lm_family_randomized_parity(ray_session):
    # seeded fuzz: random corpora with unicode, odd whitespace, repeats
    # must match the pure-Python references bit-for-bit
    rng = np.random.default_rng(1234)
    vocab = (["the", "cat", "döner", "ĉapelo", "x" * 60, "a"]
             + [f"t{i}" for i in range(40)])
    ws = [" ", "  ", "\t", "\n", " \t "]
    docs = []
    for d in range(60):
        n = int(rng.integers(0, 30))
        toks = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        sep = ws[int(rng.integers(0, len(ws)))]
        docs.append((d, sep.join(toks) + (" " if d % 3 == 0 else "")))
    got = {r["doc_id"]: (r["n_bigrams"], r["neg_logprob"],
                         r["perplexity"])
           for r in bigram_logprob_scores(_docs_ds(docs), alpha=2,
                                          num_parts=16).take_all()}
    assert got == _ref_bigram(docs, 2)

    target = docs[:10]
    from ts_type_filter_ray.functions.lm import dsir_importance_weights
    gotd = {r["doc_id"]: (r["n_features"], r["log_weight"])
            for r in dsir_importance_weights(
                _docs_ds(docs), _docs_ds(target), dim_bits=7).take_all()}
    assert gotd == _ref_dsir(docs, target, 7, 1)


def test_tercile_rank_rule_matches_duckdb():
    # the perplexity_buckets oracle relies on percentile_disc's rank
    # rule matching exact_value_quantiles' ceil(p*n) at every small n —
    # pin it (this is the test the oracle comment points at)
    import duckdb
    import ray.data as rdl
    rng = np.random.default_rng(3)
    for n in range(1, 13):
        vals = rng.normal(size=n)
        from ts_type_filter_ray.functions.events import exact_value_quantiles
        row = exact_value_quantiles(
            rdl.from_arrow(pa.table({"value": pa.array(
                vals, type=pa.float64())})),
            ps=(1 / 3, 2 / 3)).take_all()[0]
        con = duckdb.connect()
        con.register("t", pa.table({"v": pa.array(vals,
                                                  type=pa.float64())}))
        c1, c2 = con.sql(
            "select percentile_disc(0.3333333333333333::DOUBLE) within"
            " group (order by v),"
            " percentile_disc(0.6666666666666666::DOUBLE) within group"
            " (order by v) from t").fetchone()
        assert (row["p33"], row["p66"]) == (c1, c2), f"n={n}"
