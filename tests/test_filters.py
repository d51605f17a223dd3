"""Heuristic curation filters: Gopher rules, C4 line cleaning,
temperature mixture sampling (functions/filters.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from ts_type_filter_ray.functions.filters import (c4_clean, gopher_rules,
                                                  temperature_sample)
from ts_type_filter_ray.functions.sampling import _md5_bucket


def _docs(rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows],
                         type=pa.string()),
    })
    return ray.data.from_arrow(t)


def _by_id(ds):
    return {r["doc_id"]: r for r in ds.take_all()}


def test_gopher_rules_each_rule_bites(ray_session):
    ds = _docs([
        (1, "the cat sat on a mat and then it left here today"),  # passes
        (2, "the a short"),                                # too few words
        (3, "the a " + " ".join(["extraordinarily"] * 10)),  # mean len high
        (4, "the a " + " ".join(["x#y"] * 10)),            # symbol ratio
        (5, "the a " + " ".join(["123"] * 10)),            # alpha ratio low
        (6, " ".join(["cat"] * 12)),                       # no stopwords
        (7, ""),                                           # empty
    ])
    out = _by_id(gopher_rules(
        ds, min_words=5, max_words=100, min_mean_len=2.0,
        max_mean_len=6.0, max_symbol_ratio=0.1, min_alpha_ratio=0.8,
        min_stop_distinct=2))
    assert out[1]["keep"] == 1
    assert out[1]["n_words"] == 12
    # doc 1 distinct stopwords: the, a, and, it (4)
    assert out[1]["n_stop_distinct"] == 4
    for d in (2, 3, 4, 5, 6, 7):
        assert out[d]["keep"] == 0, d
    assert out[2]["n_words"] == 3
    assert out[7]["n_words"] == 0
    assert out[7]["mean_word_len"] == 0.0
    assert out[7]["alpha_ratio"] == 0.0
    # float shapes: sum(len)/n as float64
    text1 = "the cat sat on a mat and then it left here today"
    toks = text1.split()
    assert out[1]["mean_word_len"] == pytest.approx(
        sum(map(len, toks)) / len(toks), abs=0)


def test_gopher_symbol_and_ellipsis(ray_session):
    ds = _docs([(1, "the a okay words more stuff ... x…y here now")])
    out = _by_id(gopher_rules(ds, min_words=1, min_stop_distinct=0))
    # '...' and 'x…y' are symbol tokens out of 10
    assert out[1]["symbol_ratio"] == pytest.approx(2 / 10, abs=0)


def test_c4_clean_line_and_doc_rules(ray_session):
    ds = _docs([
        (1, "Good line with punct.\nshort.\nno punct here at all\n"
            "bad JavaScript line here.\nAnother good line here!"),
        (2, "This page has Lorem Ipsum inside it fine."),
        (3, "code with a { brace inside it fine}."),
        (4, "no surviving lines here"),
        (5, 'They said "go home right now"'),
    ])
    out = _by_id(c4_clean(ds))
    assert set(out) == {1, 5}
    assert out[1]["n_lines"] == 5
    assert out[1]["n_kept"] == 2
    assert out[1]["text"] == ("Good line with punct.\n"
                              "Another good line here!")
    # terminal '"' counts; doc 5 survives whole
    assert out[5]["n_kept"] == 1
    assert out[5]["text"] == 'They said "go home right now"'


def test_c4_clean_no_punct_requirement(ray_session):
    ds = _docs([(4, "three plain words\ntwo words")])
    out = _by_id(c4_clean(ds, require_terminal_punct=False))
    assert out[4]["text"] == "three plain words"
    assert out[4]["n_kept"] == 1


def test_c4_empty_batch_schema(ray_session):
    # a batch whose every doc drops must still emit the full schema
    ds = _docs([(1, "nothing survives here")])
    out = c4_clean(ds)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "n_lines", "n_kept",
                                       "text"}


def test_temperature_sample_rates(ray_session):
    rows = [(i, "x", "a") for i in range(50)] + \
           [(i, "x", "b") for i in range(50, 60)]
    ds = _docs(rows)
    kept = temperature_sample(ds, alpha=0.5, mod=10_000).take_all()
    kept_ids = {r["doc_id"] for r in kept}
    # smallest group (b, n=10) keeps everything
    assert set(range(50, 60)) <= kept_ids
    # group a kept iff md5 bucket < floor((50/10)**-0.5 * 10000) = 4472
    cut = int(np.floor((50 / 10) ** (-0.5) * 10_000))
    buckets = _md5_bucket(np.arange(50), mod=10_000)
    expect_a = {i for i in range(50) if buckets[i] < cut}
    assert kept_ids - set(range(50, 60)) == expect_a
    # bucket column matches the hash
    for r in kept:
        if r["doc_id"] < 50:
            assert r["bucket"] == buckets[r["doc_id"]]


def test_temperature_alpha_one_keeps_all(ray_session):
    rows = [(i, "x", "a") for i in range(20)] + \
           [(i, "x", "b") for i in range(20, 25)]
    out = temperature_sample(_docs(rows), alpha=1.0)
    assert out.count() == 25


def test_temperature_deterministic(ray_session):
    rows = [(i, "x", "a") for i in range(30)] + \
           [(i, "x", "b") for i in range(30, 40)]
    a = sorted(r["doc_id"] for r in
               temperature_sample(_docs(rows), alpha=0.3).take_all())
    b = sorted(r["doc_id"] for r in
               temperature_sample(_docs(rows), alpha=0.3).take_all())
    assert a == b and len(a) > 10


def test_temperature_empty_raises(ray_session):
    ds = _docs([]).filter(lambda r: False)
    with pytest.raises(ValueError, match="empty"):
        temperature_sample(ds)


def test_gopher_repetition_basic(ray_session):
    from ts_type_filter_ray.functions.filters import gopher_repetition
    ds = _docs([
        (1, "a b a b a b c"),
        (2, "one"),
        (3, ""),
        (4, "x y x y z w z w"),
    ])
    out = _by_id(gopher_repetition(ds, top_n=2, dup_n=2))
    # doc 1: bigrams 'a b'x3 'b a'x2 'b c'x1; chars = 7 + 6 = 13
    assert out[1]["top_gram"] == "a b"
    assert out[1]["top_gram_count"] == 3
    assert out[1]["top_gram_frac"] == pytest.approx(9 / 13, abs=0)
    # dup mass: 'a b'x3 + 'b a'x2 -> (3+2)*3 = 15 chars (overlap-naive)
    assert out[1]["dup_gram_frac"] == pytest.approx(15 / 13, abs=0)
    # doc shorter than the gram: empty stats
    assert out[2]["top_gram"] == "" and out[2]["top_gram_count"] == 0
    assert out[2]["top_gram_frac"] == 0.0
    assert out[3]["n_tokens"] == 0 and out[3]["dup_gram_frac"] == 0.0
    # doc 4 tie at count 2: 'x y' vs 'z w' -> lexicographically smallest
    assert out[4]["top_gram"] == "x y"


def test_gopher_repetition_distinct_ns(ray_session):
    from ts_type_filter_ray.functions.filters import gopher_repetition
    # top over bigrams, dup over trigrams of a doc with a repeated
    # trigram: 'p q r' occurs twice (positions 0 and 4)
    ds = _docs([(1, "p q r s p q r t")])
    out = _by_id(gopher_repetition(ds, top_n=2, dup_n=3))
    assert out[1]["top_gram"] == "p q"
    assert out[1]["top_gram_count"] == 2
    # chars = 8 tokens + 7 = 15; dup trigram 'p q r' twice: 2*5 = 10
    assert out[1]["dup_gram_frac"] == pytest.approx(10 / 15, abs=0)


def test_unigram_entropy(ray_session):
    import math
    from ts_type_filter_ray.functions.textstats import unigram_entropy
    ds = _docs([
        (1, "a a a b"),
        (2, "same same same same"),
        (3, ""),
        (4, "w x y z"),
    ])
    out = _by_id(unigram_entropy(ds))
    # H = ln(4) - (3 ln 3 + 1 ln 1)/4, exact float expression
    assert out[1]["entropy"] == math.log(4.0) - (
        3.0 * math.log(3.0) + 1.0 * math.log(1.0)) / 4.0
    assert out[1]["n_distinct"] == 2
    # all-same doc: ln(n) - n ln(n)/n (0 up to rounding)
    assert abs(out[2]["entropy"]) < 1e-15
    assert out[3]["entropy"] == 0.0 and out[3]["n_tokens"] == 0
    # uniform doc: exactly the ordered fold of 4 zero contributions
    assert out[4]["entropy"] == math.log(4.0)


def _budget_reference(rows, budget, group=True):
    """(doc_id set) the SQL window-cumsum contract computes."""
    import collections
    by_g = collections.defaultdict(list)
    for did, w, g in rows:
        by_g[g if group else None].append((did, w))
    keep = set()
    for g, items in by_g.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        cum = 0
        for did, w in items:
            cum += w
            if cum <= budget:
                keep.add(did)
    return keep


def test_select_until_budget_grouped(ray_session):
    from ts_type_filter_ray.functions.sampling import select_until_budget
    rng = np.random.default_rng(7)
    rows = [(i, int(rng.integers(1, 50)), ("a", "b", "c")[i % 3])
            for i in range(200)]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "w": pa.array([r[1] for r in rows], type=pa.int64()),
        "lang": pa.array([r[2] for r in rows], type=pa.string()),
    })
    ds = ray.data.from_arrow(t)
    out = select_until_budget(ds, budget=300, weight_col="w",
                              group_col="lang", part_bits=3).take_all()
    assert {r["doc_id"] for r in out} == _budget_reference(rows, 300)
    # cum_weight is the inclusive running total and never exceeds budget
    for r in out:
        assert r["cum_weight"] <= 300
    # per-group max cum equals sum of selected weights
    import collections
    sel = collections.defaultdict(list)
    for r in out:
        sel[r["lang"]].append(r)
    for g, rs in sel.items():
        assert max(x["cum_weight"] for x in rs) == \
            sum(x["w"] for x in rs)


def test_select_until_budget_global_and_ties(ray_session):
    from ts_type_filter_ray.functions.sampling import select_until_budget
    # equal scores: id-ascending tie-break decides who fits
    t = pa.table({
        "doc_id": pa.array([5, 1, 3, 2], type=pa.int64()),
        "w": pa.array([10, 10, 10, 10], type=pa.int64()),
    })
    out = select_until_budget(ray.data.from_arrow(t), budget=25,
                              weight_col="w").take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_select_until_budget_float_score(ray_session):
    from ts_type_filter_ray.functions.sampling import select_until_budget
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "w": pa.array([5, 5, 5, 5], type=pa.int64()),
        "score": pa.array([0.1, -2.0, 3.5, 0.9], type=pa.float64()),
    })
    out = select_until_budget(ray.data.from_arrow(t), budget=10,
                              weight_col="w", score_col="score")
    assert sorted(r["doc_id"] for r in out.take_all()) == [3, 4]


def test_select_until_budget_negative_weight_raises(ray_session):
    from ts_type_filter_ray.functions.sampling import select_until_budget
    t = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "w": pa.array([-3], type=pa.int64()),
    })
    with pytest.raises(Exception, match="negative weights"):
        select_until_budget(ray.data.from_arrow(t), budget=10,
                            weight_col="w").take_all()
