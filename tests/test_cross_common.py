"""Cross-corpus longest common substring: naive stream-LCS parity,
goldens, contract guards."""

import random

import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.suffix import (
    SuffixArray, cross_longest_common)


def _ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    }))


def _stream(rows):
    return "".join(t.strip(" ").lower() + "\x01"
                   for _, t in sorted(rows))


def naive_lcs(rows_a, rows_b):
    a, b = _stream(rows_a), _stream(rows_b)
    subs = {a[i:i + L] for L in range(1, len(a) + 1)
            for i in range(len(a) - L + 1)}
    best = 0
    for L in range(min(len(a), len(b)), 0, -1):
        if any(b[i:i + L] in subs for i in range(len(b) - L + 1)):
            best = L
            break
    return best


def _run(rows_a, rows_b, **kw):
    out = cross_longest_common(_ds(rows_a), _ds(rows_b),
                               max_compare=128, **kw).take_all()
    return out[0]["cross_common_len"]


def test_goldens(ray_session):
    a = [(0, "abcdefgh"), (1, "zzzz")]
    b = [(10, "xxcdefgxx")]
    assert _run(a, b) == 5  # "cdefg"
    assert _run([(0, "aaa")], [(10, "bbb")]) == 0
    # within-corpus repeats must not count
    assert _run([(0, "repeat repeat"), (1, "repeat repeat")],
                [(10, "nothing shared")]) == 2  # "re"


def test_identical_doc_spans_separator(ray_session):
    # stream semantics: the match includes the trailing separator
    a = [(0, "hello world")]
    b = [(10, "hello world")]
    assert _run(a, b) == naive_lcs(a, b) == 12


def test_fuzz_parity(ray_session):
    rng = random.Random(13)
    for _ in range(6):
        a = [(i, "".join(rng.choice("abc") for _ in
                         range(rng.randint(0, 20)))) for i in range(4)]
        b = [(10 + i, "".join(rng.choice("abc") for _ in
                              range(rng.randint(0, 20))))
             for i in range(4)]
        assert _run(a, b) == naive_lcs(a, b)


def test_prebuilt_handle(ray_session):
    a = [(0, "shared span here"), (1, "alpha")]
    b = [(10, "a shared span too")]
    union = _ds(sorted(a + b))
    sa = SuffixArray(union, max_compare=128)
    assert _run(a, b, sa=sa) == _run(a, b) == naive_lcs(a, b)


def test_overlapping_ids_raise(ray_session):
    with pytest.raises(Exception, match="disjoint"):
        _run([(0, "aaa")], [(0, "bbb")])


def test_distinct_substrings_naive_parity(ray_session):
    from ts_type_filter_ray.functions.suffix import distinct_substrings

    def naive(rows):
        g = "".join(t.strip(" ").lower() + "\x01" for _, t in sorted(rows))
        return len(g), len({g[i:j] for i in range(len(g))
                            for j in range(i + 1, len(g) + 1)})

    cases = [[(0, "abab")], [(0, "abc"), (1, "abc")], [(0, "aaaa")],
             [(0, "xy"), (1, "")],
             [(0, "the quick brown fox"), (1, "the quick red fox")]]
    for rows in cases:
        got = distinct_substrings(_ds(rows), max_compare=64).take_all()[0]
        assert (got["n_chars"], got["n_distinct_substrings"]) == naive(rows)


def test_distinct_substrings_prebuilt_handle(ray_session):
    from ts_type_filter_ray.functions.suffix import (
        SuffixArray, distinct_substrings)
    rows = [(0, "shared text"), (1, "shared text two")]
    sa = SuffixArray(_ds(rows), max_compare=128)
    a = distinct_substrings(_ds(rows), sa=sa).take_all()
    b = distinct_substrings(_ds(rows), max_compare=128).take_all()
    assert a == b
