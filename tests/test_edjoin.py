"""Edit-similarity join: brute-force parity fuzz, blocking soundness
edges (short keys, prefix budget, unicode), cap contract."""

import random

import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.edjoin import (
    distinct_token_bigrams, edit_similarity_join)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def naive_join(left, right, d):
    out = []
    for a in sorted(set(left)):
        for b in sorted(set(right)):
            dist = _lev(a, b)
            if dist <= d:
                out.append((a, b, dist))
    return out


def _run(left, right, d, q=2, **kw):
    lt = rd.from_arrow(pa.table({"key": pa.array(list(left))}))
    rt = rd.from_arrow(pa.table({"key": pa.array(list(right))}))
    rows = edit_similarity_join(lt, rt, max_dist=d, q=q,
                                num_parts=16, **kw).take_all()
    return [(r["left_key"], r["right_key"], r["dist"]) for r in rows]


def test_golden_small(ray_session):
    left = ["spark", "table", "merge", "a"]
    right = ["spork", "tables", "mergee", "b", "table"]
    got = _run(left, right, 1)
    assert got == naive_join(left, right, 1)
    assert ("spark", "spork", 1) in got
    assert ("table", "table", 0) in got
    assert ("a", "b", 1) in got  # short-key sentinel bucket


def test_short_long_mixed(ray_session):
    # len < q*(d+1) on one side only: covered by the long side's prefix
    left = ["ab"]          # len 2 < q*(d+1) = 4 at q=2,d=1
    right = ["abc", "abcd", "zz", "b"]
    got = _run(left, right, 1)
    assert got == naive_join(left, right, 1)


def test_fuzz_parity_random_strings(ray_session):
    rng = random.Random(7)
    alpha = "abcde"
    for d in (1, 2):
        left = ["".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 8)))
                for _ in range(60)]
        right = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(1, 8)))
                 for _ in range(60)]
        assert _run(left, right, d) == naive_join(left, right, d)


def test_fuzz_parity_q3(ray_session):
    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "gamna", "bita"]
    left = [rng.choice(words) + rng.choice(["", "s", "x"])
            for _ in range(40)]
    right = [rng.choice(words) + rng.choice(["", "s", "y"])
             for _ in range(40)]
    assert _run(left, right, 2, q=3) == naive_join(left, right, 2)


def test_unicode_codepoint_semantics(ray_session):
    # edit distance on CODEPOINTS (DuckDB levenshtein semantics), not
    # utf-8 bytes: 'café' vs 'cafe' is one substitution
    left = ["café", "naïve", "東京都"]
    right = ["cafe", "naive", "東京市", "東京"]
    got = _run(left, right, 1)
    assert got == naive_join(left, right, 1)
    assert ("café", "cafe", 1) in got
    assert ("東京都", "東京", 1) in got


def test_duplicate_inputs_distinct_pairs(ray_session):
    got = _run(["foo", "foo", "fob"], ["foo", "foo"], 1)
    assert got == naive_join(["foo", "fob"], ["foo"], 1)


def test_bucket_cap_underreports_only(ray_session):
    # every key shares the gram 'aa' — cap drops buckets, never invents
    left = [f"aa{c}" for c in "bcdefgh"]
    right = [f"aa{c}" for c in "bcdefgh"]
    full = set(naive_join(left, right, 1))
    capped = set(_run(left, right, 1, max_bucket_pairs=4))
    assert capped <= full


def test_distinct_token_bigrams(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b c", "b c", "  "]),
    }))
    got = sorted(r["key"] for r in
                 distinct_token_bigrams(ds, num_parts=8).take_all())
    assert got == ["a b", "b c"]
