"""Numeric field index: range queries, doc-value gathers, sort-by-field,
stats, and the query-language range atom — all vs brute-force numpy
references, plus layout contracts (pruned reads see every row exactly
once; resumable build markers)."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from ts_type_filter_ray.pipelines.numeric import (NumericIndex,
                                                  build_numeric_index)
from ts_type_filter_ray.pipelines.querylang import (QuerySyntaxError,
                                                    Range, parse_query)

N = 5000
rng = np.random.default_rng(42)
VALS = rng.integers(0, 1000, size=N).astype(np.int64)
SCORES = np.round(rng.random(N) * 10.0, 3)
# shuffled, non-contiguous doc ids — the index must not assume density
IDS = rng.permutation(np.arange(N, dtype=np.int64) * 3 + 1)


@pytest.fixture(scope="module")
def num_index(ray_session, tmp_path_factory):
    import ray.data as rd
    root = str(tmp_path_factory.mktemp("numidx"))
    t = pa.table({"doc_id": IDS, "n_chars": VALS, "score": SCORES})
    ds = rd.from_arrow(t).repartition(7)
    build_numeric_index(ds, root, ["n_chars", "score"])
    return NumericIndex(root)


def _ref_range(vals, lo, hi, lo_inc=True, hi_inc=True):
    m = np.ones(N, dtype=bool)
    if lo is not None:
        m &= (vals >= lo) if lo_inc else (vals > lo)
    if hi is not None:
        m &= (vals <= hi) if hi_inc else (vals < hi)
    return np.unique(IDS[m])


def test_range_docs_matches_reference(num_index):
    cases = [(100, 300, True, True), (100, 300, False, False),
             (None, 150, True, True), (800, None, True, False),
             (0, 999, True, True), (500, 500, True, True),
             (300, 100, True, True), (-5, -1, True, True)]
    for lo, hi, li, hi_i in cases:
        got = num_index.range_docs("n_chars", lo, hi, li, hi_i)
        exp = _ref_range(VALS, lo, hi, li, hi_i)
        assert np.array_equal(got, exp), (lo, hi, li, hi_i)


def test_range_docs_float_field(num_index):
    got = num_index.range_docs("score", 2.5, 7.5)
    exp = np.unique(IDS[(SCORES >= 2.5) & (SCORES <= 7.5)])
    assert np.array_equal(got, exp)


def test_gather_aligned_any_order(num_index):
    pick = rng.choice(IDS, size=200, replace=False)
    got = num_index.gather("n_chars", pick)
    lookup = dict(zip(IDS.tolist(), VALS.tolist()))
    assert got.tolist() == [float(lookup[d]) for d in pick.tolist()]


def test_gather_missing_id_raises(num_index):
    with pytest.raises(KeyError, match="missing"):
        num_index.gather("n_chars", np.array([2], dtype=np.int64))  # even id


def test_topk_by_field(num_index):
    pick = np.sort(rng.choice(IDS, size=300, replace=False))
    lookup = dict(zip(IDS.tolist(), VALS.tolist()))
    for asc in (False, True):
        got = num_index.topk_by_field("n_chars", pick, k=25, ascending=asc)
        key = (lambda d: (lookup[d], d)) if asc else \
            (lambda d: (-lookup[d], d))
        exp = sorted(pick.tolist(), key=key)[:25]
        assert [d for d, _ in got] == exp
        assert all(v == float(lookup[d]) for d, v in got)


def test_stats_match_reference(num_index):
    pick = np.sort(rng.choice(IDS, size=400, replace=False))
    lookup = dict(zip(IDS.tolist(), VALS.tolist()))
    vals = np.array([lookup[d] for d in pick.tolist()], dtype=np.float64)
    st = num_index.stats("n_chars", pick)
    assert st["count"] == 400
    assert st["sum"] == float(vals.sum())
    assert st["min"] == vals.min() and st["max"] == vals.max()
    assert st["avg"] == np.float64(st["sum"]) / np.float64(400)
    empty = num_index.stats("n_chars", np.array([], dtype=np.int64))
    assert empty == {"count": 0, "sum": 0.0, "min": None, "max": None,
                     "avg": None}


def test_build_rejects_nulls(ray_session, tmp_path_factory):
    import ray.data as rd
    root = str(tmp_path_factory.mktemp("numnull"))
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "x": pa.array([1, None], type=pa.int64())})
    with pytest.raises(Exception, match="null"):
        build_numeric_index(rd.from_arrow(t), root, ["x"])


def test_build_resumable_markers(ray_session, tmp_path_factory):
    import ray.data as rd
    root = str(tmp_path_factory.mktemp("numres"))
    t = pa.table({"doc_id": pa.array(range(10), type=pa.int64()),
                  "x": pa.array(range(10), type=pa.int64())})
    base = build_numeric_index(rd.from_arrow(t), root, ["x"])
    man = os.path.join(base, "field=x", "byval", "_manifest.json")
    before = json.load(open(man))
    # second run skips the finished field: manifest bytes unchanged
    build_numeric_index(rd.from_arrow(t), root, ["x"])
    assert json.load(open(man)) == before


def test_manifest_covers_every_row_once(num_index):
    # full-range read ≡ all docs exactly once (files are disjoint)
    got = num_index.range_docs("n_chars", None, None)
    assert np.array_equal(got, np.sort(IDS))


# -- query-language range atoms -------------------------------------------


def test_parse_range_atoms():
    r = parse_query("n_chars:[100 TO 300]")
    assert r == Range("n_chars", 100.0, 300.0, True, True)
    r = parse_query("n_chars:{2.5 TO 7.5}")
    assert r == Range("n_chars", 2.5, 7.5, False, False)
    r = parse_query("n_chars:[* TO 150]")
    assert r == Range("n_chars", None, 150.0, True, True)
    r = parse_query("n_chars:[400 TO *}")
    assert r == Range("n_chars", 400.0, None, True, False)


def test_parse_range_errors():
    for bad in ["n_chars:[100 300]", "n_chars:[100 TO abc]",
                "n_chars:[foo TO 300]", "n_chars:[100 TO 300"]:
        with pytest.raises(QuerySyntaxError):
            parse_query(bad)


def test_evaluate_range_composes(ray_session, tmp_path_factory, num_index):
    """Range atoms inside boolean expressions over a real text index."""
    import ray.data as rd
    from ts_type_filter_ray.pipelines.build import build_index
    from ts_type_filter_ray.pipelines.flagship import identity_stemmer
    from ts_type_filter_ray.pipelines.query import LocalSearcher
    from ts_type_filter_ray.pipelines.querylang import evaluate

    docs = ["alpha beta", "alpha gamma", "beta gamma", "alpha", "delta"]
    lens = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    out = str(tmp_path_factory.mktemp("numql"))
    t = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                  "content": pa.array(docs, type=pa.large_string())})
    idx = build_index(rd.from_arrow(t), out, doc_part_bits=2,
                      num_term_buckets=2, stemmer=identity_stemmer)
    nt = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                   "n_chars": lens})
    build_numeric_index(rd.from_arrow(nt), out, ["n_chars"])
    s = LocalSearcher(idx, stemmer=identity_stemmer)
    ni = NumericIndex(out)
    got = evaluate("alpha AND n_chars:[15 TO 45]", s, numeric=ni)
    assert got.tolist() == [1, 3]
    got = evaluate("n_chars:{10 TO 50} AND NOT gamma", s, numeric=ni)
    assert got.tolist() == [3]
    with pytest.raises(ValueError, match="numeric"):
        evaluate("n_chars:[1 TO 2]", s)


def test_gather_accepts_duplicate_ids(ray_session, num_index):
    """Duplicates in the gather id list must align per occurrence, not
    raise a spurious missing-id KeyError (review finding)."""
    import numpy as np
    idx = num_index
    field = idx.fields[0]
    some = idx.range_docs(field)[:3]
    ids = np.array([some[0], some[0], some[1], some[0]], dtype=np.int64)
    vals = idx.gather(field, ids)
    assert vals[0] == vals[1] == vals[3]
    top = idx.topk_by_field(field, np.array([some[0], some[0]]), k=2)
    assert len(top) == 2 and top[0][0] == top[1][0] == some[0]


def test_numeric_fingerprint_staleness(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ts_type_filter_ray.pipelines.numeric import (NumericIndex,
                                                      build_numeric_index)
    root = str(tmp_path / "idx")
    ds1 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "v": pa.array([10, 20, 30], type=pa.int64())}))
    build_numeric_index(ds1, root, ["v"], fingerprint="gen1")
    assert NumericIndex(root, expected_fingerprint="gen1") is not None
    with pytest.raises(ValueError, match="STALE"):
        NumericIndex(root, expected_fingerprint="gen2")
    # a rebuild under a new fingerprint wipes and re-answers
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40], type=pa.int64())}))
    build_numeric_index(ds2, root, ["v"], fingerprint="gen2")
    idx = NumericIndex(root, expected_fingerprint="gen2")
    assert idx.range_docs("v", 35, None).tolist() == [3]


def test_numeric_rejects_beyond_2_53(ray_session, tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ts_type_filter_ray.pipelines.numeric import build_numeric_index
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "ts": pa.array([1 << 60], type=pa.int64())}))
    with pytest.raises(Exception, match="2\\^53"):
        build_numeric_index(ds, str(tmp_path / "i2"), ["ts"],
                            fingerprint="g")
