"""Count-Min sketch: distributed build vs single-pass reference,
overestimate invariant, collision behavior at tiny widths."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.sketches import (
    _cms_row_hashes, cms_estimate, cms_sketch, cms_term_counts)

TEXTS = ["the cat sat on the mat", "the dog", "", "   ",
         "Cat CAT cat", "mat mat mat mat", "a b c d e f g h"]


def _truth():
    acc = {}
    for t in TEXTS:
        for tok in t.strip().lower().split():
            acc[tok] = acc.get(tok, 0) + 1
    return acc


def _ref_sketch(depth, width):
    truth = _truth()
    terms = sorted(truth)
    sk = np.zeros((depth, width), dtype=np.int64)
    if terms:
        slots = _cms_row_hashes(terms, depth, width)
        for d in range(depth):
            for j, t in enumerate(terms):
                sk[d, slots[d, j]] += truth[t]
    return sk


def _ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
        "text": pa.array(TEXTS),
    })).repartition(3)


def test_distributed_sketch_matches_reference(ray_session):
    for depth, width in ((1, 8), (3, 16), (4, 64)):
        got = cms_sketch(_ds(), depth=depth, width=width)
        assert np.array_equal(got, _ref_sketch(depth, width)), (depth,
                                                                width)


def test_estimates_overestimate_only(ray_session):
    truth = _truth()
    # width 4 << vocab: collisions guaranteed, min-over-rows must bite
    tbl = cms_term_counts(_ds(), depth=3, width=4, num_parts=2)
    got = {t: (tf, est) for t, tf, est in zip(
        tbl["term"].to_pylist(), tbl["tf"].to_pylist(),
        tbl["cms_count"].to_pylist())}
    assert set(got) == set(truth)
    total = sum(truth.values())
    overs = 0
    for t, (tf, est) in got.items():
        assert tf == truth[t]
        assert est >= tf          # the CMS guarantee
        assert est <= total       # a slot never exceeds the stream mass
        overs += est > tf
    assert overs > 0              # width 4 really collided


def test_wide_sketch_is_exact_here(ray_session):
    # wide enough that these 13 terms happen not to collide in some row
    tbl = cms_term_counts(_ds(), depth=4, width=4096, num_parts=2)
    assert tbl["tf"].to_pylist() == tbl["cms_count"].to_pylist()


def test_empty_corpus(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([" "]),
    }))
    assert cms_sketch(ds, depth=2, width=8).sum() == 0
    assert cms_estimate(np.zeros((2, 8), dtype=np.int64), []).size == 0
    assert cms_term_counts(ds, depth=2, width=8, num_parts=1).num_rows \
        == 0


def test_cms_join_size_overestimate_and_exact(ray_session):
    """CMS inner-product join-size estimate: always >= the true join
    size; equals the SQL oracle bit-for-bit; exact when width is
    collision-free."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.functions.sketches import (cms_join_size,
                                                       cms_join_size_sql)
    rng = np.random.default_rng(4)
    a = pa.table({"k": pa.array(rng.integers(0, 20, 300),
                                type=pa.int64())})
    b = pa.table({"k2": pa.array(rng.integers(0, 20, 150),
                                 type=pa.int64())})
    con = duckdb.connect()
    con.register("ta", a)
    con.register("tb", b)
    true = con.execute(
        "select count(*) from ta join tb on tb.k2 = ta.k").fetchone()[0]
    for width in (8, 4096):
        got = cms_join_size(rd.from_arrow(a), "k", rd.from_arrow(b),
                            "k2", depth=3, width=width)
        est = got["est_join_size"][0].as_py()
        want = con.execute(cms_join_size_sql(
            "ta", "k", "tb", "k2", 3, width)).fetchone()[2]
        assert est == want
        assert est >= true
        if width == 4096:  # 20 keys in 4096 slots: no collisions
            assert est == true


def test_cms_join_size_null_keys_and_empty(ray_session):
    """Null keys drop (equi-join semantics, SQL mirror parity); an
    empty side yields 0 on BOTH sides (coalesce in the oracle)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.functions.sketches import (cms_join_size,
                                                       cms_join_size_sql)
    a = pa.table({"k": pa.array([1, None, 2, 1], type=pa.int64())})
    b = pa.table({"k2": pa.array([1, None], type=pa.int64())})
    empty = pa.table({"k2": pa.array([], type=pa.int64())})
    con = duckdb.connect()
    con.register("ta", a)
    con.register("tb", b)
    con.register("te", empty)
    got = cms_join_size(rd.from_arrow(a), "k", rd.from_arrow(b), "k2",
                        depth=2, width=64)["est_join_size"][0].as_py()
    want = con.execute(cms_join_size_sql(
        "ta", "k", "tb", "k2", 2, 64)).fetchone()[2]
    assert got == want == 2  # only the two k=1 rows join the one k2=1
    got0 = cms_join_size(rd.from_arrow(a), "k", rd.from_arrow(empty),
                         "k2", depth=2, width=64)
    want0 = con.execute(cms_join_size_sql(
        "ta", "k", "te", "k2", 2, 64)).fetchone()[2]
    assert got0["est_join_size"][0].as_py() == want0 == 0


def test_hll_group_exact_vs_oracle_and_accuracy(ray_session):
    """Per-group HLL: registers + estimate bit-identical to the SQL
    mirror, raw-branch accuracy within 8% at p=10 on a 4k vocabulary."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.functions.sketches import (
        hll_distinct_by_group, hll_group_sql)
    rng = np.random.default_rng(6)
    texts, langs = [], []
    for i in range(400):
        n = int(rng.integers(20, 60))
        words = [f"w{int(rng.integers(0, 4000))}" for _ in range(n)]
        texts.append(" ".join(words))
        langs.append(["en", "de"][i % 2])
    t = pa.table({"doc_id": pa.array(range(400), type=pa.int64()),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    got = (hll_distinct_by_group(rd.from_arrow(t), p=10).to_pandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(hll_group_sql("lang", 10)
                       + " order by grp").fetchdf().reset_index(drop=True)
    assert (got["estimate"].values == want["estimate"].values).all()
    true = con.execute("""
        select lang, count(distinct term) as n from (
          select lang, unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+')) as term
          from documents where trim(text) <> '') group by 1
        order by 1""").fetchdf()
    for g, est in zip(got["grp"], got["estimate"]):
        tv = int(true.loc[true.lang == g, "n"].iloc[0])
        assert abs(est - tv) / tv < 0.08, (g, est, tv)


def test_hll_set_ops_union_intersection(ray_session):
    """Union via register max + inclusion-exclusion intersection:
    bit-identical to SQL, and accurate on genuinely disjoint-ish
    vocabularies (A∪B ≈ 3000, A∩B ≈ 1000 at p=10)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.functions.sketches import (hll_set_ops,
                                                       hll_set_ops_sql)
    rng = np.random.default_rng(8)
    texts, langs = [], []
    for i in range(400):
        lang = ["en", "de"][i % 2]
        lo = 0 if lang == "en" else 1000  # en: 0..1999, de: 1000..2999
        words = [f"w{int(rng.integers(lo, lo + 2000))}"
                 for _ in range(40)]
        texts.append(" ".join(words))
        langs.append(lang)
    t = pa.table({"doc_id": pa.array(range(400), type=pa.int64()),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    got = hll_set_ops(rd.from_arrow(t), "lang", "en", "de",
                      p=10).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(hll_set_ops_sql("lang", "en", "de", 10)).fetchdf()
    assert (got.values == want[got.columns].values).all()
    # accuracy: union ≈ 3000, intersection ≈ 1000 (±12%; the
    # intersection inherits both sketches' error)
    assert abs(got["est_union"][0] - 3000) / 3000 < 0.08
    assert abs(got["est_intersection"][0] - 1000) / 1000 < 0.15


def test_hll_set_ops_guards(ray_session):
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from ts_type_filter_ray.functions.sketches import hll_set_ops
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": pa.array(["a b"]), "lang": pa.array(["en"])})
    with _pytest.raises(ValueError, match="distinct groups"):
        hll_set_ops(rd.from_arrow(t), "lang", "en", "en").take_all()
    with _pytest.raises(ValueError, match="no tokens"):
        hll_set_ops(rd.from_arrow(t), "lang", "en", "xx").take_all()
