"""TPC-H Q18 big-volume orders + multi-phrase dictionary counts:
edge-case fixtures vs DuckDB."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.relational import (BIG_VOLUME_SQL,
                                                     big_volume_orders)
from ts_type_filter_ray.functions.textstats import (phrase_counts,
                                                    phrase_counts_sql)


@pytest.fixture(scope="module")
def q18_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("q18")
    rng = np.random.default_rng(13)
    n_ord, n_li = 50, 400
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, 10, n_ord),
                              type=pa.int64()),
        "o_totalprice": pa.array(rng.integers(1, 10**6, n_ord) / 4.0),
    }), d / "orders.parquet")
    # order 0 gets no lineitems; orderkeys 97/98 are orphans (must be
    # ignored — no order row to join back to)
    lk = np.concatenate([rng.integers(1, n_ord, n_li - 3),
                         np.array([97, 98, 97])])
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lk, type=pa.int64()),
        "l_quantity": pa.array(rng.integers(1, 200, n_li) / 4.0),
    }), d / "lineitem.parquet")
    return str(d)


def test_q18_matches_duckdb(ray_session, q18_dir):
    import duckdb
    got = (big_volume_orders(q18_dir, min_qty_c=10_000, num_parts=4)
           .to_pandas().sort_values("o_orderkey")
           .reset_index(drop=True))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{q18_dir}/{t}.parquet')")
    want = con.execute(
        BIG_VOLUME_SQL.replace("> 15000", "> 10000")
        + " order by o_orderkey").fetchdf()
    assert len(got) > 0
    assert got.equals(want[got.columns])
    keys = set(got["o_orderkey"])
    assert 0 not in keys and 97 not in keys and 98 not in keys


def test_q18_empty_when_threshold_impossible(ray_session, q18_dir):
    got = big_volume_orders(q18_dir, min_qty_c=10**12, num_parts=4)
    assert got.count() == 0


def _docs_tbl(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_phrase_counts_non_overlapping(ray_session):
    import duckdb
    texts = ["aa aa aa", "aaaa", "no match here", "x aa y aa", ""]
    phrases = ("aa", "aa aa")
    got = (phrase_counts(_docs_tbl(texts), phrases).to_pandas()
           .sort_values(["doc_id", "phrase"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    want = (con.execute(phrase_counts_sql(phrases)
                        + " order by doc_id, phrase").fetchdf()
            .reset_index(drop=True))
    assert got.equals(want[got.columns])
    d = {(r.doc_id, r.phrase): r.n for r in got.itertuples()}
    # 'aaaa' holds two non-overlapping 'aa'; 'aa aa aa' holds one
    # 'aa aa' (greedy left-to-right), three 'aa'
    assert d[(1, "aa")] == 2
    assert d[(0, "aa aa")] == 1
    assert d[(0, "aa")] == 3
    assert (2, "aa") not in d and (4, "aa") not in d


def test_phrase_counts_guards(ray_session):
    with pytest.raises(ValueError, match="at least one"):
        phrase_counts(_docs_tbl(["x"]), ())
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_counts(_docs_tbl(["x"]), ("a", ""))
