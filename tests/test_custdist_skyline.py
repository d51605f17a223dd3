"""Q13 left-outer count distribution + Pareto skyline: engine vs DuckDB
on synthetic tables with the shape-specific edge cases (zero-order
customers, dangling FK orders, duplicate skyline twins, multi-block
distributive merge)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ts_type_filter_ray.functions.relational import (
    CUSTDIST_SQL, SKYLINE_SQL, order_count_distribution, orders_skyline)


@pytest.fixture(scope="module")
def rel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("custdist")
    rng = np.random.default_rng(7)
    n_cust, n_ord = 30, 120
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
    }), d / "customer.parquet")
    base = np.datetime64("1997-01-01T00:00:00.000000")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    # custkeys 0..19 only → customers 20..29 are guaranteed zero-bucket;
    # custkeys 97..99 are dangling FKs (no customer row) and must be
    # invisible to the LEFT JOIN
    ck = np.concatenate([rng.integers(0, 20, n_ord - 3),
                         np.array([97, 98, 99])])
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(ck, type=pa.int64()),
        "o_orderpriority": pa.array(
            [["1-URGENT", "5-LOW"][i % 2] for i in range(n_ord)]),
        "o_totalprice": pa.array(rng.integers(1, 500000, n_ord) / 4.0),
        "o_orderdate": pa.array(
            base + rng.integers(0, 700, n_ord) * day,
            type=pa.timestamp("us")),
    }), d / "orders.parquet")
    return str(d)


def _con(rel_dir):
    import duckdb
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{rel_dir}/{t}.parquet')")
    return con


def test_custdist_matches_duckdb(ray_session, rel_dir):
    got = (order_count_distribution(rel_dir, min_total=1000.0, num_parts=4)
           .to_pandas().sort_values("c_count").reset_index(drop=True))
    want = _con(rel_dir).execute(
        CUSTDIST_SQL.replace("200000.0", "1000.0")
        + " order by c_count").fetchdf()
    assert got.equals(want[got.columns])
    # the zero bucket is live (customers 20..29 plus unmatched others)
    assert int(got.loc[got["c_count"] == 0, "custdist"].iloc[0]) >= 10
    # dangling orders never inflate any bucket: total customers conserved
    assert int(got["custdist"].sum()) == 30


def test_custdist_all_zero_when_nothing_qualifies(ray_session, rel_dir):
    got = order_count_distribution(rel_dir, priority="9-NOPE",
                                   num_parts=4).take_all()
    assert got == [{"c_count": 0, "custdist": 30}]


def test_skyline_matches_duckdb(ray_session, rel_dir):
    got = orders_skyline(rel_dir).to_pandas().reset_index(drop=True)
    want = _con(rel_dir).execute(
        SKYLINE_SQL + " order by o_orderkey").fetchdf()
    assert got.equals(want[got.columns])
    assert len(got) >= 1


def test_skyline_duplicate_twins_survive(ray_session, tmp_path):
    """Exact (price, date) duplicates do not dominate each other; a
    strictly dominated point falls; incomparable points survive."""
    d = str(tmp_path)
    ts = pa.timestamp("us")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    base = np.datetime64("2000-01-01T00:00:00.000000")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        # twins (100, day0) ×2; (50, day0) dominated by them;
        # (200, day5) and (100, day0) incomparable; (90, day9) dominated
        "o_totalprice": pa.array([100.0, 100.0, 50.0, 200.0, 90.0]),
        "o_orderdate": pa.array(base + np.array([0, 0, 0, 5, 9]) * day,
                                type=ts),
    }), f"{d}/orders.parquet")
    got = orders_skyline(d).to_pandas()
    assert sorted(got["o_orderkey"].tolist()) == [1, 2, 4]


def test_skyline_multiblock_distributive(ray_session, tmp_path):
    """Many small row groups → several read blocks → the final merge
    pass actually combines local skylines; result still equals SQL."""
    d = str(tmp_path)
    rng = np.random.default_rng(11)
    n = 20_000
    base = np.datetime64("1995-01-01T00:00:00.000000")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n), type=pa.int64()),
        "o_totalprice": pa.array(rng.integers(1, 10**6, n) / 4.0),
        "o_orderdate": pa.array(base + rng.integers(0, 3000, n) * day,
                                type=pa.timestamp("us")),
    }), f"{d}/orders.parquet", row_group_size=1000)
    got = orders_skyline(d).to_pandas().reset_index(drop=True)
    import duckdb
    con = duckdb.connect()
    con.execute(f"create view orders as select * from "
                f"read_parquet('{d}/orders.parquet')")
    want = con.execute(SKYLINE_SQL + " order by o_orderkey").fetchdf()
    assert got.equals(want[got.columns])
