"""Funnel / cohort-retention / per-group OLS: engine vs DuckDB on a
synthetic events log with the semantics-critical edge cases (out-of-order
steps, equal-timestamp strictness, never-reached steps, multi-week users,
float-bit-identical regression moments)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.events import (
    COHORT_SQL, FUNNEL_SQL, OLS_SQL, cohort_retention, funnel_counts,
    group_ols)

US = 1_000_000
BASE = 1_704_067_200 * US  # 2024-01-01T00:00:00Z


def _ev(rows):
    """rows: (event_id, t_us_offset, user_id, event_type, value)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([BASE + r[1] for r in rows],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        "value": pa.array([float(r[4]) for r in rows],
                          type=pa.float64()),
    })


def _oracle(table, sql):
    import duckdb
    con = duckdb.connect()
    con.register("events", table)
    return con.execute(sql).fetchdf()


FUNNEL_ROWS = [
    # u1 completes in order
    (1, 0, 1, "view", 1), (2, 10, 1, "click", 1), (3, 20, 1, "purchase", 1),
    # u2: click BEFORE view, purchase after view but no click after view
    (4, 5, 2, "click", 1), (5, 9, 2, "view", 1), (6, 30, 2, "purchase", 1),
    # u3: click at the SAME µs as its earliest view — strict > rejects it
    (7, 0, 3, "view", 1), (8, 0, 3, "click", 1),
    # u4: view only
    (9, 0, 4, "view", 1),
    # u5: two views; the EARLIEST chains (click is after view#2 only —
    # still after view#1, so it counts)
    (10, 50, 5, "view", 1), (11, 5, 5, "view", 1), (12, 60, 5, "click", 1),
]


def test_funnel_strict_chaining(ray_session):
    t = _ev(FUNNEL_ROWS)
    got = (funnel_counts(rd.from_arrow(t), num_parts=4).to_pandas()
           .sort_values("step_idx").reset_index(drop=True))
    want = _oracle(t, FUNNEL_SQL).sort_values(
        "step_idx").reset_index(drop=True)
    assert got.equals(want[got.columns])
    assert got["n_users"].tolist() == [5, 2, 1]  # u1+u5 click, u1 buys


def test_funnel_zero_rows_for_unreached_steps(ray_session):
    t = _ev([(1, 0, 1, "view", 1)])
    got = funnel_counts(rd.from_arrow(t), num_parts=2).to_pandas()
    got = got.sort_values("step_idx")
    assert got["n_users"].tolist() == [1, 0, 0]


WEEK = 7 * 86400 * US


def test_cohort_retention(ray_session):
    rows = [
        # u1: first touch week w, active w, w+1, w+3 (two events in w+1
        # count once)
        (1, 0, 1, "view", 1), (2, WEEK, 1, "view", 1),
        (3, WEEK + 5, 1, "click", 1), (4, 3 * WEEK, 1, "view", 1),
        # u2: first touch w+1 only
        (5, WEEK, 2, "view", 1),
    ]
    t = _ev(rows)
    got = (cohort_retention(rd.from_arrow(t), num_parts=4).to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    want = _oracle(t, COHORT_SQL).sort_values(
        ["cohort_week", "week_offset"]).reset_index(drop=True)
    assert got.equals(want[got.columns])
    # offsets: u1 → 0,1,3; u2 → 0 (in the next cohort week)
    assert got["n_users"].sum() == 4
    assert sorted(got["week_offset"].tolist()) == [0, 0, 1, 3]


def test_group_ols_bit_identical(ray_session):
    rng = np.random.default_rng(3)
    rows = [(i, int(rng.integers(0, 30 * 86400)) * US,
             int(rng.integers(1, 9)),
             ["a", "b"][i % 2],
             round(float(rng.uniform(0, 400)), 2))
            for i in range(400)]
    t = _ev(rows)
    got = (group_ols(rd.from_arrow(t)).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    want = _oracle(t, OLS_SQL).sort_values(
        "event_type").reset_index(drop=True)
    for col in ("n_events", "slope", "intercept", "r"):
        assert (got[col].values == want[col].values).all(), col
    # slope sanity vs numpy lstsq (loose — different arithmetic)
    x = np.array([r[1] // US // 3600 for r in rows if r[3] == "a"])
    y = np.array([round(r[4] * 100) for r in rows if r[3] == "a"])
    ref = np.polyfit(x, y, 1)[0]
    a = got.loc[got.event_type == "a", "slope"].iloc[0]
    assert abs(a - ref) < 1e-6 * max(1.0, abs(ref))


def test_group_ols_guards(ray_session):
    # pre-epoch0 timestamp → contract error
    bad = _ev([(1, -US * 86400 * 40, 1, "a", 1.0),
               (2, 0, 1, "a", 2.0)])
    with pytest.raises(Exception, match="non-negative hour-index"):
        group_ols(rd.from_arrow(bad)).take_all()
    # cents beyond the 2^21 contract → rescale error
    big = _ev([(1, 0, 1, "a", 50_000.0), (2, US, 1, "a", 1.0)])
    with pytest.raises(Exception, match="2\\^21-cent"):
        group_ols(rd.from_arrow(big)).take_all()
    # constant x → degenerate group raises rather than dividing by zero
    const = _ev([(1, 0, 1, "a", 1.0), (2, 1000, 1, "a", 2.0)])
    with pytest.raises(Exception, match="degenerate"):
        group_ols(rd.from_arrow(const)).take_all()


def test_funnel_pre_epoch_raises(ray_session):
    bad = _ev([(1, -BASE - US, 1, "view", 1)])  # negative epoch
    with pytest.raises(Exception, match="pre-epoch"):
        funnel_counts(rd.from_arrow(bad), num_parts=2).take_all()


def test_zscore_overflow_guard(ray_session):
    """n·max² ≥ 2^63 must raise the contract error, not wrap."""
    from ts_type_filter_ray.functions.events import zscore_normalize
    n = 4000
    vals = [20_000.0] * (n - 1) + [19_999.0]
    t = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "event_type": pa.array(["a"] * n),
        "value": pa.array(vals, type=pa.float64()),
    })
    # the bound trips at n·max² ≥ 2^63: with max ≈ 2^21 cents that is
    # n ≈ 2.1M rows of near-cap values
    nb = 2_200_000
    vals = np.full(nb, 20_971.0)
    vals[-1] = 20_970.0
    big = pa.table({
        "event_id": pa.array(np.arange(nb), type=pa.int64()),
        "event_type": pa.array(["a"] * nb),
        "value": pa.array(vals, type=pa.float64()),
    })
    # 2.2e6 * (2097100)^2 ≈ 9.7e18 >= 2^63 → guard fires
    with pytest.raises(Exception, match="n\\*max\\^2"):
        zscore_normalize(rd.from_arrow(big)).take_all()
    # the smaller case is inside the bound and must succeed
    out = zscore_normalize(rd.from_arrow(t)).take_all()
    assert len(out) == n


def test_pivot_pre_anchor_week_truncates_like_oracle(ray_session):
    """Days 1970-01-01..04 precede the Monday anchor: engine truncation
    must match DuckDB's // (regression for the floor-division bug)."""
    import duckdb
    from ts_type_filter_ray.functions.events import (
        PIVOT_WEEKLY_SQL, pivot_weekly_counts)
    t = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([86400 * US, BASE],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([1, 1], type=pa.int64()),
        "event_type": pa.array(["view", "view"]),
        "value": pa.array([1.0, 1.0]),
    })
    got = pivot_weekly_counts(rd.from_arrow(t),
                              types=("view",)).to_pandas()
    con = duckdb.connect()
    con.register("events", t)
    sql = PIVOT_WEEKLY_SQL
    for c in ("click", "error", "purchase", "signup"):
        sql = sql.replace(
            f"count(*) filter (event_type = '{c}')::BIGINT as n_{c},",
            "")
    want = con.execute(sql + " order by week").fetchdf()
    assert got.reset_index(drop=True).equals(
        want[got.columns].reset_index(drop=True))
    assert 0 in got["week"].tolist()  # 1970-01-02 truncates to week 0
