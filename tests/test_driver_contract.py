"""Simulates the driver's correctness gate: for every ``queries()`` entry
with an ``oracle_sql()`` counterpart, run both at sf0.01 and compare
row-count + schema (column names) + order-insensitive values. Float
columns must match exactly — the engine/oracle pairs are engineered for
bit-identical float64 arithmetic."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


def _to_pandas(result):
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, con, name):
    q = entrymod.queries()[name]
    got = _canon(_to_pandas(q(SF)))
    exp = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), "schema mismatch"
    assert len(got) == len(exp), "row count mismatch"
    for col in got.columns:
        g = got[col].to_numpy()
        e = exp[col].to_numpy()
        # the driver hashes canonicalized values; a DuckDB HUGEINT/Decimal
        # (object dtype) vs engine int64 passes `==` but fails the hash —
        # require matching dtype KIND (int32 vs int64 is known-tolerated:
        # ann_topk was hash-green in round 1 with an int32 rank column)
        assert got[col].dtype.kind == exp[col].dtype.kind, (
            f"dtype-kind mismatch in column {col}: "
            f"{got[col].dtype} vs {exp[col].dtype}")
        assert (g == e).all(), f"value mismatch in column {col}"


def test_rows_only_queries_run(ray_session):
    qs = entrymod.queries()
    rows_only = sorted(set(qs) - set(SQL_CHECKED))
    assert rows_only  # the stemmed/approximate family exists
    for name in rows_only:
        df = _to_pandas(qs[name](SF))
        assert df is not None
        assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
    assert set(df.columns) == {"query_idx", "rank", "doc_id", "score"}
