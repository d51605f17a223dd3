"""Vectorized single-block md5 (text/hashvec.py) — bit-exact vs hashlib,
which is itself the contract DuckDB's ``md5_number_lower`` verifies in
the driver gate."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from ts_type_filter_ray.text.hashvec import (MAX_SINGLE_BLOCK,
                                             md5_lower64_ints,
                                             md5_lower64_strings)


def _ref(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:],
                          "little")


def test_ints_bit_exact():
    rng = np.random.default_rng(7)
    ids = np.concatenate([
        np.arange(0, 200),                       # small ids
        10 ** np.arange(19),                     # digit-count boundaries
        10 ** np.arange(1, 19) - 1,
        rng.integers(0, 2 ** 62, 3000),          # random large
        [-1, -42, -(10 ** 17)],                  # negatives
    ]).astype(np.int64)
    got = md5_lower64_ints(ids)
    exp = np.array([_ref(str(int(d))) for d in ids], dtype=np.uint64)
    assert (got == exp).all()


def test_strings_bit_exact_including_boundaries():
    strs = (["", "a", "hello world", " ", "\t",
             "x" * MAX_SINGLE_BLOCK,              # largest single-block
             "y" * (MAX_SINGLE_BLOCK + 1),        # smallest fallback
             "z" * 300,                           # long fallback
             "héllo", "日本語", "emoji🙂mix"] +
            [f"tok{i}" for i in range(500)])
    got = md5_lower64_strings(strs)
    exp = np.array([_ref(s) for s in strs], dtype=np.uint64)
    assert (got == exp).all()


def test_strings_accepts_sliced_and_chunked_arrow():
    strs = [f"w{i}" for i in range(100)]
    sliced = pa.array(strs).slice(13, 40)
    got = md5_lower64_strings(sliced)
    exp = np.array([_ref(s) for s in strs[13:53]], dtype=np.uint64)
    assert (got == exp).all()
    chunked = pa.chunked_array([strs[:30], strs[30:]], type=pa.string())
    got = md5_lower64_strings(chunked)
    exp = np.array([_ref(s) for s in strs], dtype=np.uint64)
    assert (got == exp).all()


def test_empty_inputs():
    assert len(md5_lower64_ints(np.array([], dtype=np.int64))) == 0
    assert len(md5_lower64_strings([])) == 0


def test_matches_duckdb_md5_number_lower():
    duckdb = pytest.importorskip("duckdb")
    ids = [0, 1, 42, 999, 123456789012345]
    got = md5_lower64_ints(np.array(ids, dtype=np.int64))
    rows = duckdb.sql(
        "select md5_number_lower(x::VARCHAR) from (select unnest($ids) x)",
        params={"ids": ids}).fetchall()
    assert [int(g) for g in got] == [r[0] for r in rows]
