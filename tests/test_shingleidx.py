"""Persisted shingle index (functions/shingleidx.py): build-once,
probe-incrementally decontamination."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.shingleidx import (
    contaminated_against_index, load_shingle_index_meta,
    write_shingle_index)

REF = [(0, "a b c d e"), (1, "x y z w v"), (2, "p q r")]
NEW = [(10, "a b c zz qq"),   # shares the 'a b c' shingle only
       (11, "totally novel text here"),
       (12, "x y z w v"),     # every shingle hits
       (13, "p q r"),         # short-doc whole-text shingle hits
       (14, "")]


def _tbl(rows):
    return pa.table({"doc_id": pa.array([d for d, _ in rows],
                                        type=pa.int64()),
                     "text": pa.array([t for _, t in rows])})


def _brute(ref, new, k=3):
    def sh(t):
        tk = t.split()
        if not tk:
            return set()
        if len(tk) < k:
            return {tuple(tk)}
        return {tuple(tk[p:p + k]) for p in range(len(tk) - k + 1)}
    refset = set().union(*[sh(t) for _, t in ref])
    out = {}
    for did, t in new:
        s = sh(t)
        h = len(s & refset)
        if h:
            out[did] = (len(s), h)
    return out


def test_build_probe_matches_brute_force(ray_session, tmp_path):
    out = str(tmp_path / "sidx")
    meta = write_shingle_index(rd.from_arrow(_tbl(REF)).repartition(2),
                               out, shingle_k=3, num_buckets=4)
    assert meta == load_shingle_index_meta(out)
    assert meta["n_shingles"] == 7  # 3 + 3 + 1 distinct shingles
    got = {r["doc_id"]: (r["n_shingles"], r["n_hits"])
           for r in contaminated_against_index(
               rd.from_arrow(_tbl(NEW)).repartition(2), out).take_all()}
    assert got == _brute(REF, NEW)
    for r in contaminated_against_index(
            rd.from_arrow(_tbl(NEW)), out).take_all():
        assert r["hit_fraction"] == r["n_hits"] / r["n_shingles"]


def test_probe_against_self_is_full_containment(ray_session, tmp_path):
    out = str(tmp_path / "sidx_self")
    write_shingle_index(rd.from_arrow(_tbl(REF)), out, shingle_k=3,
                        num_buckets=2)
    rows = contaminated_against_index(rd.from_arrow(_tbl(REF)),
                                      out).take_all()
    assert len(rows) == len(REF)
    assert all(r["hit_fraction"] == 1.0 for r in rows)


def test_disjoint_corpus_emits_nothing(ray_session, tmp_path):
    out = str(tmp_path / "sidx_disj")
    write_shingle_index(rd.from_arrow(_tbl(REF)), out, shingle_k=3,
                        num_buckets=2)
    clean = [(20, "m n o p q r s t u v w x y z".upper())]
    assert contaminated_against_index(rd.from_arrow(_tbl(clean)),
                                      out).count() == 0
