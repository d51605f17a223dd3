"""Corpus snapshot tooling (functions/snapshot.py): order-insensitive
checksum and snapshot diff."""

import duckdb
import pyarrow as pa
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.snapshot import (corpus_checksum,
                                                   corpus_diff)

A = [(0, "alpha"), (1, "beta"), (2, "gamma"), (3, "delta"), (5, "eps")]
B = [(0, "alpha"), (1, "beta CHANGED"), (3, "delta"), (5, "eps"),
     (9, "new doc")]


def _tbl(rows):
    return pa.table({"doc_id": pa.array([d for d, _ in rows],
                                        type=pa.int64()),
                     "text": pa.array([t for _, t in rows])})


def test_corpus_diff_statuses(ray_session):
    got = [(r["doc_id"], r["status"])
           for r in corpus_diff(rd.from_arrow(_tbl(A)).repartition(2),
                                rd.from_arrow(_tbl(B)).repartition(3),
                                num_parts=3).take_all()]
    assert got == [(1, "changed"), (2, "removed"), (9, "added")]


def test_corpus_diff_identical_is_empty(ray_session):
    assert corpus_diff(rd.from_arrow(_tbl(A)),
                       rd.from_arrow(_tbl(A)), num_parts=2).count() == 0


def test_corpus_diff_duplicate_id_raises(ray_session):
    dup = pa.table({"doc_id": pa.array([1, 1], type=pa.int64()),
                    "text": ["a", "b"]})
    with pytest.raises(Exception, match="duplicate doc_id"):
        corpus_diff(rd.from_arrow(dup), rd.from_arrow(_tbl(B)),
                    num_parts=2).take_all()


def test_corpus_checksum_matches_duckdb_and_order_free(ray_session):
    cs = corpus_checksum(rd.from_arrow(_tbl(A))).take_all()[0]
    con = duckdb.connect()
    con.register("documents", _tbl(A))
    exp = con.execute(
        "select count(*)::BIGINT, "
        "bit_xor(md5_number_lower(doc_id::VARCHAR || ':' || text) "
        "& 9223372036854775807)::BIGINT from documents").fetchone()
    assert (cs["n_docs"], cs["checksum"]) == exp
    shuffled = corpus_checksum(
        rd.from_arrow(_tbl(A)).random_shuffle(seed=7)).take_all()[0]
    assert shuffled["checksum"] == cs["checksum"]
    # any single-row change flips it
    mod = corpus_checksum(rd.from_arrow(_tbl(
        [(0, "alpha!"), *A[1:]]))).take_all()[0]
    assert mod["checksum"] != cs["checksum"]


def test_cli_snapshot_commands(ray_session, tmp_path, capsys):
    from ts_type_filter_ray.cli import main
    from ts_type_filter_ray.sources.synthetic import generate_corpus
    cdir = str(tmp_path / "corpus")
    generate_corpus(cdir, num_docs=40, seed=4, num_files=2)
    assert main(["checksum", cdir]) == 0
    out = capsys.readouterr().out
    assert "n_docs: 40" in out and "checksum:" in out
    assert main(["diff", cdir, cdir]) == 0
    out = capsys.readouterr().out
    assert "added: 0" in out and "removed: 0" in out and "changed: 0" in out
    assert main(["dupspans", cdir, "--k", "3"]) == 0
    out = capsys.readouterr().out
    assert "docs with duplicated spans" in out
    strip_dir = str(tmp_path / "stripped")
    assert main(["dupspans", cdir, "--k", "3", "--strip",
                 "--out", strip_dir]) == 0
    import ray.data as rd2
    stripped = rd2.read_parquet(strip_dir)
    assert stripped.count() == 40
    assert set(stripped.schema().names) == {"doc_id", "text", "n_tokens",
                                            "n_removed"}
