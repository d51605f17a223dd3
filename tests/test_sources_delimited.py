"""JSONL/CSV corpus readers: same deterministic doc_id contract as the
Parquet reader, and an index built from a JSONL corpus is identical to
one built from the equivalent Parquet corpus."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ts_type_filter_ray.sources.corpus import (read_corpus,
                                               read_corpus_delimited)

ROWS = [
    {"repo": "r0", "path": f"f{i}.ts", "commit": "0" * 40,
     "lang": "ts", "content": f"import def w{i} running import"}
    for i in range(37)
]


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("delim")
    jd, cd, pd_ = root / "jsonl", root / "csv", root / "parquet"
    for d in (jd, cd, pd_):
        os.makedirs(d)
    # 3 files, uneven sizes, reverse-sorted names to prove ordering is
    # by sorted file name then row order
    splits = [ROWS[:20], ROWS[20:25], ROWS[25:]]
    for i, chunk in enumerate(splits):
        with open(jd / f"part{i}.jsonl", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
        cols = {k: [r[k] for r in chunk] for k in chunk[0]}
        tbl = pa.table(cols)
        import pyarrow.csv as pcsv
        pcsv.write_csv(tbl, cd / f"part{i}.csv")
        pq.write_table(tbl, pd_ / f"part{i}.parquet")
    return str(jd), str(cd), str(pd_)


def test_dense_ids_match_parquet_reader(ray_session, corpus_dirs):
    jd, cd, pd_ = corpus_dirs
    want = sorted((r["doc_id"], r["content"])
                  for r in read_corpus(pd_).take_all())
    got_j = sorted((r["doc_id"], r["content"])
                   for r in read_corpus_delimited(jd, "jsonl").take_all())
    got_c = sorted((r["doc_id"], r["content"])
                   for r in read_corpus_delimited(cd, "csv").take_all())
    assert got_j == want and got_c == want
    assert [d for d, _ in want] == list(range(len(ROWS)))


def test_sparse_ids_single_pass(ray_session, corpus_dirs):
    jd, _, _ = corpus_dirs
    rows = read_corpus_delimited(jd, "jsonl", dense_ids=False).take_all()
    ids = sorted(r["doc_id"] for r in rows)
    assert len(set(ids)) == len(ROWS)
    # file i's rows live at (i << 40) + row
    assert ids[0] == 0 and ids[20] == (1 << 40)
    # sorted sparse ids give the same content ordering as dense ids
    by_id = [r["content"] for r in sorted(rows,
                                          key=lambda r: r["doc_id"])]
    assert by_id == [r["content"] for r in ROWS]


def test_index_from_jsonl_equals_parquet(ray_session, corpus_dirs,
                                         tmp_path):
    from ts_type_filter_ray.pipelines.build import build_index
    from ts_type_filter_ray.pipelines.query import LocalSearcher
    jd, _, pd_ = corpus_dirs
    ij = build_index(read_corpus_delimited(jd, "jsonl"),
                     str(tmp_path / "ij"))
    ip = build_index(read_corpus(pd_), str(tmp_path / "ip"))
    assert (ij.stats.num_documents, ij.stats.num_unique_terms,
            ij.stats.num_postings) == \
           (ip.stats.num_documents, ip.stats.num_unique_terms,
            ip.stats.num_postings)
    sj, sp = LocalSearcher(ij), LocalSearcher(ip)
    assert list(sj.match("import def")) == list(sp.match("import def"))
    assert [tuple(r) for r in sj.bm25("running w3", k=5)] == \
           [tuple(r) for r in sp.bm25("running w3", k=5)]


def test_gzip_jsonl_equals_plain(ray_session, corpus_dirs, tmp_path):
    """*.jsonl.gz files (pyarrow decompresses by extension — the crawl
    delivery format) produce the identical dense-id corpus as the plain
    files, including mixed plain/gz directories."""
    import gzip

    jd = corpus_dirs[0]
    gz = tmp_path / "gz"
    os.makedirs(gz)
    for i, name in enumerate(sorted(os.listdir(jd))):
        src = os.path.join(jd, name)
        if i == 1:  # mixed: one file stays plain
            with open(src) as f, open(gz / name, "w") as out:
                out.write(f.read())
        else:
            with open(src, "rb") as f, gzip.open(
                    gz / (name + ".gz"), "wb") as out:
                out.write(f.read())

    plain = (read_corpus_delimited(jd, "jsonl").to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    mixed = (read_corpus_delimited(str(gz), "jsonl").to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert len(plain) == len(mixed)
    for c in ("doc_id", "content", "path"):
        assert (plain[c].to_numpy() == mixed[c].to_numpy()).all(), c
