"""Index verification (pipelines/fsck.py): a healthy index reports all
checks green; each class of corruption is detected by exactly the check
that owns it. The recounted-statistics value-exactness vs SQL is covered
by tests/test_driver_contract.py (index_fsck)."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ts_type_filter_ray.pipelines.build import build_index
from ts_type_filter_ray.pipelines.fsck import fsck_index
from ts_type_filter_ray.sources.corpus import read_corpus


@pytest.fixture(scope="module")
def healthy(ray_session, sonnets_corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("fsck_idx")
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=4, num_term_buckets=8)
    return idx.root, sonnets_corpus_dir


def _report(root, corpus_dir=None):
    corpus = read_corpus(corpus_dir) if corpus_dir else None
    return fsck_index(root, corpus).to_pylist()[0]


def _copy(root, tmp_path_factory, name):
    dst = str(tmp_path_factory.mktemp(name) / "idx")
    shutil.copytree(root, dst)
    return dst


def test_healthy_index_all_green(healthy):
    root, corpus_dir = healthy
    rep = _report(root, corpus_dir)
    assert rep["ok"]
    assert rep["stats_consistent"] and rep["df_files_consistent"]
    assert rep["doc_ids_unique"]
    assert rep["sha_mismatched_parts"] == 0
    assert rep["num_documents"] == 154
    # without a corpus the sha leg is skipped, not silently green
    rep2 = _report(root)
    assert rep2["ok"] and rep2["sha_mismatched_parts"] == -1


def test_detects_stored_sha_corruption(healthy, tmp_path_factory):
    root, corpus_dir = healthy
    bad = _copy(root, tmp_path_factory, "fsck_sha")
    f = sorted(glob.glob(bad + "/docs/*.parquet"))[0]
    tbl = pq.read_table(f)
    sh = tbl["sha256"].to_pylist()
    sh[3] = "0" * 64
    tbl = tbl.set_column(tbl.schema.get_field_index("sha256"),
                         "sha256", pa.array(sh))
    pq.write_table(tbl, f)
    rep = _report(bad, corpus_dir)
    assert rep["sha_mismatched_parts"] == 1 and not rep["ok"]
    # internal checks stay green — the corruption is content-level
    assert rep["stats_consistent"] and rep["doc_ids_unique"]


def test_detects_df_table_tamper(healthy, tmp_path_factory):
    root, _ = healthy
    bad = _copy(root, tmp_path_factory, "fsck_df")
    f = sorted(glob.glob(bad + "/postings/bucket=*/_df.parquet"))[0]
    tbl = pq.read_table(f)
    df = tbl["df"].to_pylist()
    df[0] += 1
    tbl = tbl.set_column(tbl.schema.get_field_index("df"),
                         "df", pa.array(df, type=pa.int64()))
    pq.write_table(tbl, f)
    rep = _report(bad)
    assert not rep["df_files_consistent"] and not rep["ok"]


def test_detects_stats_drift(healthy, tmp_path_factory):
    root, _ = healthy
    bad = _copy(root, tmp_path_factory, "fsck_stats")
    p = os.path.join(bad, "stats.json")
    stats = json.load(open(p))
    stats["num_postings"] += 7
    json.dump(stats, open(p, "w"))
    rep = _report(bad)
    assert not rep["stats_consistent"] and not rep["ok"]


def test_detects_duplicate_doc_ids(healthy, tmp_path_factory):
    root, _ = healthy
    bad = _copy(root, tmp_path_factory, "fsck_dup")
    fs = sorted(glob.glob(bad + "/docs/*.parquet"))
    # duplicate the first file under a new name: ids overlap across files
    shutil.copy(fs[0], os.path.join(os.path.dirname(fs[0]),
                                    "docs_zz_dup.parquet"))
    rep = _report(bad)
    assert not rep["doc_ids_unique"] and not rep["ok"]


def test_detects_content_permutation_same_part(healthy, tmp_path_factory):
    """Swapping two docs' stored sha256 values WITHIN one partition must
    fail the rollup: the digests are bound to their doc_ids before the
    XOR fold (an unbound XOR cancels under permutation)."""
    root, corpus_dir = healthy
    dst = _copy(root, tmp_path_factory, "fsck_perm")
    f = sorted(glob.glob(os.path.join(dst, "docs", "*.parquet")))[0]
    t = pq.read_table(f)
    shas = t["sha256"].to_pylist()
    assert len(shas) >= 2 and shas[0] != shas[1]
    shas[0], shas[1] = shas[1], shas[0]  # ids 0,1 share part at bits=4
    t = t.set_column(t.schema.get_field_index("sha256"), "sha256",
                     pa.array(shas, type=pa.string()))
    pq.write_table(t, f)
    rep = _report(dst, corpus_dir)
    assert rep["sha_mismatched_parts"] >= 1
    assert not rep["ok"]


def test_detects_missing_df_table(healthy, tmp_path_factory):
    root, corpus_dir = healthy
    dst = _copy(root, tmp_path_factory, "fsck_nodf")
    dfs = sorted(glob.glob(os.path.join(dst, "postings", "bucket=*",
                                        "_df.parquet")))
    os.remove(dfs[0])
    rep = _report(dst)
    assert not rep["df_files_consistent"]
    assert not rep["ok"]
