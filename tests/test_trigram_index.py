"""Trigram term index (pipelines/trigram.py): candidate completeness
and match parity with the vocabulary-sweep paths
(``LocalSearcher.match_contains`` / ``match_regex``) over fuzzed
infixes and a regex panel, literal-factor extraction soundness, plus
artifact lifecycle (idempotent reuse, staleness guard, short-infix and
missing-artifact errors)."""

import random

import pytest

from ts_type_filter_ray.pipelines.build import build_index
from ts_type_filter_ray.pipelines.query import LocalSearcher
from ts_type_filter_ray.pipelines.trigram import (build_trigram_index,
                                                  match_contains_indexed,
                                                  match_regex_indexed,
                                                  required_literal_factor,
                                                  term_trigrams,
                                                  trigram_candidate_terms)
from ts_type_filter_ray.sources.corpus import read_corpus


@pytest.fixture(scope="module")
def trgm_fixture(ray_session, sonnets_corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("trgmidx")
    corpus = read_corpus(sonnets_corpus_dir)
    idx = build_index(corpus, str(out / "idx"), doc_part_bits=6,
                      num_term_buckets=8, tokenize_batch_size=32)
    build_trigram_index(idx.root)
    return idx, LocalSearcher(idx)


def test_term_trigrams():
    assert term_trigrams("abcd") == ["abc", "bcd"]
    assert term_trigrams("aaaa") == ["aaa"]
    assert term_trigrams("ab") == []
    assert term_trigrams("") == []


def test_candidates_match_vocab_sweep(trgm_fixture):
    idx, searcher = trgm_fixture
    vocab = [searcher._terms.arr[i].as_py()
             for i in range(searcher._terms.n)]
    rng = random.Random(99)
    infixes = set()
    for _ in range(80):
        w = rng.choice(vocab)
        if len(w) < 3:
            continue
        i = rng.randrange(0, len(w) - 2)
        j = rng.randrange(i + 3, len(w) + 1)
        infixes.add(w[i:j])
    infixes |= {"zzz", "qqqq", "the", "ove", "Fir"}
    for q in sorted(infixes):
        want = sorted(
            searcher._terms.arr[int(vi)].as_py()
            for vi in searcher._vocab_indices("contains", q))
        got = trigram_candidate_terms(idx.root, q)
        assert got == want, q


def test_match_parity_with_sweep(trgm_fixture):
    idx, searcher = trgm_fixture
    for q in ("the", "ove", "ight", "zzz", "easo", "Fir"):
        assert (match_contains_indexed(idx, q).tolist()
                == searcher.match_contains(q).tolist()), q


def test_required_literal_factor():
    assert required_literal_factor("abc") == "abc"
    assert required_literal_factor("^summer$") == "summer"
    assert required_literal_factor("a.light") == "light"
    assert required_literal_factor("wint(er|ry)") == "wint"
    # NOT "abccd": 'abcccd' matches abc{2,}d yet lacks that substring —
    # a variable repeat glues its lo guaranteed copies to EACH neighbor
    # separately ("abcc" and "ccd" are the true required factors)
    assert required_literal_factor("abc{2,}d") == "abcc"
    # optionals / alternations / classes are not required
    assert required_literal_factor("(abc)?xy") is None
    assert required_literal_factor("a|bcd") is None
    assert required_literal_factor("[abc]de") is None
    assert required_literal_factor("ab") is None
    # case-insensitive and uppercase factors can't probe the
    # lowercase-gram dictionary
    assert required_literal_factor("(?i)abc") is None
    assert required_literal_factor("ABC") is None
    assert required_literal_factor("(") is None


def test_regex_parity_with_sweep(trgm_fixture):
    idx, searcher = trgm_fixture
    panel = ["^sum", "ing$", "lov(e|ing)", "th.e", "^(fire|water)$",
             "zzz", "sum{1,2}er", "[aeiou]ght", "(?i)the"]
    for p in panel:
        assert (match_regex_indexed(idx, p).tolist()
                == searcher.match_regex(p).tolist()), p


def test_lifecycle_guards(trgm_fixture, tmp_path):
    import os
    import time

    idx, _ = trgm_fixture
    d = build_trigram_index(idx.root)
    mtime = os.path.getmtime(os.path.join(d, "_meta.json"))
    time.sleep(0.01)
    assert build_trigram_index(idx.root) == d
    assert os.path.getmtime(os.path.join(d, "_meta.json")) == mtime

    with pytest.raises(ValueError):
        trigram_candidate_terms(idx.root, "ab")
    with pytest.raises(FileNotFoundError):
        trigram_candidate_terms(str(tmp_path / "nope"), "abc")


def test_required_literal_factor_variable_repeats_split_runs():
    """'foo+bar' must NOT yield 'foobar' ('foooobar' matches the regex
    but lacks that factor) — variable-count repeats contribute their
    guaranteed lo copies to BOTH neighbors, never joining them."""
    from ts_type_filter_ray.pipelines.trigram import required_literal_factor

    # the published counterexample: 'foooobar' matches but the old
    # glued factor 'foobar' is absent from it
    f = required_literal_factor("foo+bar")
    assert f in "foooobar"
    assert required_literal_factor("foo+bar") in ("foo", "obar")
    assert required_literal_factor("xa{2,3}y") in ("xaa", "aay")
    assert required_literal_factor("ab{1,2}cd") == "bcd"
    assert required_literal_factor("x{3}yz") == "xxxyz"  # exact count glues


def test_merge_bucket_spills_idempotent_after_partial_cleanup(tmp_path):
    """Simulate a task retry after a crash between the merged.parquet
    replace and the src cleanup: the re-run must not lose rows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ts_type_filter_ray.pipelines.fuzzy import merge_bucket_spills

    d = str(tmp_path / "vbucket=0")
    os.makedirs(d)
    pq.write_table(pa.table({"variant": ["a", "c"], "term": ["t1", "t2"]}),
                   os.path.join(d, "src=0.parquet"))
    pq.write_table(pa.table({"variant": ["b"], "term": ["t3"]}),
                   os.path.join(d, "src=1.parquet"))
    n = merge_bucket_spills(d, "variant")
    assert n == 3
    # crash simulation: restore ONE src file beside the merged output
    # (as if the cleanup loop died half-way), then retry
    pq.write_table(pa.table({"variant": ["b"], "term": ["t3"]}),
                   os.path.join(d, "src=1.parquet"))
    n2 = merge_bucket_spills(d, "variant")
    assert n2 == 3  # full row set, overlap deduped
    out = pq.read_table(os.path.join(d, "merged.parquet"))
    assert sorted(zip(out["variant"].to_pylist(),
                      out["term"].to_pylist())) == [
        ("a", "t1"), ("b", "t3"), ("c", "t2")]
