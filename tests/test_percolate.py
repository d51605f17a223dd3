"""Percolation: stored queries matched against a streaming corpus must
equal (a) a brute-force Python oracle over the token sequences and
(b) ``querylang.evaluate`` over a built index of the same corpus, for
every expression both surfaces accept."""

import numpy as np
import pyarrow as pa
import pytest

from ts_type_filter_ray.pipelines.percolate import (
    CompiledRule, compile_rules, percolate)
from ts_type_filter_ray.pipelines.querylang import QuerySyntaxError

DOCS = [
    "the fast key order sort",                 # 0
    "order fast order fast order",             # 1
    "batch batch batch stream",                # 2
    "",                                        # 3: empty doc
    "Fast ORDER fast",                         # 4: case folding
    "solo",                                    # 5
    "a b c d e f g a b c",                     # 6
    "ordr sorted keys",                        # 7: fuzzy/prefix bait
]
LANGS = ["en", "en", "fr", "fr", "en", "de", "en", "en"]
SIZES = [25, 29, 24, 0, 15, 4, 19, 16]

RULES = {
    "r_term": "order",
    "r_and": "order AND fast",
    "r_andnot": "fast AND NOT batch",
    "r_or": "batch OR solo",
    "r_not": "NOT order",                      # pure negation: allowed here
    "r_phrase": '"order fast"',
    "r_phrase3": '"a b c"',
    "r_prox": '"key sort"~3',
    "r_prox_same": '"order order"~2',
    "r_prefix": "ord*",
    "r_suffix": "*ed",
    "r_contains": "*rde*",
    "r_fuzzy": "ordr~1",
    "r_field": "lang:en AND fast",
    "r_fieldpref": "lang:e* AND solo OR lang:de",
    "r_range": "n_chars:[15 TO 25] AND NOT batch",
    "r_range_open": "n_chars:{* TO 20}",
    "r_nested": '(order OR batch) AND NOT "order fast" AND lang:en',
    "r_miss": "zzz_missing",
}


def _toks(s):
    return s.lower().split()


def _lev(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
    return d(len(a), len(b))


def _ref_match(expr_id: str, d: int) -> bool:
    t = _toks(DOCS[d])
    ts = set(t)

    def phrase(words):
        k = len(words)
        return any(t[i:i + k] == words for i in range(len(t) - k + 1))

    def prox(a, b, w):
        ia = [i for i, x in enumerate(t) if x == a]
        ib = [i for i, x in enumerate(t) if x == b]
        return any(abs(i - j) <= w and i != j for i in ia for j in ib)

    return {
        "r_term": lambda: "order" in ts,
        "r_and": lambda: "order" in ts and "fast" in ts,
        "r_andnot": lambda: "fast" in ts and "batch" not in ts,
        "r_or": lambda: "batch" in ts or "solo" in ts,
        "r_not": lambda: "order" not in ts,
        "r_phrase": lambda: phrase(["order", "fast"]),
        "r_phrase3": lambda: phrase(["a", "b", "c"]),
        "r_prox": lambda: prox("key", "sort", 3),
        "r_prox_same": lambda: prox("order", "order", 2),
        "r_prefix": lambda: any(x.startswith("ord") for x in ts),
        "r_suffix": lambda: any(x.endswith("ed") for x in ts),
        "r_contains": lambda: any("rde" in x for x in ts),
        "r_fuzzy": lambda: any(_lev("ordr", x) <= 1 for x in ts),
        "r_field": lambda: LANGS[d] == "en" and "fast" in ts,
        "r_fieldpref": lambda: (LANGS[d].startswith("e") and "solo" in ts)
                               or LANGS[d] == "de",
        "r_range": lambda: 15 <= SIZES[d] <= 25 and "batch" not in ts,
        "r_range_open": lambda: SIZES[d] < 20,
        "r_nested": lambda: ("order" in ts or "batch" in ts)
                            and not phrase(["order", "fast"])
                            and LANGS[d] == "en",
        "r_miss": lambda: False,
    }[expr_id]()


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.string()),
        "lang": pa.array(LANGS, type=pa.string()),
        "n_chars": pa.array(SIZES, type=pa.int64()),
    })).repartition(3)


@pytest.fixture(scope="module")
def matches(corpus):
    df = percolate(corpus, RULES, batch_size=3).to_pandas()
    return {(r.query_id, int(r.doc_id)) for r in df.itertuples()}


@pytest.mark.parametrize("rid", sorted(RULES))
def test_golden(matches, rid):
    want = {d for d in range(len(DOCS)) if _ref_match(rid, d)}
    got = {d for q, d in matches if q == rid}
    assert got == want, rid


def test_parity_with_indexed_evaluate(ray_session, tmp_path_factory):
    """percolate(corpus, expr) ≡ evaluate(expr) over a nostem index of
    the same corpus, for every expression both surfaces accept (no pure
    negation, no metadata/range leaves — those need index context)."""
    import ray.data as rd

    from ts_type_filter_ray.pipelines.build import build_index
    from ts_type_filter_ray.pipelines.positional import (
        build_positional_index, PositionalSearcher)
    from ts_type_filter_ray.pipelines.query import LocalSearcher
    from ts_type_filter_ray.pipelines.querylang import evaluate

    from ts_type_filter_ray.pipelines.flagship import identity_stemmer

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.string())}))
    root = tmp_path_factory.mktemp("percidx")
    idx = build_index(corpus, str(root / "idx"), num_term_buckets=4,
                      doc_part_bits=2, stemmer=identity_stemmer)
    pidx = build_positional_index(corpus, str(root / "pos"),
                                  num_term_buckets=4, doc_part_bits=2)
    searcher = LocalSearcher(idx, stemmer=identity_stemmer)
    positional = PositionalSearcher(pidx)
    both = {k: v for k, v in RULES.items()
            if k in ("r_term", "r_and", "r_andnot", "r_or", "r_phrase",
                     "r_phrase3", "r_prox", "r_prox_same", "r_prefix",
                     "r_suffix", "r_contains", "r_fuzzy", "r_miss")}
    perc = percolate(corpus, both, batch_size=3).to_pandas()
    for rid, expr in both.items():
        want = evaluate(expr, searcher, positional).tolist()
        got = sorted(int(d) for d in perc[perc.query_id == rid].doc_id)
        assert got == want, rid


def test_stemmed_percolation(ray_session):
    import ray.data as rd

    from ts_type_filter_ray.text.porter2 import stem
    docs = ["running tests", "he runs tested things runner", "nothing here"]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "content": pa.array(docs, type=pa.string())}))
    out = percolate(corpus, {"r": '"run test"', "t": "runner"},
                    stemmer=stem).to_pandas()
    got = {(r.query_id, int(r.doc_id)) for r in out.itertuples()}
    # "running tests" and "runs tested" both stem to the adjacent
    # "run test"; 'runner' stems to itself and matches doc 1 only
    assert got == {("r", 0), ("r", 1), ("t", 1)}


def test_guard_pruning_is_invisible(corpus):
    """Disabling guards (forcing every rule onto every batch) must not
    change the match set — pruning is an optimization only."""
    with_guards = percolate(corpus, RULES, batch_size=3).to_pandas()
    compiled = [CompiledRule(r.rule_id, r.ast, None)
                for r in compile_rules(RULES)]
    # build the unguarded run by rewriting every compiled guard to None
    import ray.data as rd
    from ts_type_filter_ray.pipelines.percolate import PercolateStage
    tbl = pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.string()),
        "lang": pa.array(LANGS, type=pa.string()),
        "n_chars": pa.array(SIZES, type=pa.int64())})
    no_guards = rd.from_arrow(tbl).repartition(3).map_batches(
        PercolateStage, fn_constructor_kwargs={"rules": compiled},
        batch_format="pyarrow", batch_size=3,
        concurrency=(1, 2)).to_pandas()
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(no_guards) == key(with_guards)


def test_guard_extraction():
    rules = {r.rule_id: r for r in compile_rules({
        "a": "order AND fast",
        "b": "order OR fast",
        "c": "ord* OR fast",
        "d": "NOT order",
        "e": '"order fast" OR batch',
        "f": "lang:en AND order",
    })}
    assert rules["a"].guards == frozenset({"order"})
    assert rules["b"].guards == frozenset({"order", "fast"})
    assert rules["c"].guards is None          # prefix leg not coverable
    assert rules["d"].guards is None          # negation not coverable
    assert rules["e"].guards == frozenset({"order", "batch"})
    assert rules["f"].guards == frozenset({"order"})


def test_duplicate_rule_id_rejected(corpus):
    with pytest.raises(ValueError, match="duplicate rule_id"):
        compile_rules([("a", "import"), ("a", "def")])
    with pytest.raises(ValueError, match="duplicate rule_id"):
        percolate(corpus, [("r", "order"), ("r", "batch")])


def test_federated_warming_survives_stats_override(ray_session,
                                                   tmp_path_factory):
    """warm_top_terms on FederatedSearcher must warm AFTER the global-
    stats override (warming before would be cleared) and not change
    results."""
    import ray.data as rd

    from ts_type_filter_ray.pipelines.build import build_index
    from ts_type_filter_ray.pipelines.federated import FederatedSearcher
    from ts_type_filter_ray.pipelines.flagship import identity_stemmer

    root = tmp_path_factory.mktemp("fedwarm")
    docs = ["order fast alpha", "order beta", "fast gamma order"]
    a = build_index(rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "content": pa.array(docs[:2], type=pa.string())})),
        str(root / "a"), num_term_buckets=2, doc_part_bits=2,
        stemmer=identity_stemmer)
    b = build_index(rd.from_arrow(pa.table({
        "doc_id": pa.array([2], type=pa.int64()),
        "content": pa.array(docs[2:], type=pa.string())})),
        str(root / "b"), num_term_buckets=2, doc_part_bits=2,
        stemmer=identity_stemmer)
    cold = FederatedSearcher([a, b], stemmer=identity_stemmer)
    warm = FederatedSearcher([a, b], stemmer=identity_stemmer,
                             warm_top_terms=8)
    assert all(s._decoded for s in warm.searchers)  # warmed, not cleared
    assert warm.bm25("order fast", k=3) == cold.bm25("order fast", k=3)


def test_missing_column_is_loud(corpus):
    with pytest.raises(ValueError, match="missing from the corpus"):
        percolate(corpus, {"r": "nosuchfield:x AND order"})


def test_cli_percolate(ray_session, tmp_path, capsys):
    from ts_type_filter_ray.cli import main
    from ts_type_filter_ray.sources.synthetic import generate_corpus
    cdir = str(tmp_path / "corpus")
    generate_corpus(cdir, num_docs=60, seed=5, num_files=2)
    rules = tmp_path / "rules.tsv"
    rules.write_text("# comment\n"
                     "has_import\timport\n"
                     "no_import\tNOT import\n"
                     "both\timport AND def\n")
    assert main(["percolate", "--corpus", cdir, "--rules", str(rules),
                 "--counts"]) == 0
    lines = dict(l.split("\t") for l in
                 capsys.readouterr().out.strip().splitlines())
    assert set(lines) == {"has_import", "no_import", "both"}
    assert int(lines["has_import"]) + int(lines["no_import"]) == 60
    # pair mode agrees with counts
    assert main(["percolate", "--corpus", cdir,
                 "--rules", str(rules)]) == 0
    pairs = capsys.readouterr().out.strip().splitlines()
    assert len(pairs) == sum(int(v) for v in lines.values())
    # bad rules file is a clean exit, not a traceback
    bad = tmp_path / "bad.tsv"
    bad.write_text("oops_no_tab\n")
    assert main(["percolate", "--corpus", cdir,
                 "--rules", str(bad)]) == 2


def _rand_expr(rng, vocab, depth=0):
    """Random expression string over *vocab* covering every leaf family."""
    r = rng.random()
    if depth >= 3 or r < 0.45:
        kind = rng.randrange(7)
        w = rng.choice(vocab)
        if kind == 0:
            return w
        if kind == 1:
            return f"{w[:rng.randint(1, len(w))]}*"
        if kind == 2:
            return f"*{w[-rng.randint(1, len(w)):]}"
        if kind == 3:
            return f"*{w[1:-1]}*" if len(w) > 2 else w
        if kind == 4:
            return f"{w}~{rng.randint(1, 2)}"
        if kind == 5:
            return '"' + " ".join(rng.choice(vocab) for _ in
                                  range(rng.randint(1, 3))) + '"'
        return (f'"{rng.choice(vocab)} {rng.choice(vocab)}"'
                f"~{rng.randint(1, 4)}")
    if r < 0.60:
        return f"NOT ({_rand_expr(rng, vocab, depth + 1)})"
    op = " AND " if r < 0.8 else " OR "
    n = rng.randint(2, 3)
    return "(" + op.join(_rand_expr(rng, vocab, depth + 1)
                         for _ in range(n)) + ")"


def _ref_eval(node, toks):
    """Independent per-doc reference evaluator over a token list."""
    from ts_type_filter_ray.pipelines import querylang as ql
    ts = set(toks)
    if isinstance(node, ql.Term):
        return node.text.lower() in ts
    if isinstance(node, ql.Prefix):
        return any(t.startswith(node.text.lower()) for t in ts)
    if isinstance(node, ql.Suffix):
        return any(t.endswith(node.text.lower()) for t in ts)
    if isinstance(node, ql.Contains):
        return any(node.text.lower() in t for t in ts)
    if isinstance(node, ql.Fuzzy):
        return any(_lev(node.text.lower(), t) <= node.max_dist for t in ts)
    if isinstance(node, ql.Phrase):
        p = node.text.lower().split()
        return any(toks[i:i + len(p)] == p
                   for i in range(len(toks) - len(p) + 1))
    if isinstance(node, ql.Proximity):
        a, b = node.text.lower().split()
        ia = [i for i, x in enumerate(toks) if x == a]
        ib = [i for i, x in enumerate(toks) if x == b]
        return any(abs(i - j) <= node.slop and i != j
                   for i in ia for j in ib)
    if isinstance(node, ql.Not):
        return not _ref_eval(node.child, toks)
    if isinstance(node, ql.And):
        return all(_ref_eval(c, toks) for c in node.children)
    if isinstance(node, ql.Or):
        return any(_ref_eval(c, toks) for c in node.children)
    raise TypeError(node)


@pytest.mark.parametrize("seed", [11, 42])
def test_percolate_random_differential(ray_session, seed):
    """Fuzz: ~50 random expressions over a random corpus, ALL percolated
    in one pass, each compared to an independent per-doc reference
    evaluator (parser shared — it has its own round-trip fuzz suite)."""
    import random

    import ray.data as rd

    from ts_type_filter_ray.pipelines.querylang import parse_query
    rng = random.Random(seed)
    vocab = ["run", "running", "fast", "order", "batch", "ba", "bat",
             "xyz", "ordr"] + [f"w{i}" for i in range(12)]
    docs = [" ".join(rng.choice(vocab)
                     for _ in range(rng.randint(0, 25)))
            for _ in range(80)]
    rules = {}
    while len(rules) < 50:
        e = _rand_expr(rng, vocab)
        try:
            parse_query(e)
        except Exception:
            continue
        rules[f"r{len(rules)}"] = e
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "content": pa.array(docs, type=pa.string())})).repartition(4)
    out = percolate(corpus, rules, batch_size=16).to_pandas()
    got = {(r.query_id, int(r.doc_id)) for r in out.itertuples()}
    for rid, expr in rules.items():
        ast = parse_query(expr)
        want = {d for d, text in enumerate(docs)
                if _ref_eval(ast, text.lower().split())}
        have = {d for q, d in got if q == rid}
        assert have == want, (rid, expr)


def test_syntax_error_surfaces_on_driver(corpus):
    with pytest.raises(QuerySyntaxError):
        compile_rules({"r": "order AND"})
    with pytest.raises(QuerySyntaxError):
        percolate(corpus, {"r": "((order"})
